"""Device mesh + sharding rules.

Parallelism design (SURVEY.md §2.7 — the reference is single-device, so
this subsystem is TPU-native new work):

  * **data axis** — batch sharding; gradients all-reduce over ICI
    (collectives inserted by the pjit partitioner, no hand-written comms);
  * **model axis** — Megatron-style tensor parallelism on the FFN blocks:
    the first FFN linear is sharded on its output features
    (column-parallel) and the second on its input features (row-parallel),
    so the only collective on the TP path is one all-reduce per FFN.
    Attention for this model family is small (d_model ≤ 768) — it stays
    replicated by default, which measurably beats sharding it at these
    sizes.

  Pipeline / expert parallelism are not applicable to this architecture
  (2-6 blocks, no MoE; SURVEY.md §2.7). Sequence parallelism is not needed
  for parity (the reference center-crops to L≤300) — long-sequence scaling
  is served by the Pallas flash path instead.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.module import flatten_params, unflatten_params

DATA_AXIS = "data"
MODEL_AXIS = "model"

# (regex on flattened torch-style param name) -> PartitionSpec
# First match wins. torch layout: Linear weight is [out, in].
_TP_RULES: list[tuple[str, P]] = [
    # column-parallel: FFN up-projections / decoder linear1
    (r"\.(ffn_[at]\.0|linear1)\.weight$", P(MODEL_AXIS, None)),
    (r"\.(ffn_[at]\.0|linear1)\.bias$", P(MODEL_AXIS)),
    # row-parallel: FFN down-projections / decoder linear2 (bias replicated)
    (r"\.(ffn_[at]\.2|linear2)\.weight$", P(None, MODEL_AXIS)),
]


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        assert n_total % n_model == 0, (n_total, n_model)
        n_data = n_total // n_model
    assert n_data * n_model <= n_total, (n_data, n_model, n_total)
    if n_data * n_model < n_total:
        import warnings

        warnings.warn(
            f"make_mesh: using {n_data * n_model} of {n_total} devices — "
            f"{n_total - n_data * n_model} chips left idle", stacklevel=2)
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def _spec_for(name: str, enable_tp: bool) -> P:
    if enable_tp:
        for pattern, spec in _TP_RULES:
            if re.search(pattern, name):
                return spec
    return P()  # replicated


def param_shardings(mesh: Mesh, params: dict, enable_tp: bool = True) -> dict:
    """NamedSharding pytree matching a param pytree (TP rules on FFNs)."""
    enable_tp = enable_tp and mesh.shape[MODEL_AXIS] > 1
    flat = flatten_params(params)
    out = {
        name: NamedSharding(mesh, _spec_for(name, enable_tp)) for name in flat
    }
    return unflatten_params(out)


def batch_shardings(mesh: Mesh, keys, grad_accum: int = 1) -> dict:
    """Shardings for a train/eval batch dict.

    With ``grad_accum > 1`` the batch layout is ``[accum, micro, ...]`` —
    the accumulation axis stays replicated and the *micro* axis is data-
    sharded (sharding dim 0 would skew microbatches across devices).
    """
    spec = P(None, DATA_AXIS) if grad_accum > 1 else P(DATA_AXIS)
    return {k: NamedSharding(mesh, spec) for k in keys}


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())

"""Checkpoint I/O.

Two interchange formats:

1. **torch bridge** — reads/writes the reference's ``best_*.pt`` layout so
   checkpoints interchange with the PyTorch ecosystem. The reference
   checkpoint is a dict ``{"model_state_dict", "args", "label2id"/"emo_cols",
   "epoch", metric fields, optional "val_calibrated_thresholds"}``
   (reference: scripts/fusion/train_mosei_fusion_seq_level_decoder.py:616-630);
   inference re-hydrates hyperparameters from ``ckpt["args"]``
   (reference: scripts/infer/mosei_eval_infer.py:316-324).
   Param names in hriemo models already equal torch state_dict names, so
   the bridge is a pure tensor convert.

2. **native** — orbax-backed pytree checkpoints carrying params AND
   optimizer/scheduler state for true mid-run resume (which the reference
   lacks, SURVEY.md §5.4).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

from ..nn.module import Module, flatten_params, unflatten_params


# ---------------------------------------------------------------- torch side


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference-layout ``.pt`` checkpoint into plain numpy objects."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return _torch_to_numpy(ckpt)


def save_torch_checkpoint(path: str, ckpt: dict) -> None:
    """Write a reference-layout ``.pt`` checkpoint (torch-loadable)."""
    import torch

    def convert(obj):
        if isinstance(obj, dict):
            return {k: convert(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(convert(v) for v in obj)
        if isinstance(obj, jax.Array) or isinstance(obj, np.ndarray):
            return torch.tensor(np.asarray(obj))
        return obj

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(convert(ckpt), path)


def _torch_to_numpy(obj):
    if hasattr(obj, "detach"):  # torch.Tensor
        return obj.detach().cpu().numpy()
    if isinstance(obj, dict):
        return {k: _torch_to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_torch_to_numpy(v) for v in obj)
    return obj


def state_dict_from_params(params: dict) -> dict:
    """hriemo param pytree → flat numpy state dict (torch-compatible names)."""
    return {k: np.asarray(v) for k, v in flatten_params(params).items()}


def params_from_state_dict(state_dict: dict, like: dict | None = None) -> dict:
    """Flat state dict (numpy/torch tensors) → hriemo param pytree.

    If ``like`` (a reference param tree) is given, dtypes/shapes are
    validated against it.
    """
    import jax.numpy as jnp

    flat = {k: jnp.asarray(_torch_to_numpy(v)) for k, v in state_dict.items()}
    if like is not None:
        ref = flatten_params(like)
        missing = sorted(set(ref) - set(flat))
        unexpected = sorted(set(flat) - set(ref))
        if missing or unexpected:
            raise KeyError(f"state_dict mismatch: missing={missing[:8]} unexpected={unexpected[:8]}")
        for k in flat:
            if tuple(flat[k].shape) != tuple(ref[k].shape):
                raise ValueError(f"shape mismatch for {k}: {flat[k].shape} vs {ref[k].shape}")
            flat[k] = flat[k].astype(ref[k].dtype)
    return unflatten_params(flat)


def load_model_from_torch_checkpoint(model: Module, path: str) -> dict:
    """Restore a model's params from a reference-layout checkpoint.

    Returns the full checkpoint dict (for args/label maps/thresholds).
    """
    ckpt = load_torch_checkpoint(path)
    model.params = params_from_state_dict(ckpt["model_state_dict"], like=model.params)
    return ckpt


# --------------------------------------------------------------- native side


def save_native(path: str, tree: Any) -> None:
    """Save a pytree (params / full train state) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_native(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=like)


def write_meta_json(path: str, meta: dict) -> None:
    """Human-readable sidecar, mirroring the reference's ``meta.json`` habit."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(meta, f, indent=2, default=str)

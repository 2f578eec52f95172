"""int8 serving quantization (W8A8, dynamic per-row activation scales).

The v5e MXU doubles its peak for int8×int8→int32 (394 vs 197 TOPS), and
the round-1 FLOP accounting (VERDICT.md) showed the 5,000 utt/s north star
is *unreachable* in bf16 — int8 is the only route. This module provides:

  * :func:`quantize_linear_params` — one-time weight quantization for a
    torch-layout Linear param dict (``{"weight" [out,in], "bias"}``) to
    ``{"w_int8" [out,in], "w_scale" [out,1] fp32, "bias"}``. Symmetric,
    per-output-channel — the standard W8A8 recipe (per-channel weight
    scales cost nothing at serving time because they fold into the
    dequant epilogue).
  * :func:`int8_linear` — the serving matmul: dynamic symmetric per-row
    (per-token) activation quantization on the VPU, int8×int8→int32 on
    the MXU, fused fp32 dequant epilogue. Round-to-nearest (deterministic
    serving; stochastic rounding is a training tool).
  * :func:`quantize_tree_for_serving` — walks a param pytree and
    quantizes every Linear whose GEMM is big enough to win on the MXU
    (both dims ≥ ``min_dim``), leaving LayerNorms, embeddings, biases and
    small projections untouched. fp32 LN/softmax stay fp32 — only the
    GEMM inputs are quantized.

``hriemo.nn.layers.linear_apply`` dispatches on the presence of
``"w_int8"``, so WavLM/BERT/fusion forward code needs no changes: casting
a model to int8 is a pure param-tree transform, mirroring how bf16
serving is a tree_map cast.

Accuracy contract: logit deltas vs the bf16 path are measured in
``tests/test_quant.py`` (tiny configs, CPU) and reported by ``bench.py``
(real product config, TPU) so the int8 path is gated on numbers, not
vibes (VERDICT.md round 1, next-step #2).

No reference counterpart: the reference serves fp32 torch
(scripts/fusion/mosei_eval_infer.py); this subsystem is TPU-native
headroom work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Quantizing a Linear only pays when the MXU is the bottleneck; tiny
# projections (e.g. WavLM's 8-wide gate head) stay in bf16.
DEFAULT_MIN_DIM = 256


def quantize_rowwise(x, eps: float = 1e-8):
    """Symmetric per-row int8 quantization over the last axis.

    Returns ``(q int8, scale fp32)`` with ``scale`` shaped like ``x`` but
    with a trailing singleton axis, such that ``q * scale ≈ x``.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_linear_params(p, eps: float = 1e-8):
    """Quantize a torch-layout Linear param dict for int8 serving.

    ``p["weight"]`` is [out, in]; scales are per-output-channel (axis 1
    reduction), the standard W8A8 choice — they fold into the dequant
    epilogue with zero extra GEMM cost.
    """
    w = p["weight"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=1, keepdims=True)  # [out, 1]
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"w_int8": q, "w_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def int8_linear(p, x):
    """``x @ W^T + b`` where W is pre-quantized int8 and x is quantized
    on the fly (dynamic per-row symmetric scales).

    The contraction runs int8×int8→int32 on the MXU (2× bf16 peak on
    v5e); dequant is a rank-1 fp32 rescale fused into the epilogue by
    XLA. Output dtype follows the input (bf16 in the serving path).
    """
    xq, xs = quantize_rowwise(x)
    acc = jax.lax.dot_general(
        xq, p["w_int8"],
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # [..., out] * [..., 1] * [out] — rank-1 dequant
    y = acc.astype(jnp.float32) * xs * p["w_scale"][:, 0]
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def int8_linear_packed(ps, x):
    """Apply several int8 Linears that share the same input in ONE GEMM.

    ``ps``: list of quantized param dicts (same in_features). The
    activation is quantized once and the weights concatenated along the
    output axis — one [*, in] × [in, Σout] MXU pass instead of N passes
    each re-quantizing x. Returns the list of per-param outputs.

    NOT used on the product path: packing attention q/k/v this way LOST
    the whole-model A/B on v5e (WavLM 10 s bucket +7–12 ms vs separate
    dispatched projections — XLA schedules the three dots better than the
    hand-packed one). Kept for workloads with many small shared-input
    heads where the per-GEMM quantize overhead dominates.
    """
    sizes = [p["w_int8"].shape[0] for p in ps]
    w = jnp.concatenate([p["w_int8"] for p in ps], axis=0)      # [Σout, in]
    s = jnp.concatenate([p["w_scale"][:, 0] for p in ps], axis=0)
    xq, xs = quantize_rowwise(x)
    acc = jax.lax.dot_general(
        xq, w, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xs * s
    if "bias" in ps[0]:
        y = y + jnp.concatenate([p["bias"] for p in ps], axis=0).astype(jnp.float32)
    y = y.astype(x.dtype)
    outs, off = [], 0
    for n in sizes:
        outs.append(y[..., off:off + n])
        off += n
    return outs


def _is_linear(node) -> bool:
    return (
        isinstance(node, dict)
        and "weight" in node
        and getattr(node["weight"], "ndim", 0) == 2
        and set(node) <= {"weight", "bias"}
    )


def _is_mha(node) -> bool:
    """Packed torch-MultiheadAttention param dict (nn/attention.py)."""
    return (
        isinstance(node, dict)
        and "in_proj_weight" in node
        and getattr(node["in_proj_weight"], "ndim", 0) == 2
    )


def quantize_tree_for_serving(params, min_dim: int = DEFAULT_MIN_DIM,
                              skip=("embeddings", "rel_attn_embed")):
    """Return a copy of ``params`` with every large-enough Linear
    quantized to int8 (see module docstring for the eligibility rule).

    ``skip``: any path component in this set disables quantization below
    it (embedding tables look like Linears but are gathers, not GEMMs).
    """
    def walk(node, path):
        if any(s in path for s in skip):
            return node
        if _is_linear(node):
            o, i = node["weight"].shape
            if min(o, i) >= min_dim:
                return quantize_linear_params(node)
            return node
        if _is_mha(node):
            # packed MHA in_proj [3d, d]: per-output-row scales work for
            # the q/k/v slices too (each slice keeps its own rows);
            # nn.attention.mha_apply dispatches on in_proj_w_int8
            w = node["in_proj_weight"]
            if min(w.shape) >= min_dim:
                q = quantize_linear_params({"weight": w})
                node = {k: v for k, v in node.items() if k != "in_proj_weight"}
                node["in_proj_w_int8"] = q["w_int8"]
                node["in_proj_w_scale"] = q["w_scale"]
            return {k: (walk(v, path + (k,)) if isinstance(v, dict) else v)
                    for k, v in node.items()}
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(params, ())


def count_quantized(params) -> int:
    """Number of int8 Linears in a (possibly quantized) tree — used by
    tests and bench to assert the transform actually hit the hot GEMMs."""
    n = 0

    def walk(node):
        nonlocal n
        if isinstance(node, dict):
            if "w_int8" in node or "in_proj_w_int8" in node:
                n += 1
            for v in node.values():
                walk(v)

    walk(params)
    return n

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

import contextlib
import hashlib

import numpy as np
import jax
import jax.numpy as jnp

# Active activation-amax collector (eager-mode int8 numerics reports;
# see collect_activation_amax). None in production.
_AMAX_COLLECTOR = None

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
    if _AMAX_COLLECTOR is not None and not isinstance(x, jax.core.Tracer):
        _AMAX_COLLECTOR.record(p["w_int8"], xs, x)
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
                              skip=("embeddings", "rel_attn_embed"),
                              exclude=frozenset()):
    """Return a copy of ``params`` with every large-enough Linear
    quantized to int8 (see module docstring for the eligibility rule).

    ``skip``: any path component in this set disables quantization below
    it (embedding tables look like Linears but are gathers, not GEMMs).
    ``exclude``: exact "a/b/c" node paths kept in full precision —
    the selective-bf16 outlier mitigation (int8_numerics_report).
    """
    def walk(node, path):
        if any(s in path for s in skip):
            return node
        if "/".join(path) in exclude:
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


# --------------------------------------------------------------------------
# int8 numerics reporting + outlier mitigation (runbook: VERDICT r2 next #4)
#
# Real pretrained weights are where W8A8's per-row dynamic scales can break:
# a few high-magnitude activation channels inflate a row's amax and crush
# the resolution of every other channel in that row. The tools below
# produce an auditable per-layer activation-amax report and a measured
# mitigation — greedy selective-bf16 for the worst layers — gated on an
# output-delta envelope. Driven by tools/validate_pretrained_bridges.py
# --int8-report and CI'd with synthetic outlier injection in
# tests/test_quant.py.
# --------------------------------------------------------------------------


def _weight_key(w) -> tuple:
    a = np.asarray(w)
    return (a.shape, hashlib.sha1(a.tobytes()).hexdigest())


class _AmaxCollector:
    """Records per-layer activation amax distributions (eager mode only).

    Layers are identified by a content hash of their int8 weight so the
    packed-MHA path (which slices q/k/v out of in_proj on the fly) still
    resolves to a stable name.
    """

    def __init__(self, names_by_key):
        self.names_by_key = names_by_key
        self.raw = {}

    def record(self, w_int8, row_scales, x):
        name = self.names_by_key.get(_weight_key(w_int8))
        if name is None:
            name = f"unnamed_{w_int8.shape}"
        amax = np.asarray(row_scales, np.float64).ravel() * 127.0
        xf = np.asarray(x, np.float64)
        rms = np.sqrt(np.mean(xf * xf, axis=-1)).ravel()
        # crest = amax/rms per row: how much a few channels dominate the
        # row. THE W8A8 failure indicator — one outlier channel inflates
        # the row's scale and crushes the resolution of every other
        # channel (per-row scales can't isolate channels the way
        # per-channel weight scales do). Gaussian activations sit near
        # sqrt(2 ln n) ≈ 3.6–3.8; a single dominating channel pushes
        # crest toward sqrt(n).
        crest = amax / np.maximum(rms, 1e-12)
        self.raw.setdefault(name, []).append((amax, crest))

    def stats(self) -> dict:
        out = {}
        for name, chunks in self.raw.items():
            a = np.concatenate([c[0] for c in chunks])
            cr = np.concatenate([c[1] for c in chunks])
            med = float(np.median(a))
            out[name] = {
                "rows": int(a.size),
                "amax_p50": med,
                "amax_p99": float(np.percentile(a, 99)),
                "amax_max": float(a.max()),
                # row-to-row amax inflation (batch outliers)
                "outlier_ratio": float(a.max() / max(med, 1e-12)),
                # within-row channel domination (the classic W8A8 killer);
                # p90 rather than median — nonlinearities (ReLU) can zero
                # the dominating channel in a fraction of rows, which
                # would dilute a median
                "crest_p50": float(np.median(cr)),
                "crest_p90": float(np.percentile(cr, 90)),
                "crest_max": float(cr.max()),
            }
        return out


@contextlib.contextmanager
def collect_activation_amax(qtree):
    """Collect per-layer activation amax while running EAGER int8 forwards.

    Usage::

        with collect_activation_amax(qtree) as col:
            apply_fn(qtree, *probe)     # un-jitted
        stats = col.stats()
    """
    global _AMAX_COLLECTOR
    col = _AmaxCollector(quantized_layer_names(qtree))
    prev, _AMAX_COLLECTOR = _AMAX_COLLECTOR, col
    try:
        yield col
    finally:
        _AMAX_COLLECTOR = prev


def quantized_layer_names(qtree) -> dict:
    """Map weight content-key -> "a/b/c" path for every int8 layer,
    including the q/k/v slices of packed-MHA in_proj weights."""
    names = {}

    def walk(node, path):
        if not isinstance(node, dict):
            return
        if "w_int8" in node:
            names[_weight_key(node["w_int8"])] = "/".join(path)
        if "in_proj_w_int8" in node:
            w = np.asarray(node["in_proj_w_int8"])
            d = w.shape[0] // 3
            for i, nm in enumerate(("q", "k", "v")):
                key = (w[i * d:(i + 1) * d].shape,
                       hashlib.sha1(w[i * d:(i + 1) * d].tobytes()).hexdigest())
                names[key] = "/".join(path + (f"in_proj_{nm}",))
        for k, v in node.items():
            walk(v, path + (k,))

    walk(qtree, ())
    return names


def quantized_layer_paths(qtree) -> list:
    """All quantizable-layer paths ("a/b/c") in a quantized tree; packed
    MHA nodes count once (their in_proj + out_proj revert together)."""
    paths = []

    def walk(node, path):
        if not isinstance(node, dict):
            return
        if "w_int8" in node or "in_proj_w_int8" in node:
            paths.append("/".join(path))
        for k, v in node.items():
            walk(v, path + (k,))

    walk(qtree, ())
    return paths


def int8_numerics_report(apply_fn, params, args, envelope: float = 0.005,
                         min_dim: int = DEFAULT_MIN_DIM, max_reverts: int = 8,
                         collect_amax: bool = True) -> dict:
    """Measure int8-vs-reference output deltas and mitigate outlier layers.

    ``apply_fn(params, *args) -> dict[str, array]`` (e.g. ``{"probs": ...,
    "beta": ...}``) must run EAGERLY (un-jitted) so the activation
    collector sees concrete values. The first output key gates the
    envelope. Mitigation: greedily revert the worst-outlier layer to
    bf16 (selective-bf16 — the standard W8A8 mitigation), ranked by
    ``crest_p90`` (per-row channel domination — what actually breaks
    per-row scales) with ``outlier_ratio`` as tie-break, until the gated
    delta is within ``envelope`` or ``max_reverts`` layers are reverted.

    Returns a dict with per-layer activation stats, per-output deltas for
    the full-int8 tree, the reverted layer list, and final deltas.
    """
    ref = {k: np.asarray(v, np.float64)
           for k, v in apply_fn(params, *args).items()}
    gate_key = next(iter(ref))

    def deltas(q):
        out = apply_fn(q, *args)
        return {k: float(np.abs(np.asarray(v, np.float64) - ref[k]).max())
                for k, v in out.items()}

    q_full = quantize_tree_for_serving(params, min_dim=min_dim)
    act_stats = {}
    if collect_amax:
        with collect_activation_amax(q_full) as col:
            d_full = deltas(q_full)
        act_stats = col.stats()
    else:
        d_full = deltas(q_full)

    report = {
        "envelope": envelope,
        "gate_output": gate_key,
        "n_quantized_layers": count_quantized(q_full),
        "deltas_full_int8": d_full,
        "activation_amax": act_stats,
        "reverted_layers": [],
        "deltas_final": d_full,
        "within_envelope": d_full[gate_key] <= envelope,
    }
    if report["within_envelope"] or not act_stats:
        return report

    # greedy selective-bf16: revert worst-outlier layers first (ranking
    # below: crest_p90, then outlier_ratio).
    # map activation names back to revertable node paths (strip the
    # in_proj_{q,k,v} suffix for packed MHA)
    def node_path(act_name):
        parts = act_name.split("/")
        if parts[-1].startswith("in_proj_"):
            parts = parts[:-1]
        return "/".join(parts)

    # rank by crest (channel domination) first, then batch outlier_ratio
    ranked = sorted(act_stats, key=lambda n: (-act_stats[n]["crest_p90"],
                                              -act_stats[n]["outlier_ratio"]))
    exclude, seen = [], set()
    for name in ranked:
        p = node_path(name)
        if p not in seen:
            seen.add(p)
            exclude.append(p)
    d = d_full
    reverted = []
    for p in exclude[:max_reverts]:
        reverted.append(p)
        q = quantize_tree_for_serving(params, min_dim=min_dim,
                                      exclude=frozenset(reverted))
        d = deltas(q)
        if d[gate_key] <= envelope:
            break
    report["reverted_layers"] = reverted
    report["deltas_final"] = d
    report["within_envelope"] = d[gate_key] <= envelope
    return report

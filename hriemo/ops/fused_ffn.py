"""Fused post-norm transformer FFN block (Pallas TPU, W8A8 or bf16).

Computes, in ONE kernel pass over token blocks:

    y = LayerNorm(x + W2 · gelu(W1 · x + b1) + b2)

which is the FFN block shared by WavLM (feed_forward + final_layer_norm,
frontends/wavlm.py) and BERT (intermediate/output + LayerNorm,
frontends/bert.py). The reference computes this as 6 separate torch ops
(reference models run HF BertLayer / WavLMEncoderLayer); XLA fuses the
pointwise tails but still round-trips the [tokens, 3072] intermediate
through HBM between the two GEMMs.

Why this kernel exists (measured on v5e, M=32768 tokens, 768→3072→768,
chained-GEMM methodology so nothing is DCE'd):

    XLA bf16 (whole pair)        98.3 TF/s   ← round-1 product path
    XLA int8 W8A8                105.2       ← +7%: XLA can't fuse the
                                                quantize/dequant chain
    Pallas fused W8A8 (dynamic)  126.7       ← +29%
    Pallas fused int8 (static)   127.8       ← abs-max reduce is ~free
    Pallas fused int8 (raw)      129.9       ← toolchain int8 ceiling

Two conclusions drive the design: (1) the v5e int8 MXU path through this
toolchain tops out at ~1.35× bf16 — NOT the nominal 2× — so the
north-star arithmetic must assume 130 T/s, and (2) the entire win needs
the quantize→dot→dequant chain to live inside one kernel; at the XLA
level int8 is worth 7%. Dynamic per-row activation scales cost ~1% —
there is no accuracy reason to use static scales.

Numerics: fp32 LayerNorm statistics, fp32 residual accumulation, per-row
dynamic symmetric int8 activation quantization, per-column weight scales
(precomputed by :func:`quantize_ffn_params`). Contract tested in
tests/test_fused_ffn.py (interpret mode, vs the XLA reference at fp32).

Backward: custom VJP recomputes through the XLA reference — the serving
path is forward-only; training keeps full-precision semantics.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Token-block size. 256 keeps the fp32 [BM, F] intermediate at 3 MB so
# weights (4.5 MB int8) + double-buffered x blocks fit VMEM comfortably.
import os

BLOCK_M = int(os.environ.get("HRIEMO_FFN_BLOCK_M", "256"))


def _gelu(x, fast: bool):
    if fast:
        # tanh approximation — the serving default (see WavLMConfig.fast_gelu)
        return 0.5 * x * (1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x)))
    return 0.5 * x * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def _quant_rows(x):
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x / s), -127, 127)
    return q.astype(jnp.int8), s


def _kernel_mlp2_int8(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                      o_ref):
    """W8A8 ``Linear -> ReLU -> Linear`` (torch nn.Sequential mlp2).

    The fusion stack's FFNs (cross_modal ffn_a/ffn_t, decoder FFNs) have
    no in-block LayerNorm/residual — the model applies LN(x + ffn)
    outside (one fused XLA elementwise pass). Same quantize->dot->
    dequant chain as the GELU kernel below; ReLU runs on the fp32
    pre-activation.
    """
    x = x_ref[:].astype(jnp.float32)                        # [BM, D]
    xq, xs = _quant_rows(x)
    h = jax.lax.dot_general(xq, w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    h = h.astype(jnp.float32) * xs * s1_ref[:] + b1_ref[:]  # [BM, F]
    h = jnp.maximum(h, 0.0)
    hq, hs = _quant_rows(h)
    y = jax.lax.dot_general(hq, w2_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o_ref[:] = (y.astype(jnp.float32) * hs * s2_ref[:]
                + b2_ref[:]).astype(o_ref.dtype)


def _kernel_int8(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                 g_ref, b_ref, o_ref, *, eps, fast_gelu):
    x = x_ref[:].astype(jnp.float32)                        # [BM, D]
    xq, xs = _quant_rows(x)
    h = jax.lax.dot_general(xq, w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    h = h.astype(jnp.float32) * xs * s1_ref[:] + b1_ref[:]  # [BM, F]
    h = _gelu(h, fast_gelu)
    hq, hs = _quant_rows(h)
    y = jax.lax.dot_general(hq, w2_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = x + y.astype(jnp.float32) * hs * s2_ref[:] + b2_ref[:]
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * g_ref[:] + b_ref[:]).astype(o_ref.dtype)


def _kernel_bf16(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 g_ref, b_ref, o_ref, *, eps, fast_gelu):
    x = x_ref[:].astype(jnp.float32)
    h = jax.lax.dot_general(x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b1_ref[:]
    h = _gelu(h, fast_gelu).astype(x_ref.dtype)
    y = jax.lax.dot_general(h, w2_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = x + y + b2_ref[:]
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * g_ref[:] + b_ref[:]).astype(o_ref.dtype)


def quantize_ffn_params(w1, b1, w2, b2):
    """Pre-quantize FFN weights (torch layout [out, in]) for the kernel.

    Returns kernel-layout tensors: w stored [in, out] int8 with per-column
    (output-channel) fp32 scales [1, out].
    """
    def q(w):
        wf = w.astype(jnp.float32).T  # [in, out]
        amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
        s = jnp.maximum(amax, 1e-8) / 127.0
        return jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8), s

    w1q, s1 = q(w1)
    w2q, s2 = q(w2)
    return dict(w1_q=w1q, w1_s=s1, b1=b1.astype(jnp.float32)[None, :],
                w2_q=w2q, w2_s=s2, b2=b2.astype(jnp.float32)[None, :])


def _pad_rows(x, bm):
    p = (-x.shape[0]) % bm
    if p:
        x = jnp.pad(x, ((0, p), (0, 0)))
    return x


def _ffn_block_int8_impl(x, qp, ln_weight, ln_bias, eps, fast_gelu, block_m):
    """x [M, D] → [M, D]; qp from quantize_ffn_params."""
    m, d = x.shape
    f = qp["w1_q"].shape[1]
    xp = _pad_rows(x, block_m)
    out = pl.pallas_call(
        functools.partial(_kernel_int8, eps=eps, fast_gelu=fast_gelu),
        grid=(xp.shape[0] // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * xp.shape[0] * d * f,
            bytes_accessed=xp.shape[0] * d * 2 * 2 + d * f * 2,
            transcendentals=xp.shape[0] * f,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xp, qp["w1_q"], qp["w1_s"], qp["b1"], qp["w2_q"], qp["w2_s"], qp["b2"],
      ln_weight.astype(jnp.float32)[None, :], ln_bias.astype(jnp.float32)[None, :])
    return out[:m]


def _ffn_block_bf16_impl(x, w1, b1, w2, b2, ln_weight, ln_bias, eps,
                         fast_gelu, block_m):
    m, d = x.shape
    f = w1.shape[0]
    xp = _pad_rows(x, block_m)
    out = pl.pallas_call(
        functools.partial(_kernel_bf16, eps=eps, fast_gelu=fast_gelu),
        grid=(xp.shape[0] // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * xp.shape[0] * d * f,
            bytes_accessed=xp.shape[0] * d * 2 * 2 + d * f * 4,
            transcendentals=xp.shape[0] * f,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xp, w1.astype(x.dtype).T, b1.astype(jnp.float32)[None, :],
      w2.astype(x.dtype).T, b2.astype(jnp.float32)[None, :],
      ln_weight.astype(jnp.float32)[None, :], ln_bias.astype(jnp.float32)[None, :])
    return out[:m]


def _xla_reference(x, w1, b1, w2, b2, ln_weight, ln_bias, eps, fast_gelu):
    """Unfused fp-path reference (same math the frontends inline)."""
    h = _gelu((jnp.matmul(x, w1.T.astype(x.dtype)) + b1).astype(jnp.float32),
              fast_gelu).astype(x.dtype)
    y = (x.astype(jnp.float32) + jnp.matmul(h, w2.T.astype(x.dtype)) + b2)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    return (y * ln_weight + ln_bias).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def ffn_block_bf16(x, w1, b1, w2, b2, ln_weight, ln_bias,
                   eps=1e-5, fast_gelu=True, block_m=BLOCK_M):
    """Fused bf16 FFN block over flattened tokens x [M, D]."""
    return _ffn_block_bf16_impl(x, w1, b1, w2, b2, ln_weight, ln_bias,
                                eps, fast_gelu, block_m)


def _bf16_fwd(x, w1, b1, w2, b2, ln_weight, ln_bias, eps, fast_gelu, block_m):
    out = ffn_block_bf16(x, w1, b1, w2, b2, ln_weight, ln_bias,
                         eps, fast_gelu, block_m)
    return out, (x, w1, b1, w2, b2, ln_weight, ln_bias)


def _bf16_bwd(eps, fast_gelu, block_m, res, g):
    x, w1, b1, w2, b2, ln_weight, ln_bias = res
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, eps=eps, fast_gelu=fast_gelu), x, w1,
        b1, w2, b2, ln_weight, ln_bias)
    return vjp(g)


ffn_block_bf16.defvjp(_bf16_fwd, _bf16_bwd)


def ffn_block_int8(x, qp, ln_weight, ln_bias, eps=1e-5, fast_gelu=True,
                   block_m=BLOCK_M):
    """Fused W8A8 FFN block (forward-only serving path) over x [M, D].

    ``qp`` comes from :func:`quantize_ffn_params`; gradients are not
    defined (int8 serving never trains — use ffn_block_bf16 or the
    unfused path for training).
    """
    return _ffn_block_int8_impl(x, qp, ln_weight, ln_bias, eps, fast_gelu,
                                block_m)


def mlp2_int8(p0, p2, x, block_m=BLOCK_M):
    """Fused W8A8 mlp2 over x [..., Din] -> [..., Dout].

    Rectangular widths supported (the TACFN β-gate is 3072->256->768).
    See _kernel_mlp2_int8.
    """
    shape = x.shape
    din = shape[-1]
    f, dout = p0["w_int8"].shape[0], p2["w_int8"].shape[0]
    rows = x.reshape(-1, din).shape[0]
    xp = _pad_rows(x.reshape(-1, din), block_m)
    qp = dict(
        w1_q=p0["w_int8"].T, w1_s=p0["w_scale"].T.astype(jnp.float32),
        b1=p0["bias"].astype(jnp.float32)[None, :],
        w2_q=p2["w_int8"].T, w2_s=p2["w_scale"].T.astype(jnp.float32),
        b2=p2["bias"].astype(jnp.float32)[None, :],
    )
    out = pl.pallas_call(
        _kernel_mlp2_int8,
        grid=(xp.shape[0] // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, din), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((din, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, dout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], dout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * xp.shape[0] * f * (din + dout),
            bytes_accessed=xp.shape[0] * (din + dout) * 2 + (din + dout) * f,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xp, qp["w1_q"], qp["w1_s"], qp["b1"], qp["w2_q"], qp["w2_s"], qp["b2"])
    return out[:rows].reshape(shape[:-1] + (dout,))


def use_mlp2_int8(p0, p2) -> bool:
    """Route the fused mlp2: int8 params on TPU, kernel-legal shapes."""
    from .attention_block import kernels_forced

    try:
        on_tpu = jax.default_backend() == "tpu" or kernels_forced()
    except Exception:  # pragma: no cover
        return False
    if not (on_tpu and "w_int8" in p0 and "w_int8" in p2
            and "bias" in p0 and "bias" in p2):
        return False
    f, din = p0["w_int8"].shape
    dout = p2["w_int8"].shape[0]
    return (din % 128 == 0 and f % 128 == 0 and dout % 128 == 0
            and (din + dout) * f <= 8 * 2 ** 20)


def route_ffn_block(p_in, p_out, p_ln, x, eps, fast_gelu):
    """Model-facing router: post-norm FFN block over x [B, L, D].

    ``p_in``/``p_out`` are torch-layout Linear param dicts (possibly
    int8-quantized by ops.quant); ``p_ln`` the LayerNorm params.
    Routing (whole-model-A/B-backed, see module docstring):

      * int8 params on TPU → the fused W8A8 kernel (the only path that
        realises the int8 win — XLA-level int8 is worth 7%);
      * bf16/fp32 → the XLA path (measured *faster* than the Pallas bf16
        kernel: 98.3 vs 94.0 TF/s — XLA's own pipelining wins when no
        quantize chain needs fusing), which also keeps training (dropout,
        grads) on the reference semantics.
    """
    from ..nn.layers import layer_norm_apply, linear_apply

    quantized = "w_int8" in p_in
    b, l, d = x.shape
    if quantized and use_fused_ffn(d, p_in["w_int8"].shape[0]):
        # ops.quant stores [out, in] int8 + [out, 1] scales; the kernel
        # streams [in, out] — transposes of weight constants are hoisted
        # by XLA and cost nothing per step.
        qp = dict(
            w1_q=p_in["w_int8"].T, w1_s=p_in["w_scale"].T,
            b1=p_in["bias"].astype(jnp.float32)[None, :],
            w2_q=p_out["w_int8"].T, w2_s=p_out["w_scale"].T,
            b2=p_out["bias"].astype(jnp.float32)[None, :],
        )
        y = ffn_block_int8(x.reshape(b * l, d), qp, p_ln["weight"],
                           p_ln["bias"], eps, fast_gelu)
        return y.reshape(b, l, d)
    # unfused path (dispatches per-linear, incl. XLA-level int8 fallback
    # for shapes the kernel rejects). GELU stays in the compute dtype —
    # promoting it to fp32 costs ~11 ms on the WavLM 10 s bucket (measured;
    # same lesson as the exact-vs-tanh GELU finding in CLAUDE.md).
    h = jax.nn.gelu(linear_apply(p_in, x), approximate=fast_gelu)
    return layer_norm_apply(p_ln, x + linear_apply(p_out, h), eps)


def use_fused_ffn(d: int, f: int) -> bool:
    """VMEM budget + tiling legality for the single-pass kernel."""
    from .attention_block import kernels_forced

    try:
        on_tpu = jax.default_backend() == "tpu" or kernels_forced()
    except Exception:  # pragma: no cover
        return False
    # weights resident per kernel: int8 2·d·f bytes; tiles need 128 lanes
    return on_tpu and d % 128 == 0 and f % 128 == 0 and 2 * d * f <= 8 * 2 ** 20

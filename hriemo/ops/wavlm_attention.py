"""Fused WavLM gated-relative-position-bias attention (Pallas TPU).

WavLM's attention adds ``gate[b,h,q] * position_bias[h,q,k]`` to the
scores, where the gate is a per-(batch, head, query) scalar and the bias
is shared across batch and layers. Computed naively (the HF reference and
our XLA path), the gated bias materialises a full ``[B, H, L, L]`` tensor
in HBM per layer — at the product shape (B=64, H=12, L=499, fp32) that is
~765 MB of traffic per layer before attention even runs, and it dominates
WavLM's runtime.

This kernel streams the *shared* ``[H, L, L]`` bias block-by-block into
VMEM, applies the gate row-scale and key-padding bias in-register, and
never materialises per-batch score/bias panels. One-pass softmax (K/V
VMEM-resident) — WavLM runs at L≈499, far below the VMEM limit.

Backward: custom VJP recomputing through the XLA reference (frontends are
frozen feature extractors in this product; the backward path exists for
completeness/fine-tuning, not the hot loop).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.masking import NEG_INF


def _kernel(gate_ref, kbias_ref, pos_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]          # [bq, hd]
    k = k_ref[0]          # [Lk, hd]
    v = v_ref[0]
    gate = gate_ref[0]    # [1, bq] — per-query gate scalars
    kbias = kbias_ref[0]  # [1, Lk] — key-padding additive bias
    pos = pos_ref[0]      # [bq, Lk] — shared relative position bias

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + gate.reshape(-1, 1) * pos + kbias  # gated bias + padding, in-register

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _pad(x, axis, mult, value=0.0):
    p = (-x.shape[axis]) % mult
    if p == 0:
        return x
    w = [(0, 0)] * x.ndim
    w[axis] = (0, p)
    return jnp.pad(x, w, constant_values=value)


def _fused_impl(q, k, v, gate, position_bias, key_padding_bias):
    """q/k/v [B,H,L,hd]; gate [B,H,L]; position_bias [H,L,L] fp32;
    key_padding_bias [B,L] fp32 additive."""
    b, h, l, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    # block size that minimises q-axis padding (374 frames: bq=128 pads to
    # 384; bq=256 would pad to 512 — 37% wasted MXU work)
    _padded = {bq_: -(-l // bq_) * bq_ for bq_ in (128, 256)}
    _best = min(_padded.values())
    bq = max(b_ for b_, p_ in _padded.items() if p_ == _best)

    qp = _pad(q.reshape(b * h, l, hd), 1, bq)
    kp = _pad(k.reshape(b * h, l, hd), 1, 128)
    vp = _pad(v.reshape(b * h, l, hd), 1, 128)
    lqp, lkp = qp.shape[1], kp.shape[1]
    nq = lqp // bq

    gatep = _pad(gate.reshape(b * h, l), 1, bq)[:, None, :].astype(jnp.float32)
    kbiasp = _pad(key_padding_bias, 1, 128, value=NEG_INF)[:, None, :].astype(jnp.float32)
    posp = _pad(_pad(position_bias, 1, bq), 2, 128).astype(jnp.float32)  # [H, Lqp, Lkp]

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(b * h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, bq), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lkp), lambda i, j: (jax.lax.div(i, h), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lkp), lambda i, j: (jax.lax.rem(i, h), j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lqp, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lqp * lkp * hd,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize
            + posp.size * 4,
            transcendentals=b * h * lqp * lkp,
        ),
        interpret=jax.default_backend() != "tpu",
    )(gatep, kbiasp, posp, qp, kp, vp)
    return out[:, :l].reshape(b, h, l, hd)


def _xla_reference(q, k, v, gate, position_bias, key_padding_bias):
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                   preferred_element_type=jnp.float32)
    s = s + gate[..., None] * position_bias[None]
    s = s + key_padding_bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@jax.custom_vjp
def wavlm_fused_attention(q, k, v, gate, position_bias, key_padding_bias):
    return _fused_impl(q, k, v, gate, position_bias, key_padding_bias)


def _fwd(q, k, v, gate, position_bias, key_padding_bias):
    out = _fused_impl(q, k, v, gate, position_bias, key_padding_bias)
    return out, (q, k, v, gate, position_bias, key_padding_bias)


def _bwd(res, g):
    _, vjp = jax.vjp(_xla_reference, *res)
    return vjp(g)


wavlm_fused_attention.defvjp(_fwd, _bwd)


def use_fused(l: int, hd: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and 128 <= l <= 2048
        and hd % 8 == 0
        and hd <= 256
    )

"""Pallas TPU flash attention (online-softmax, no [Lq, Lk] materialisation).

Replaces the O(Lq·Lk) HBM traffic of naive attention for the cross-modal
encoder's hot loops (reference hot loop #1, SURVEY.md §3.3) and the
on-device frontends (WavLM L≈499, BERT L=128). The kernel follows the
canonical TPU flash pattern:

  grid = (B·H, Lq/bq, Lk/bk), sequential minor axis over key blocks,
  fp32 online-softmax state (m, l, acc) in VMEM scratch, MXU matmuls via
  jnp.dot(preferred_element_type=f32), key-padding handled as an additive
  bias block streamed from HBM.

Shapes are padded up to (bq, bk) multiples in the wrapper; padded key
columns carry a -1e9 bias so they get exactly 0 probability (same
NEG_INF convention as the XLA path, hriemo.core.masking).

Backward: custom VJP that recomputes attention with the XLA einsum path —
at this model family's sequence lengths (L ≤ ~512) the recompute is cheap
and keeps the backward numerically identical to the reference path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.masking import NEG_INF

BQ = 128
BK = 128


def _flash_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, nk):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, hd]
    k = k_ref[0]  # [bk, hd]
    v = v_ref[0]  # [bk, hd]
    bias = bias_ref[0]  # [1, bk]

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias  # [bq, bk]

    m_prev = m_scr[:, :1]  # [bq, 1]
    l_prev = l_scr[:, :1]
    m_cur = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), m_prev)
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur)  # [bq, bk]
    l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, hd]
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_cur, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_cur, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        # fully-masked rows have l from uniform exp(0) terms, never 0
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def _onepass_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    """Single-pass attention: K/V resident in VMEM (short/medium sequences).

    For L ≲ 2k the whole K/V panel fits VMEM, so the two-pass online
    softmax is unnecessary — one fp32 score panel per q-block, softmax,
    PV matmul. Measured 1.3× faster than XLA's fused attention at the
    framework's hot shape (B=64, H=8, L=499, hd=96, bf16: 2.5 vs 3.3 ms).
    """
    q = q_ref[0]  # [bq, hd]
    k = k_ref[0]  # [Lk, hd]
    v = v_ref[0]
    bias = bias_ref[0]  # [1, Lk]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


# one-pass path applies while K/V (+ the fp32 score panel) fit VMEM
ONEPASS_MAX_LK = 2048


def _onepass_impl(q, k, v, bias):
    b, h, lq, hd = q.shape
    lk = k.shape[2]
    scale = 1.0 / math.sqrt(hd)

    # block size that minimises q-axis padding (see wavlm_attention)
    _padded = {bq_: -(-lq // bq_) * bq_ for bq_ in (128, 256)}
    _best = min(_padded.values())
    bq = max(b_ for b_, p_ in _padded.items() if p_ == _best)
    qp = _pad_to(q.reshape(b * h, lq, hd), 1, bq)
    kp = _pad_to(k.reshape(b * h, lk, hd), 1, 128)
    vp = _pad_to(v.reshape(b * h, lk, hd), 1, 128)
    biasp = _pad_to(bias, 1, 128, value=NEG_INF)[:, None, :]
    lqp, lkp = qp.shape[1], kp.shape[1]
    nq = lqp // bq

    out = pl.pallas_call(
        functools.partial(_onepass_kernel, scale=scale),
        grid=(b * h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, lkp), lambda i, j: (jax.lax.div(i, h), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lqp, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lqp * lkp * hd,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * lqp * lkp,
        ),
        interpret=jax.default_backend() != "tpu",
    )(biasp, qp, kp, vp)
    return out[:, :lq].reshape(b, h, lq, hd)


def _pad_to(x, axis, mult, value=0.0):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _pallas_mha_fwd_impl(q, k, v, bias):
    """q [B,H,Lq,hd], k/v [B,H,Lk,hd], bias [B,Lk] additive fp32."""
    b, h, lq, hd = q.shape
    lk = k.shape[2]
    scale = 1.0 / math.sqrt(hd)

    qp = _pad_to(q.reshape(b * h, lq, hd), 1, BQ)
    kp = _pad_to(k.reshape(b * h, lk, hd), 1, BK)
    vp = _pad_to(v.reshape(b * h, lk, hd), 1, BK)
    # [B, 1, Lk]: the singleton sublane dim keeps the block shape legal
    # (last two dims must divide (8, 128) or equal the array dims).
    biasp = _pad_to(bias, 1, BK, value=NEG_INF)[:, None, :]

    lqp, lkp = qp.shape[1], kp.shape[1]
    nq, nk = lqp // BQ, lkp // BK

    grid = (b * h, nq, nk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, BK), lambda bh, iq, ik: (jax.lax.div(bh, h), 0, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, hd), lambda bh, iq, ik: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, hd), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, hd), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, hd), lambda bh, iq, ik: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lqp, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((BQ, 128), jnp.float32),  # m
            pltpu.VMEM((BQ, 128), jnp.float32),  # l
            pltpu.VMEM((BQ, hd), jnp.float32),   # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lqp * lkp * hd,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * lqp * lkp,
        ),
        # interpret mode lets the CPU test suite execute the same kernel
        interpret=jax.default_backend() != "tpu",
    )(biasp, qp, kp, vp)

    return out[:, :lq].reshape(b, h, lq, hd)


def _xla_reference(q, k, v, bias):
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32)
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _streaming_reference(q, k, v, bias, blk: int = 512):
    """Online-softmax attention as a remat'd ``lax.scan`` over key blocks.

    Numerically equal to :func:`_xla_reference`, but differentiating it is
    memory-bounded: the backward re-runs each block body (jax.checkpoint)
    instead of materialising the [B, H, Lq, Lk] panel — this is what makes
    the long-sequence backward viable in the exact regime the Pallas
    forward is routed to (L ≥ 1024).
    """
    b, h, lq, hd = q.shape
    lk = k.shape[2]
    scale = 1.0 / math.sqrt(hd)
    nblk = -(-lk // blk)
    pad = nblk * blk - lk
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    biasp = jnp.pad(bias, ((0, 0), (0, pad)), constant_values=NEG_INF)

    k_blocks = kp.reshape(b, h, nblk, blk, hd).transpose(2, 0, 1, 3, 4)
    v_blocks = vp.reshape(b, h, nblk, blk, hd).transpose(2, 0, 1, 3, 4)
    bias_blocks = biasp.reshape(b, nblk, blk).transpose(1, 0, 2)

    qs = q * scale

    @jax.checkpoint
    def body(carry, blk_in):
        out, m, l = carry
        kb, vb, bb = blk_in
        s = jnp.einsum("bhqd,bhkd->bhqk", qs, kb,
                       preferred_element_type=jnp.float32)
        s = s + bb[:, None, None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vb.dtype), vb,
                        preferred_element_type=jnp.float32)
        return (out * alpha + pv, m_new, l_new), None

    init = (
        jnp.zeros((b, h, lq, hd), jnp.float32),
        jnp.full((b, h, lq, 1), -jnp.inf, jnp.float32),
        jnp.zeros((b, h, lq, 1), jnp.float32),
    )
    (out, _m, l), _ = jax.lax.scan(body, init, (k_blocks, v_blocks, bias_blocks))
    return (out / l).astype(q.dtype)


def _dispatch_fwd(q, k, v, bias):
    if k.shape[2] <= ONEPASS_MAX_LK:
        return _onepass_impl(q, k, v, bias)
    return _pallas_mha_fwd_impl(q, k, v, bias)


@jax.custom_vjp
def _pallas_mha(q, k, v, bias):
    return _dispatch_fwd(q, k, v, bias)


def _fwd(q, k, v, bias):
    return _dispatch_fwd(q, k, v, bias), (q, k, v, bias)


def _bwd(res, g):
    q, k, v, bias = res
    # memory-bounded recompute: differentiate the remat'd streaming scan —
    # never materialises the [B,H,Lq,Lk] panel (the whole point of routing
    # here is that the panel does not fit; review finding).
    _, vjp = jax.vjp(_streaming_reference, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias


_pallas_mha.defvjp(_fwd, _bwd)


def pallas_mha(q, k, v, key_padding_mask=None):
    """Fused attention entry point (see module docstring)."""
    b, _, _, _ = q.shape
    lk = k.shape[2]
    if key_padding_mask is None:
        bias = jnp.zeros((b, lk), jnp.float32)
    else:
        bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)
    return _pallas_mha(q, k, v, bias)

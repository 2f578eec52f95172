"""Sequence parallelism: ring attention over a mesh axis.

The reference *avoids* long sequences by center-cropping (SURVEY.md §5.7);
this module provides the TPU-native headroom path: shard the sequence axis
of self-attention across chips and rotate K/V blocks around the ring with
``lax.ppermute`` (ICI neighbor transfers), combining partial results with
an online softmax. Memory per chip drops from O(L²) to O(L²/n) and K/V
transfers overlap compute block-by-block.

``ring_self_attention`` is numerically equivalent to full softmax
attention (verified vs the dense reference on the CPU mesh) and is exposed
through ``sp_self_attention`` which shard_maps it over a mesh axis.

This serves long-audio inputs (e.g. un-cropped WavLM sequences) where one
chip's HBM can't hold the score panel; for the product's cropped shapes
(L ≤ 499) plain attention is faster — same measurement-driven routing
philosophy as hriemo.ops.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..core.masking import NEG_INF


def _ring_body(i, carry, q, axis_name, n_dev):
    """One ring step: attend q to the current K/V block, rotate blocks."""
    out, m, l, k_cur, v_cur, bias_cur = carry

    s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cur,
                   preferred_element_type=jnp.float32)
    s = s + bias_cur[:, None, None, :]

    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v_cur.dtype), v_cur,
                    preferred_element_type=jnp.float32)
    out_new = out * alpha + pv

    # rotate K/V/bias to the next ring position (ICI neighbor transfer);
    # skip the final rotation — its output would be discarded
    def rotate(args):
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        return tuple(jax.lax.ppermute(a, axis_name, perm) for a in args)

    k_nxt, v_nxt, bias_nxt = jax.lax.cond(
        i < n_dev - 1, rotate, lambda args: args, (k_cur, v_cur, bias_cur)
    )
    return out_new, m_new, l_new, k_nxt, v_nxt, bias_nxt


def ring_self_attention(q, k, v, key_padding_mask, axis_name: str):
    """Inside shard_map: q/k/v are the local sequence shards
    ``[B, H, L/n, hd]``; mask is the local ``[B, L/n]`` (True = PAD).

    Returns the local shard of full-softmax attention over the global
    sequence.
    """
    n_dev = jax.lax.psum(1, axis_name)
    scale = 1.0 / math.sqrt(q.shape[-1])
    q = q * scale
    bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)

    b, h, lq, hd = q.shape
    out0 = jnp.zeros((b, h, lq, hd), jnp.float32)
    m0 = jnp.full((b, h, lq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, lq, 1), jnp.float32)

    body = functools.partial(_ring_body, q=q, axis_name=axis_name, n_dev=n_dev)
    carry = (out0, m0, l0, k, v, bias)
    carry = jax.lax.fori_loop(0, n_dev, body, carry)
    out, m, l = carry[0], carry[1], carry[2]
    return (out / l).astype(q.dtype)


def sp_self_attention(mesh, axis_name: str = "model"):
    """Returns ``f(q, k, v, key_padding_mask)`` where the sequence axis of
    all operands is sharded over ``axis_name`` and each chip computes its
    query shard with ring-rotated K/V."""
    from jax import shard_map

    spec_qkv = P(None, None, axis_name, None)  # [B, H, L, hd] — shard L
    spec_mask = P(None, axis_name)             # [B, L]

    fn = functools.partial(ring_self_attention, axis_name=axis_name)
    return shard_map(
        fn, mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_mask),
        out_specs=spec_qkv,
        # the fori_loop carry mixes device-varying (rotating K/V) and
        # invariant values; VMA checking rejects that conservatively
        check_vma=False,
    )

"""Fused (flash) multi-head attention for TPU.

Entry point: :func:`flash_mha` — consumes already-projected per-head
``q/k/v`` of shape ``[B, H, L, hd]`` plus an optional ``[B, Lk]`` True=PAD
key-padding mask, and returns ``[B, H, Lq, hd]``. It never materialises
the ``[B, H, Lq, Lk]`` probability tensor in HBM.

Routing rules (decided by the caller, hriemo.nn.attention):
  * weight export requested → einsum path (probabilities must exist);
  * attention dropout active → einsum path;
  * otherwise on TPU → this kernel.

For shapes too small to tile profitably (the emotion decoder's E≤8 query
rows, utterance-level L=1) the XLA fallback below is used — XLA already
fuses those fine, and Pallas tiling constraints (8×128 fp32 tiles) would
force heavy padding.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..core.masking import NEG_INF


def _xla_sdpa(q, k, v, key_padding_mask):
    """Reference scaled-dot-product attention (XLA-fused fallback).

    Delegates to the single shared reference implementation so the kernel
    backward and this fallback can never diverge numerically.
    """
    from .flash_attention_pallas import _xla_reference

    lk = k.shape[2]
    if key_padding_mask is None:
        bias = jnp.zeros((q.shape[0], lk), jnp.float32)
    else:
        bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)
    return _xla_reference(q, k, v, bias)


def _use_pallas(q_shape, k_shape) -> bool:
    if jax.default_backend() != "tpu":
        return False
    _, _, lq, hd = q_shape
    lk = k_shape[2]
    # Measured on v5e (B=64, H=8, hd=96, bf16): isolated, the one-pass
    # kernel beats XLA at 499x499 (2.5 vs 3.1 ms), but inside the full
    # fusion stack XLA's fusion with surrounding projections wins the
    # total (16.3 vs 16.6 ms whole-model A/B) — kernel call boundaries
    # cost more than the attention win at these sizes. Route to Pallas
    # only where the score panel becomes a genuine memory problem
    # (L ≥ 1024: one-pass up to 2048, streaming flash beyond).
    return lq >= 1024 and lk >= 1024 and hd % 8 == 0 and hd <= 256


def flash_mha(q, k, v, key_padding_mask=None):
    """Fused attention; falls back to XLA for tiny/odd shapes or off-TPU."""
    if not _use_pallas(q.shape, k.shape):
        return _xla_sdpa(q, k, v, key_padding_mask)
    from .flash_attention_pallas import pallas_mha

    return pallas_mha(q, k, v, key_padding_mask)

"""Padding-mask primitives shared across the framework.

Conventions (these mirror the behavioral contract of the reference,
see SURVEY.md §1 "artifact contract"):

  * In-memory model masks are boolean with **True = PAD** (position is
    ignored). This is the convention of the reference model stack
    (reference: models/beta_gate_tacfn.py:6-24).
  * Stored feature artifacts use the opposite convention, 1 = valid
    (HF-style `attention_mask`); `invert_valid_mask` converts.
  * Fused-sequence masks are the OR of the per-modality masks aligned to
    the fused length — PAD if *any* modality pads that position
    (reference: models/fusion_with_emotion_decoder.py:71-115).

Everything here is shape-polymorphic pure JAX, safe under jit/pjit, and
uses only static Python control flow on mask presence (mask is either a
traced array or None, which is a static property of the trace).
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """Mean-pool over the sequence axis, ignoring PAD positions.

    Semantics match the reference ``masked_mean`` including the
    ``clamp(min=1)`` denominator guard for fully-padded rows
    (reference: models/beta_gate_tacfn.py:6-24).

    Args:
        x:    ``[B, L, d]`` features.
        mask: ``[B, L]`` bool, True = PAD, or None for no padding.

    Returns:
        ``[B, d]`` pooled features, in ``x.dtype``.
    """
    # fp32 accumulation: under bf16 compute, valid counts > 256 and long
    # sums would otherwise round (bf16 cannot represent 499 exactly)
    if mask is None:
        return (jnp.sum(x, axis=1, dtype=jnp.float32) / x.shape[1]).astype(x.dtype)
    valid = jnp.logical_not(mask)
    denom = jnp.clip(jnp.sum(valid, axis=1, keepdims=True).astype(jnp.float32), min=1.0)
    weighted = jnp.sum(x * valid[:, :, None].astype(x.dtype), axis=1, dtype=jnp.float32)
    return (weighted / denom).astype(x.dtype)


def invert_valid_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Convert a stored 1=valid/0=pad mask into the model's True=PAD bool mask.

    Mirrors the inversion done when loading stored features
    (reference: scripts/fusion/train_fusion_seq_level.py:164-170).
    """
    return attention_mask == 0


def align_mask_to_length(mask: jnp.ndarray, length: int) -> jnp.ndarray:
    """Align a ``[B, L]`` True=PAD mask to a target length.

    Truncates if longer; pads with True (=PAD) if shorter — the
    conservative rule of the reference
    (reference: models/fusion_with_emotion_decoder.py:84-107).
    """
    cur = mask.shape[1]
    if cur == length:
        return mask
    if cur > length:
        return mask[:, :length]
    pad = jnp.ones((mask.shape[0], length - cur), dtype=bool)
    return jnp.concatenate([mask, pad], axis=1)


def build_fused_mask(
    mask_a: jnp.ndarray | None,
    mask_t: jnp.ndarray | None,
    fused_length: int,
) -> jnp.ndarray | None:
    """Key-padding mask for the fused sequence: PAD if any modality pads.

    Reference: models/fusion_with_emotion_decoder.py:71-115.
    """
    if mask_a is None and mask_t is None:
        return None
    ma = align_mask_to_length(mask_a, fused_length) if mask_a is not None else None
    mt = align_mask_to_length(mask_t, fused_length) if mask_t is not None else None
    if ma is None:
        return mt
    if mt is None:
        return ma
    return jnp.logical_or(ma, mt)


# Large-negative logit used instead of -inf when masking attention scores.
# exp(-1e9) underflows to exactly 0 in fp32 softmax, so results are
# bit-compatible with an additive -inf mask whenever at least one key is
# valid, while fully-padded query rows degrade to a uniform distribution
# instead of NaN (strictly safer than the reference's torch behavior and
# unobservable in valid usage).
NEG_INF = -1e9


def mask_to_bias(
    key_padding_mask: jnp.ndarray | None, dtype=jnp.float32
) -> jnp.ndarray | None:
    """``[B, Lk]`` True=PAD mask → additive ``[B, 1, 1, Lk]`` attention bias."""
    if key_padding_mask is None:
        return None
    bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(dtype)
    return bias[:, None, None, :]

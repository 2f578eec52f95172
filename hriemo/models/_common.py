"""Shared helpers for the model zoo."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class RngStream:
    """Deterministic per-call-site dropout keys derived from one base key.

    ``stream()`` returns a fresh key each call (fold_in on a counter), or
    None when no base key was provided (eval / deterministic mode).
    """

    def __init__(self, key=None):
        self._key = key
        self._i = 0

    def __call__(self):
        if self._key is None:
            return None
        k = jax.random.fold_in(self._key, self._i)
        self._i += 1
        return k


def ensure_3d(x: jnp.ndarray) -> jnp.ndarray:
    """[B, d] -> [B, 1, d]; [B, L, d] passes through.

    Reference: models/fusion_with_emotion_decoder.py:60-69.
    """
    if x.ndim == 2:
        return x[:, None, :]
    if x.ndim == 3:
        return x
    raise ValueError(f"Expected 2D or 3D tensor, got shape {x.shape}")

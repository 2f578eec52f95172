"""Scalar β-gate (legacy variant).

Behavioral contract (reference: models/beta_gate.py):
  * masked-mean pool each modality → ``[B, d]``;
  * gate input ``[a, t, |a−t|, a⊙t]`` ∈ R^{4d};
  * MLP(4d→hidden→1) + sigmoid → scalar β per sample ``[B, 1]``;
  * fuse ``β·h_a + (1−β)·h_t`` on the *raw* (un-normalised) features;
  * if lengths differ, fusion length = **text** length, both truncated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.masking import masked_mean
from ..nn.layers import mlp2_apply, mlp2_init
from ..nn.module import Module

__all__ = ["BetaGate", "masked_mean"]


class BetaGate(Module):
    def __init__(self, d_model: int = 768, hidden_dim: int = 256, seed: int = 0):
        self.d_model = d_model
        self.hidden_dim = hidden_dim
        self.seed = seed

    def init(self, key):
        return {"mlp": mlp2_init(key, self.d_model * 4, self.hidden_dim, 1)}

    def apply(self, params, h_a, h_t, mask_a=None, mask_t=None, train=False, rng=None):
        b = h_a.shape[0]

        h_a_pool = masked_mean(h_a, mask_a)  # [B, d]
        h_t_pool = masked_mean(h_t, mask_t)  # [B, d]

        diff = jnp.abs(h_a_pool - h_t_pool)
        prod = h_a_pool * h_t_pool
        gate_input = jnp.concatenate([h_a_pool, h_t_pool, diff, prod], axis=-1)

        beta = jax.nn.sigmoid(mlp2_apply(params["mlp"], gate_input))  # [B, 1]

        # fusion length: text length when the modalities disagree
        from .beta_gate_tacfn import _fit_length

        l_a, l_t = h_a.shape[1], h_t.shape[1]
        length = l_a if l_a == l_t else l_t
        h_a = _fit_length(h_a, length)
        h_t = _fit_length(h_t, length)

        beta_b = beta.reshape(b, 1, 1)
        h_fusion = beta_b * h_a + (1.0 - beta_b) * h_t
        return h_fusion, beta

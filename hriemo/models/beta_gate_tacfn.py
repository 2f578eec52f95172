"""Vector-wise β-gate (TACFN variant, the current default).

Behavioral contract (reference: models/beta_gate_tacfn.py):
  * per-modality LayerNorm first;
  * masked-mean pool the *normalised* sequences;
  * gate input ``[a, t, |a−t|, a⊙t]`` ∈ R^{4d};
  * MLP(4d→hidden→d) + sigmoid → per-dimension gate ``w ∈ [0,1]^d``;
  * returned ``beta`` is ``w.mean(-1)`` ∈ ``[B, 1]`` (logging scalar);
  * fusion is per-dimension on the **normalised** features:
    ``w ⊙ h_a_n + (1−w) ⊙ h_t_n``;
  * length alignment identical to the scalar gate (text length wins).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.masking import masked_mean
from ..nn.layers import layer_norm_apply, layer_norm_init, mlp2_apply, mlp2_init
from ..nn.module import Module

__all__ = ["BetaGate", "masked_mean"]


def _fit_length(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """Truncate (reference behavior) or zero-pad (extension: the reference
    crashes when audio is shorter than text; padded positions end up True
    in the fused pad mask via build_fused_mask's pad-with-PAD rule)."""
    if x.shape[1] > length:
        return x[:, :length, :]
    if x.shape[1] < length:
        return jnp.pad(x, ((0, 0), (0, length - x.shape[1]), (0, 0)))
    return x


class BetaGate(Module):
    def __init__(self, d_model: int = 768, hidden_dim: int = 256, seed: int = 0):
        self.d_model = d_model
        self.hidden_dim = hidden_dim
        self.seed = seed

    def init(self, key):
        return {
            "norm_a": layer_norm_init(self.d_model),
            "norm_t": layer_norm_init(self.d_model),
            "mlp": mlp2_init(key, self.d_model * 4, self.hidden_dim, self.d_model),
        }

    def apply(self, params, h_a, h_t, mask_a=None, mask_t=None, train=False, rng=None):
        b, d = h_a.shape[0], self.d_model

        h_a_n = layer_norm_apply(params["norm_a"], h_a)
        h_t_n = layer_norm_apply(params["norm_t"], h_t)

        a_pool = masked_mean(h_a_n, mask_a)
        t_pool = masked_mean(h_t_n, mask_t)

        diff = jnp.abs(a_pool - t_pool)
        prod = a_pool * t_pool
        gate_input = jnp.concatenate([a_pool, t_pool, diff, prod], axis=-1)  # [B, 4d]

        w = jax.nn.sigmoid(mlp2_apply(params["mlp"], gate_input))  # [B, d]
        beta_scalar = jnp.mean(w, axis=-1, keepdims=True)  # [B, 1]

        l_a, l_t = h_a_n.shape[1], h_t_n.shape[1]
        length = l_a if l_a == l_t else l_t
        h_a_n = _fit_length(h_a_n, length)
        h_t_n = _fit_length(h_t_n, length)

        w_b = w.reshape(b, 1, d)
        h_fusion = w_b * h_a_n + (1.0 - w_b) * h_t_n
        return h_fusion, beta_scalar

"""TACFN fusion classifier (no-decoder ablation baseline).

Behavioral contract (reference: models/fusion_classifier.py):
  * TACFN CrossModalTransformer → vector β-gate → MLP head
    ``LayerNorm → Linear(d,d) → ReLU → Dropout → Linear(d,C)``;
  * quirk preserved: the fused sequence is **unmasked** mean-pooled over
    time before the head (reference :145 pools with a plain ``mean``);
  * accepts utterance-level ``[B, d]`` and sequence-level ``[B, L, d]``;
  * returns ``(logits [B,C], beta [B,1], h_fusion_pooled [B,d])``.

Head param keys use torch ``nn.Sequential`` indices ("0" LayerNorm,
"1"/"4" Linear) so checkpoints interchange by name.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.layers import (
    dropout,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    relu,
)
from ..nn.module import Module
from ._common import RngStream, ensure_3d
from .beta_gate_tacfn import BetaGate
from .cross_modal_block_tacfn import CrossModalTransformer


class FusionClassifier(Module):
    def __init__(
        self,
        d_model: int = 768,
        num_classes: int = 4,
        n_heads: int = 8,
        num_layers: int = 2,
        beta_hidden: int = 256,
        dropout: float = 0.2,
        seed: int = 0,
    ):
        self.d_model = d_model
        self.num_classes = num_classes
        self.dropout_rate = dropout
        self.cross_modal = CrossModalTransformer(
            num_layers=num_layers, d_model=d_model, n_heads=n_heads, dropout=dropout
        )
        self.beta_gate = BetaGate(d_model=d_model, hidden_dim=beta_hidden)
        self.seed = seed

    def init(self, key):
        ks = jax.random.split(key, 4)
        d = self.d_model
        return {
            "cross_modal": self.cross_modal.init(ks[0]),
            "beta_gate": self.beta_gate.init(ks[1]),
            "classifier": {
                "0": layer_norm_init(d),
                "1": linear_init(ks[2], d, d),
                "4": linear_init(ks[3], d, self.num_classes),
            },
        }

    def apply(self, params, h_a, h_t, mask_a=None, mask_t=None, train=False, rng=None):
        rs = RngStream(rng)
        h_a = ensure_3d(h_a)
        h_t = ensure_3d(h_t)

        h_a_tilde, h_t_tilde = self.cross_modal.apply(
            params["cross_modal"], h_a, h_t, mask_a, mask_t, train=train, rng=rs()
        )
        h_fusion, beta = self.beta_gate.apply(
            params["beta_gate"], h_a_tilde, h_t_tilde, mask_a, mask_t
        )

        # unmasked mean-pool over time (reference quirk, :145)
        h_fusion_pooled = jnp.mean(h_fusion, axis=1)  # [B, d]

        c = params["classifier"]
        x = layer_norm_apply(c["0"], h_fusion_pooled)
        x = relu(linear_apply(c["1"], x))
        x = dropout(x, self.dropout_rate, rs(), train)
        logits = linear_apply(c["4"], x)

        return logits, beta, h_fusion_pooled

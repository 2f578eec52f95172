"""Bidirectional cross-modal transformer (legacy / IEMOCAP variant).

Behavioral contract (reference: models/cross_modal_block.py):
  * audio→text cross-attention (query = audio, key/value = text, masked by
    the *text* pad mask), then residual + LayerNorm, FFN(4d, ReLU) +
    residual + LayerNorm;
  * the symmetric text→audio path;
  * works for utterance-level ``[B,1,d]`` and sequence-level ``[B,L,d]``;
  * no attention export in this variant.

Parameter names match the torch state_dict
(``attn_a2t.in_proj_weight``, ``ffn_a.0.weight``, ``norm_a1.weight``, …).
"""

from __future__ import annotations

import jax

from ..nn.attention import mha_apply, mha_init
from ..nn.layers import (
    dropout,
    layer_norm_apply,
    layer_norm_init,
    mlp2_apply,
    mlp2_init,
)
from ..nn.module import Module
from ._common import RngStream


class CrossModalBlock(Module):
    def __init__(self, d_model: int = 768, n_heads: int = 8, dropout: float = 0.1, seed: int = 0):
        self.d_model = d_model
        self.n_heads = n_heads
        self.dropout_rate = dropout
        self.seed = seed

    def init(self, key):
        ks = jax.random.split(key, 4)
        d = self.d_model
        return {
            "attn_a2t": mha_init(ks[0], d),
            "attn_t2a": mha_init(ks[1], d),
            "ffn_a": mlp2_init(ks[2], d, 4 * d, d),
            "ffn_t": mlp2_init(ks[3], d, 4 * d, d),
            "norm_a1": layer_norm_init(d),
            "norm_a2": layer_norm_init(d),
            "norm_t1": layer_norm_init(d),
            "norm_t2": layer_norm_init(d),
        }

    def apply(self, params, h_a, h_t, mask_a=None, mask_t=None, train=False, rng=None):
        p = self.dropout_rate
        rs = RngStream(rng)

        a2t, _ = mha_apply(
            params["attn_a2t"], h_a, h_t, h_t, self.n_heads,
            key_padding_mask=mask_t, dropout_rate=p, dropout_key=rs(), train=train,
        )
        h_a_tilde = layer_norm_apply(params["norm_a1"], h_a + dropout(a2t, p, rs(), train))
        ffn_a = mlp2_apply(params["ffn_a"], h_a_tilde)
        h_a_tilde = layer_norm_apply(params["norm_a2"], h_a_tilde + dropout(ffn_a, p, rs(), train))

        t2a, _ = mha_apply(
            params["attn_t2a"], h_t, h_a, h_a, self.n_heads,
            key_padding_mask=mask_a, dropout_rate=p, dropout_key=rs(), train=train,
        )
        h_t_tilde = layer_norm_apply(params["norm_t1"], h_t + dropout(t2a, p, rs(), train))
        ffn_t = mlp2_apply(params["ffn_t"], h_t_tilde)
        h_t_tilde = layer_norm_apply(params["norm_t2"], h_t_tilde + dropout(ffn_t, p, rs(), train))

        return h_a_tilde, h_t_tilde


class CrossModalTransformer(Module):
    """Stack of :class:`CrossModalBlock` (reference: models/cross_modal_block.py:74-95)."""

    def __init__(self, num_layers: int = 2, d_model: int = 768, n_heads: int = 8,
                 dropout: float = 0.1, seed: int = 0):
        self.num_layers = num_layers
        self.block = CrossModalBlock(d_model, n_heads, dropout)
        self.seed = seed

    def init(self, key):
        ks = jax.random.split(key, self.num_layers)
        return {"layers": {str(i): self.block.init(ks[i]) for i in range(self.num_layers)}}

    def apply(self, params, h_a, h_t, mask_a=None, mask_t=None, train=False, rng=None):
        for i in range(self.num_layers):
            layer_rng = None if rng is None else jax.random.fold_in(rng, i)
            h_a, h_t = self.block.apply(
                params["layers"][str(i)], h_a, h_t, mask_a, mask_t,
                train=train, rng=layer_rng,
            )
        return h_a, h_t

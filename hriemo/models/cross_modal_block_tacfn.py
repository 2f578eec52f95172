"""TACFN-style cross-modal transformer (the current/flagship encoder).

Behavioral contract (reference: models/cross_modal_block_tacfn.py):
  1. intra-modal self-attention per modality (redundancy reduction), each
     followed by residual + LayerNorm;
  2. bidirectional cross-modal attention (audio→text then text→audio),
     each followed by residual + LayerNorm and FFN(4d, ReLU) + residual +
     LayerNorm;
  3. ``return_attention=True`` collects a per-layer dict with keys
     ``audio_self``, ``text_self``, ``audio_queries_text``,
     ``text_queries_audio`` — each a **head-averaged** ``[B, Lq, Lk]`` map
     (what the interpretability notebooks plot); the stack returns a
     list of these dicts, one per layer.

When attention export is off, the MHA calls route to the Pallas flash
kernel on TPU (dual-path requirement, SURVEY.md §7 step 8).
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
        ks = jax.random.split(key, 6)
        d = self.d_model
        return {
            "self_attn_a": mha_init(ks[0], d),
            "self_attn_t": mha_init(ks[1], d),
            "self_norm_a": layer_norm_init(d),
            "self_norm_t": layer_norm_init(d),
            "attn_a2t": mha_init(ks[2], d),
            "attn_t2a": mha_init(ks[3], d),
            "ffn_a": mlp2_init(ks[4], d, 4 * d, d),
            "ffn_t": mlp2_init(ks[5], d, 4 * d, d),
            "norm_a1": layer_norm_init(d),
            "norm_a2": layer_norm_init(d),
            "norm_t1": layer_norm_init(d),
            "norm_t2": layer_norm_init(d),
        }

    def apply(
        self, params, h_a, h_t, mask_a=None, mask_t=None,
        return_attention: bool = False, train: bool = False, rng=None,
    ):
        p = self.dropout_rate
        rs = RngStream(rng)
        attn_maps = {}

        # 1) intra-modal self-attention
        a_sa, w_a_sa = mha_apply(
            params["self_attn_a"], h_a, h_a, h_a, self.n_heads,
            key_padding_mask=mask_a, need_weights=return_attention,
            dropout_rate=p, dropout_key=rs(), train=train,
        )
        h_a_self = layer_norm_apply(params["self_norm_a"], h_a + dropout(a_sa, p, rs(), train))
        if return_attention:
            attn_maps["audio_self"] = w_a_sa

        t_sa, w_t_sa = mha_apply(
            params["self_attn_t"], h_t, h_t, h_t, self.n_heads,
            key_padding_mask=mask_t, need_weights=return_attention,
            dropout_rate=p, dropout_key=rs(), train=train,
        )
        h_t_self = layer_norm_apply(params["self_norm_t"], h_t + dropout(t_sa, p, rs(), train))
        if return_attention:
            attn_maps["text_self"] = w_t_sa

        # 2) audio queries text — the cross-modal alignment map
        a2t, w_a2t = mha_apply(
            params["attn_a2t"], h_a_self, h_t_self, h_t_self, self.n_heads,
            key_padding_mask=mask_t, need_weights=return_attention,
            dropout_rate=p, dropout_key=rs(), train=train,
        )
        h_a_cm = layer_norm_apply(params["norm_a1"], h_a_self + dropout(a2t, p, rs(), train))
        ffn_a = mlp2_apply(params["ffn_a"], h_a_cm)
        h_a_cm = layer_norm_apply(params["norm_a2"], h_a_cm + dropout(ffn_a, p, rs(), train))
        if return_attention:
            attn_maps["audio_queries_text"] = w_a2t

        # 3) text queries audio
        t2a, w_t2a = mha_apply(
            params["attn_t2a"], h_t_self, h_a_self, h_a_self, self.n_heads,
            key_padding_mask=mask_a, need_weights=return_attention,
            dropout_rate=p, dropout_key=rs(), train=train,
        )
        h_t_cm = layer_norm_apply(params["norm_t1"], h_t_self + dropout(t2a, p, rs(), train))
        ffn_t = mlp2_apply(params["ffn_t"], h_t_cm)
        h_t_cm = layer_norm_apply(params["norm_t2"], h_t_cm + dropout(ffn_t, p, rs(), train))
        if return_attention:
            attn_maps["text_queries_audio"] = w_t2a

        if return_attention:
            return h_a_cm, h_t_cm, attn_maps
        return h_a_cm, h_t_cm


class CrossModalTransformer(Module):
    """Stack of TACFN blocks (reference: models/cross_modal_block_tacfn.py:130-166)."""

    def __init__(self, num_layers: int = 2, d_model: int = 768, n_heads: int = 8,
                 dropout: float = 0.1, seed: int = 0):
        self.num_layers = num_layers
        self.block = CrossModalBlock(d_model, n_heads, dropout)
        self.seed = seed

    def init(self, key):
        ks = jax.random.split(key, self.num_layers)
        return {"layers": {str(i): self.block.init(ks[i]) for i in range(self.num_layers)}}

    def apply(
        self, params, h_a, h_t, mask_a=None, mask_t=None,
        return_attention: bool = False, train: bool = False, rng=None,
    ):
        all_layers_attn = []
        for i in range(self.num_layers):
            layer_rng = None if rng is None else jax.random.fold_in(rng, i)
            out = self.block.apply(
                params["layers"][str(i)], h_a, h_t, mask_a, mask_t,
                return_attention=return_attention, train=train, rng=layer_rng,
            )
            if return_attention:
                h_a, h_t, attn_maps = out
                all_layers_attn.append(attn_maps)
            else:
                h_a, h_t = out
        if return_attention:
            return h_a, h_t, all_layers_attn
        return h_a, h_t

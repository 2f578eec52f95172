"""Emotion-query transformer decoder with attention export.

Behavioral contract (reference: models/emotion_decoder.py):
  * learnable ``emotion_queries`` parameter ``[num_emotions, d]``,
    init ``randn``;
  * each layer: self-attention over the E queries (post-norm residual),
    cross-attention query→memory with the memory pad mask (this map is
    the "emotion attribution" interpretability signal, head-averaged
    ``[B, E, L]``), FFN(dim_feedforward, ReLU);
  * no causal mask anywhere;
  * optional ``out_proj = Linear(d, 1)`` giving per-emotion logits via a
    squeeze → ``[B, E]``;
  * ``return_attention=True`` returns the per-layer list of cross-attention
    maps.

E is tiny (4–6), so the decoder's attention never routes to the flash
kernel — XLA fuses these small matmuls fine (see hriemo.ops routing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import initializers as init
from ..nn.attention import mha_apply, mha_init
from ..nn.layers import (
    dropout,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    relu,
)
from ..nn.module import Module
from ._common import RngStream


class ExplainableDecoderLayer(Module):
    """Hand-rolled ``nn.TransformerDecoderLayer`` equivalent that can
    return its cross-attention weights (reference: models/emotion_decoder.py:5-64)."""

    def __init__(self, d_model: int, nhead: int, dim_feedforward: int = 2048,
                 dropout: float = 0.1, seed: int = 0):
        self.d_model = d_model
        self.nhead = nhead
        self.dim_feedforward = dim_feedforward
        self.dropout_rate = dropout
        self.seed = seed

    def init(self, key):
        ks = jax.random.split(key, 4)
        d = self.d_model
        return {
            "self_attn": mha_init(ks[0], d),
            "norm1": layer_norm_init(d),
            "cross_attn": mha_init(ks[1], d),
            "norm2": layer_norm_init(d),
            "linear1": linear_init(ks[2], d, self.dim_feedforward),
            "linear2": linear_init(ks[3], self.dim_feedforward, d),
            "norm3": layer_norm_init(d),
        }

    def apply(
        self, params, tgt, memory, memory_key_padding_mask=None,
        return_attention: bool = False, train: bool = False, rng=None,
    ):
        p = self.dropout_rate
        rs = RngStream(rng)

        # 1) self-attention among emotion queries
        tgt2, _ = mha_apply(
            params["self_attn"], tgt, tgt, tgt, self.nhead,
            dropout_rate=p, dropout_key=rs(), train=train,
        )
        tgt = layer_norm_apply(params["norm1"], tgt + dropout(tgt2, p, rs(), train))

        # 2) cross-attention: emotion queries → fused memory
        tgt2, cross_attn_weights = mha_apply(
            params["cross_attn"], tgt, memory, memory, self.nhead,
            key_padding_mask=memory_key_padding_mask,
            need_weights=return_attention,
            dropout_rate=p, dropout_key=rs(), train=train,
        )
        tgt = layer_norm_apply(params["norm2"], tgt + dropout(tgt2, p, rs(), train))

        # 3) FFN
        hidden = dropout(relu(linear_apply(params["linear1"], tgt)), p, rs(), train)
        tgt2 = linear_apply(params["linear2"], hidden)
        tgt = layer_norm_apply(params["norm3"], tgt + dropout(tgt2, p, rs(), train))

        if return_attention:
            return tgt, cross_attn_weights
        return tgt, None


class EmotionDecoder(Module):
    """Learnable emotion queries + N explainable decoder layers
    (reference: models/emotion_decoder.py:66-162)."""

    def __init__(
        self,
        d_model: int = 768,
        num_emotions: int = 4,
        n_heads: int = 8,
        num_layers: int = 2,
        dim_feedforward: int = 2048,
        dropout: float = 0.1,
        use_output_layer: bool = True,
        seed: int = 0,
    ):
        self.d_model = d_model
        self.num_emotions = num_emotions
        self.n_heads = n_heads
        self.num_layers = num_layers
        self.dim_feedforward = dim_feedforward
        self.dropout_rate = dropout
        self.use_output_layer = use_output_layer
        self.layer = ExplainableDecoderLayer(d_model, n_heads, dim_feedforward, dropout)
        self.seed = seed

    def init(self, key):
        ks = jax.random.split(key, self.num_layers + 2)
        params = {
            "emotion_queries": init.normal(ks[0], (self.num_emotions, self.d_model)),
            "layers": {
                str(i): self.layer.init(ks[1 + i]) for i in range(self.num_layers)
            },
        }
        if self.use_output_layer:
            params["out_proj"] = linear_init(ks[-1], self.d_model, 1)
        return params

    def apply(
        self, params, memory, memory_key_padding_mask=None,
        return_attention: bool = False, train: bool = False, rng=None,
    ):
        b = memory.shape[0]
        queries = jnp.broadcast_to(
            params["emotion_queries"][None], (b, self.num_emotions, self.d_model)
        ).astype(memory.dtype)

        all_layers_attn = []
        out = queries
        for i in range(self.num_layers):
            layer_rng = None if rng is None else jax.random.fold_in(rng, i)
            out, attn_map = self.layer.apply(
                params["layers"][str(i)], out, memory,
                memory_key_padding_mask=memory_key_padding_mask,
                return_attention=return_attention, train=train, rng=layer_rng,
            )
            if return_attention and attn_map is not None:
                all_layers_attn.append(attn_map)  # [B, E, L]

        z = out  # [B, E, d]
        logits = None
        if self.use_output_layer:
            logits = linear_apply(params["out_proj"], z)[..., 0]  # [B, E]

        if return_attention:
            return z, logits, all_layers_attn
        return z, logits

"""Full backbone: cross-modal transformer + vector β-gate + emotion decoder.

Behavioral contract (reference: models/fusion_with_emotion_decoder.py):
  * composes the TACFN :class:`CrossModalTransformer`, the vector
    :class:`BetaGate`, and :class:`EmotionDecoder` with
    ``use_output_layer=True``;
  * 2D inputs are lifted to ``[B, 1, d]``;
  * the fused key-padding mask is the OR of both modality masks aligned
    (pad-with-True / truncate) to the fused length;
  * returns ``(logits, beta, z)`` or, with ``return_attention=True``,
    ``(logits, beta, z, {"encoder": [per-layer dicts], "decoder": [per-layer [B,E,L]]})``.
"""

from __future__ import annotations

import jax

from ..core.masking import build_fused_mask
from ..nn.module import Module
from ._common import RngStream, ensure_3d
from .beta_gate_tacfn import BetaGate
from .cross_modal_block_tacfn import CrossModalTransformer
from .emotion_decoder import EmotionDecoder


class FusionWithEmotionDecoder(Module):
    def __init__(
        self,
        d_model: int = 768,
        num_emotions: int = 4,
        n_heads: int = 8,
        num_layers_fusion: int = 2,
        num_layers_decoder: int = 2,
        beta_hidden: int = 256,
        dropout: float = 0.1,
        seed: int = 0,
    ):
        self.d_model = d_model
        self.num_emotions = num_emotions
        self.cross_modal = CrossModalTransformer(
            num_layers=num_layers_fusion, d_model=d_model, n_heads=n_heads, dropout=dropout
        )
        self.beta_gate = BetaGate(d_model=d_model, hidden_dim=beta_hidden)
        self.emotion_decoder = EmotionDecoder(
            d_model=d_model,
            num_emotions=num_emotions,
            n_heads=n_heads,
            num_layers=num_layers_decoder,
            dropout=dropout,
            use_output_layer=True,
        )
        self.seed = seed

    def init(self, key):
        ks = jax.random.split(key, 3)
        return {
            "cross_modal": self.cross_modal.init(ks[0]),
            "beta_gate": self.beta_gate.init(ks[1]),
            "emotion_decoder": self.emotion_decoder.init(ks[2]),
        }

    def apply(
        self, params, h_a, h_t, mask_a=None, mask_t=None,
        return_attention: bool = False, train: bool = False, rng=None,
    ):
        rs = RngStream(rng)
        h_a = ensure_3d(h_a)
        h_t = ensure_3d(h_t)

        enc = self.cross_modal.apply(
            params["cross_modal"], h_a, h_t, mask_a, mask_t,
            return_attention=return_attention, train=train, rng=rs(),
        )
        if return_attention:
            h_a_tilde, h_t_tilde, encoder_attns = enc
        else:
            h_a_tilde, h_t_tilde = enc
            encoder_attns = None

        h_fusion, beta = self.beta_gate.apply(
            params["beta_gate"], h_a_tilde, h_t_tilde, mask_a, mask_t
        )
        fused_mask = build_fused_mask(mask_a, mask_t, h_fusion.shape[1])

        dec = self.emotion_decoder.apply(
            params["emotion_decoder"], h_fusion,
            memory_key_padding_mask=fused_mask,
            return_attention=return_attention, train=train, rng=rs(),
        )
        if return_attention:
            z, logits, decoder_attns = dec
            return logits, beta, z, {"encoder": encoder_attns, "decoder": decoder_attns}
        z, logits = dec
        return logits, beta, z

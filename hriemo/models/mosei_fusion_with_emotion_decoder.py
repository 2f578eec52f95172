"""MOSEI wrapper: per-modality input projections + the fusion backbone.

Behavioral contract (reference: models/mosei_fusion_with_emotion_decoder.py):
  * ``audio_proj: Linear(d_audio → d_model)`` and
    ``text_proj: Linear(d_text → d_model)`` (MOSEI dims: audio=74 COVAREP,
    text=300 GloVe), then delegates to :class:`FusionWithEmotionDecoder`;
  * defaults: d_model=256, 6 emotions, 4 heads, dropout 0.2,
    beta_hidden=128;
  * same return tuples as the backbone.
"""

from __future__ import annotations

import jax

from ..nn.layers import linear_apply, linear_init
from ..nn.module import Module
from ._common import RngStream
from .fusion_with_emotion_decoder import FusionWithEmotionDecoder


class MoseiFusionWithEmotionDecoder(Module):
    def __init__(
        self,
        d_audio: int,
        d_text: int,
        d_model: int = 256,
        num_emotions: int = 6,
        n_heads: int = 4,
        num_layers_fusion: int = 2,
        num_layers_decoder: int = 2,
        beta_hidden: int = 128,
        dropout: float = 0.2,
        seed: int = 0,
    ):
        self.d_audio = d_audio
        self.d_text = d_text
        self.d_model = d_model
        self.backbone = FusionWithEmotionDecoder(
            d_model=d_model,
            num_emotions=num_emotions,
            n_heads=n_heads,
            num_layers_fusion=num_layers_fusion,
            num_layers_decoder=num_layers_decoder,
            beta_hidden=beta_hidden,
            dropout=dropout,
        )
        self.seed = seed

    def init(self, key):
        ks = jax.random.split(key, 3)
        return {
            "audio_proj": linear_init(ks[0], self.d_audio, self.d_model),
            "text_proj": linear_init(ks[1], self.d_text, self.d_model),
            "backbone": self.backbone.init(ks[2]),
        }

    def apply(
        self, params, h_a, h_t, mask_a=None, mask_t=None,
        return_attention: bool = False, train: bool = False, rng=None,
    ):
        rs = RngStream(rng)
        h_a_proj = linear_apply(params["audio_proj"], h_a)
        h_t_proj = linear_apply(params["text_proj"], h_t)
        return self.backbone.apply(
            params["backbone"], h_a_proj, h_t_proj, mask_a, mask_t,
            return_attention=return_attention, train=train, rng=rs(),
        )

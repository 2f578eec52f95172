"""Compatibility alias: the reference's import path.

Upstream code does ``from models.emotion_decoder import EmotionDecoder, ExplainableDecoderLayer`` — this package
forwards to :mod:`hriemo.models` so reference scripts and tests run
unchanged (torch/numpy inputs are coerced by Module.__call__).
"""

from hriemo.models.emotion_decoder import EmotionDecoder, ExplainableDecoderLayer

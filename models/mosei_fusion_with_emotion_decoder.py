"""Compatibility alias: the reference's import path.

Upstream code does ``from models.mosei_fusion_with_emotion_decoder import MoseiFusionWithEmotionDecoder`` — this package
forwards to :mod:`hriemo.models` so reference scripts and tests run
unchanged (torch/numpy inputs are coerced by Module.__call__).
"""

from hriemo.models.mosei_fusion_with_emotion_decoder import MoseiFusionWithEmotionDecoder

"""Public model zoo.

Mirrors the reference's ``models/`` API surface (same module names, class
names, constructor kwargs, and return tuples — see SURVEY.md §2.1) with a
TPU-native implementation: pure-functional apply under the hood, Pallas
flash attention on the hot path, and torch-compatible parameter names for
checkpoint interchange.
"""

from .cross_modal_block import CrossModalBlock, CrossModalTransformer
from .cross_modal_block_tacfn import (
    CrossModalBlock as TacfnCrossModalBlock,
    CrossModalTransformer as TacfnCrossModalTransformer,
)
from .beta_gate import BetaGate, masked_mean
from .beta_gate_tacfn import BetaGate as VectorBetaGate
from .emotion_decoder import EmotionDecoder, ExplainableDecoderLayer
from .fusion_classifier import FusionClassifier
from .fusion_with_emotion_decoder import FusionWithEmotionDecoder
from .mosei_fusion_with_emotion_decoder import MoseiFusionWithEmotionDecoder

__all__ = [
    "CrossModalBlock",
    "CrossModalTransformer",
    "TacfnCrossModalBlock",
    "TacfnCrossModalTransformer",
    "BetaGate",
    "VectorBetaGate",
    "masked_mean",
    "EmotionDecoder",
    "ExplainableDecoderLayer",
    "FusionClassifier",
    "FusionWithEmotionDecoder",
    "MoseiFusionWithEmotionDecoder",
]

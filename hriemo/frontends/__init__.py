"""On-device feature-extraction frontends (SURVEY.md §7 step 9).

The reference runs HF PyTorch BERT / WavLM on GPU per utterance
(reference: scripts/iemocap_feature_extraction_seq_level/extract_*.py);
here both frontends are native JAX models that compile to XLA, batch
across utterances, and load HF checkpoints by state-dict name. No
pretrained weights ship with this repo — load them with
``BertEncoder.from_torch_state_dict`` / ``WavLMEncoder.from_torch_state_dict``.
"""

from .bert import BertConfig, BertEncoder
from .wavlm import WavLMConfig, WavLMEncoder

__all__ = ["BertConfig", "BertEncoder", "WavLMConfig", "WavLMEncoder"]

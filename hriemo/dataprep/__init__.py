"""L0/L1 data preparation: corpus indexing + on-device feature extraction.

Mirrors the reference's ``scripts/iemocap_feature_extraction_*`` and
``scripts/mosei_feature_extraction_seq_level`` layers (SURVEY.md §2.2)
with TPU-native extraction: the WavLM/BERT frontends run batched under
jit instead of per-utterance PyTorch passes.
"""

"""hriemo — TPU-native multimodal emotion recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the HRI-EMO
reference (adaptive unified multimodal emotion recognition): cross-modal
transformers, vector-wise beta-gated fusion, emotion-query decoders,
feature pipelines, training/inference CLIs, and interpretability export —
designed TPU-first (static shapes, pjit-sharded train steps, Pallas flash
attention for the hot path).

Layout:
    hriemo.core      — masking / numerics primitives shared by everything
    hriemo.nn        — parameterised layers (MHA, Linear, LayerNorm, MLP)
    hriemo.ops       — Pallas TPU kernels (flash cross-attention, fused gate)
    hriemo.models    — the public model zoo (same API surface as the reference)
    hriemo.parallel  — mesh construction + pjit-sharded train/eval steps
    hriemo.data      — feature store, datasets, bucketed batching
    hriemo.train     — training pipelines (CLI)
    hriemo.infer     — inference / evaluation pipelines (CLI)
    hriemo.frontends — on-device BERT / WavLM feature extractors
    hriemo.utils     — checkpointing (orbax + torch bridge), config, metrics
"""

__version__ = "0.1.0"

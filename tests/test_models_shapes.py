"""Shape/smoke tests mirroring the reference's tests/ suite (pytest-ified).

Covers the same scenarios as reference tests/test_cross_modal_block.py,
test_beta_gate.py, test_fusion_classifier.py — utter-level and seq-level
passes with expected output shapes — plus return_attention structure.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hriemo.models import (
    BetaGate,
    CrossModalTransformer,
    EmotionDecoder,
    FusionClassifier,
    FusionWithEmotionDecoder,
    MoseiFusionWithEmotionDecoder,
    TacfnCrossModalTransformer,
    VectorBetaGate,
)


def _rand(*shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape).astype(np.float32))


def test_cross_modal_transformer_utter_level():
    # reference tests/test_cross_modal_block.py: [32,1,768] utter pass
    model = CrossModalTransformer(num_layers=2, d_model=768, n_heads=8)
    h_a, h_t = _rand(4, 1, 768, seed=1), _rand(4, 1, 768, seed=2)
    out_a, out_t = model(h_a, h_t)
    assert out_a.shape == (4, 1, 768) and out_t.shape == (4, 1, 768)


def test_cross_modal_transformer_seq_level_ragged():
    # reference tests/test_cross_modal_block.py: [8,400,768]x[8,128,768]
    model = CrossModalTransformer(num_layers=2, d_model=128, n_heads=8)
    h_a, h_t = _rand(2, 40, 128, seed=3), _rand(2, 16, 128, seed=4)
    mask_a = jnp.zeros((2, 40), bool)
    mask_t = jnp.zeros((2, 16), bool)
    out_a, out_t = model(h_a, h_t, mask_a, mask_t)
    assert out_a.shape == (2, 40, 128) and out_t.shape == (2, 16, 128)


def test_beta_gate_scalar_chain():
    # reference tests/test_beta_gate.py: cross-modal + scalar gate on utter feats
    cm = CrossModalTransformer(num_layers=1, d_model=64, n_heads=4)
    gate = BetaGate(d_model=64, hidden_dim=32)
    h_a, h_t = _rand(8, 1, 64, seed=5), _rand(8, 1, 64, seed=6)
    a, t = cm(h_a, h_t)
    fused, beta = gate(a, t)
    assert fused.shape == (8, 1, 64)
    assert beta.shape == (8, 1)
    assert (np.asarray(beta) >= 0).all() and (np.asarray(beta) <= 1).all()


def test_vector_beta_gate_text_length_alignment():
    gate = VectorBetaGate(d_model=32, hidden_dim=16)
    fused, beta = gate(_rand(2, 9, 32, seed=7), _rand(2, 5, 32, seed=8))
    # ragged lengths -> fusion aligned to TEXT length
    assert fused.shape == (2, 5, 32)
    assert beta.shape == (2, 1)


def test_fusion_classifier_utter_and_seq():
    # reference tests/test_fusion_classifier.py
    model = FusionClassifier(d_model=64, num_classes=4, n_heads=4, num_layers=1, beta_hidden=32)
    logits, beta, pooled = model(_rand(4, 64, seed=9), _rand(4, 64, seed=10))
    assert logits.shape == (4, 4) and beta.shape == (4, 1) and pooled.shape == (4, 64)
    logits, beta, pooled = model(_rand(4, 12, 64, seed=11), _rand(4, 12, 64, seed=12))
    assert logits.shape == (4, 4) and pooled.shape == (4, 64)


def test_emotion_decoder_shapes_and_attention():
    dec = EmotionDecoder(d_model=64, num_emotions=4, n_heads=4, num_layers=2,
                         dim_feedforward=128)
    memory = _rand(3, 10, 64, seed=13)
    mask = jnp.zeros((3, 10), bool).at[:, 7:].set(True)
    z, logits = dec(memory, mask)
    assert z.shape == (3, 4, 64) and logits.shape == (3, 4)
    z, logits, attns = dec(memory, mask, return_attention=True)
    assert len(attns) == 2
    assert attns[0].shape == (3, 4, 10)
    # masked memory positions get zero attention
    assert np.asarray(attns[0])[:, :, 7:].max() == 0.0


def test_fusion_with_emotion_decoder_attention_pack():
    model = FusionWithEmotionDecoder(d_model=64, num_emotions=4, n_heads=4,
                                     num_layers_fusion=2, num_layers_decoder=2,
                                     beta_hidden=32)
    h_a, h_t = _rand(2, 8, 64, seed=14), _rand(2, 6, 64, seed=15)
    mask_a = jnp.zeros((2, 8), bool).at[1, 5:].set(True)
    mask_t = jnp.zeros((2, 6), bool).at[1, 4:].set(True)

    logits, beta, z = model(h_a, h_t, mask_a, mask_t)
    assert logits.shape == (2, 4) and beta.shape == (2, 1) and z.shape == (2, 4, 64)

    logits, beta, z, pack = model(h_a, h_t, mask_a, mask_t, return_attention=True)
    assert set(pack.keys()) == {"encoder", "decoder"}
    assert len(pack["encoder"]) == 2  # per encoder layer
    layer0 = pack["encoder"][0]
    assert set(layer0.keys()) == {"audio_self", "text_self", "audio_queries_text", "text_queries_audio"}
    assert layer0["audio_queries_text"].shape == (2, 8, 6)  # [B, La, Lt]
    assert layer0["text_queries_audio"].shape == (2, 6, 8)
    assert len(pack["decoder"]) == 2
    assert pack["decoder"][0].shape == (2, 4, 6)  # [B, E, L_fused=text]


def test_mosei_wrapper_shapes():
    model = MoseiFusionWithEmotionDecoder(d_audio=74, d_text=300, d_model=64,
                                          num_emotions=6, n_heads=4,
                                          num_layers_fusion=1, num_layers_decoder=1,
                                          beta_hidden=32)
    h_a, h_t = _rand(2, 20, 74, seed=16), _rand(2, 12, 300, seed=17)
    mask_a = jnp.zeros((2, 20), bool)
    mask_t = jnp.zeros((2, 12), bool)
    logits, beta, z = model(h_a, h_t, mask_a, mask_t)
    assert logits.shape == (2, 6) and beta.shape == (2, 1) and z.shape == (2, 6, 64)


def test_full_model_jits_and_trains():
    """Whole flagship forward is one jittable graph with finite grads."""
    model = MoseiFusionWithEmotionDecoder(d_audio=16, d_text=24, d_model=32,
                                          num_emotions=6, n_heads=4,
                                          num_layers_fusion=1, num_layers_decoder=1,
                                          beta_hidden=16, dropout=0.1)
    params = model.init(jax.random.key(0))
    h_a, h_t = _rand(2, 10, 16, seed=18), _rand(2, 8, 24, seed=19)
    mask_a = jnp.zeros((2, 10), bool)
    mask_t = jnp.zeros((2, 8), bool)
    y = jnp.asarray(np.random.default_rng(20).uniform(size=(2, 6)).astype(np.float32))

    @jax.jit
    def loss_fn(p, rng):
        logits, beta, _ = model.apply(p, h_a, h_t, mask_a, mask_t, train=True, rng=rng)
        bce = jnp.mean(
            jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        return bce

    g = jax.grad(loss_fn)(params, jax.random.key(1))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # dropout must actually differ across rng keys in train mode
    l1 = loss_fn(params, jax.random.key(1))
    l2 = loss_fn(params, jax.random.key(2))
    assert not np.isclose(float(l1), float(l2))

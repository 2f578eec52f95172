"""Numeric parity of every hriemo model vs its torch oracle (eval mode).

Gate: ≤1e-4 logit divergence on fixed batches for every model class, with
torch state dicts imported by name (this doubles as the checkpoint-bridge
round-trip test — names must match exactly).
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

import tests.torch_oracle as oracle
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

ATOL = 1e-4


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _masks(b, la, lt, seed=0):
    rng = np.random.default_rng(seed)
    ma = np.zeros((b, la), bool)
    mt = np.zeros((b, lt), bool)
    for i in range(b):
        ma[i, rng.integers(1, la + 1):] = True
        mt[i, rng.integers(1, lt + 1):] = True
    return ma, mt


def _bridge(tmodel, jmodel):
    tmodel.eval()
    jmodel.load_state_dict(dict(tmodel.state_dict()))
    return jmodel


def test_legacy_cross_modal_parity():
    torch.manual_seed(0)
    t = oracle.OracleStack(oracle.OracleLegacyBlock, 2, 64, 4, 0.1)
    j = _bridge(t, CrossModalTransformer(num_layers=2, d_model=64, n_heads=4, dropout=0.1))
    h_a, h_t = _rand(2, 7, 64, seed=1), _rand(2, 5, 64, seed=2)
    ma, mt = _masks(2, 7, 5, seed=3)
    with torch.no_grad():
        ta, tt = t(torch.tensor(h_a), torch.tensor(h_t), torch.tensor(ma), torch.tensor(mt))
    ja, jt = j(jnp.asarray(h_a), jnp.asarray(h_t), jnp.asarray(ma), jnp.asarray(mt))
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jt), tt.numpy(), atol=ATOL)


def test_tacfn_cross_modal_parity_with_attention():
    torch.manual_seed(1)
    t = oracle.OracleStack(oracle.OracleTacfnBlock, 2, 64, 4, 0.1)
    j = _bridge(t, TacfnCrossModalTransformer(num_layers=2, d_model=64, n_heads=4, dropout=0.1))
    h_a, h_t = _rand(2, 9, 64, seed=4), _rand(2, 6, 64, seed=5)
    ma, mt = _masks(2, 9, 6, seed=6)
    with torch.no_grad():
        ta, tt, tattn = t(torch.tensor(h_a), torch.tensor(h_t), torch.tensor(ma),
                          torch.tensor(mt), return_attention=True)
    ja, jt, jattn = j(jnp.asarray(h_a), jnp.asarray(h_t), jnp.asarray(ma),
                      jnp.asarray(mt), return_attention=True)
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jt), tt.numpy(), atol=ATOL)
    for tl, jl in zip(tattn, jattn):
        for key in ("audio_self", "text_self", "audio_queries_text", "text_queries_audio"):
            np.testing.assert_allclose(np.asarray(jl[key]), tl[key].numpy(), atol=ATOL,
                                       err_msg=key)


@pytest.mark.parametrize("la,lt", [(5, 5), (9, 5)])
def test_scalar_beta_gate_parity(la, lt):
    torch.manual_seed(2)
    t = oracle.OracleScalarGate(48, 32)
    j = _bridge(t, BetaGate(d_model=48, hidden_dim=32))
    h_a, h_t = _rand(3, la, 48, seed=7), _rand(3, lt, 48, seed=8)
    ma, mt = _masks(3, la, lt, seed=9)
    with torch.no_grad():
        tf, tb = t(torch.tensor(h_a), torch.tensor(h_t), torch.tensor(ma), torch.tensor(mt))
    jf, jb = j(jnp.asarray(h_a), jnp.asarray(h_t), jnp.asarray(ma), jnp.asarray(mt))
    np.testing.assert_allclose(np.asarray(jf), tf.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jb), tb.numpy(), atol=ATOL)


@pytest.mark.parametrize("la,lt", [(6, 6), (10, 4)])
def test_vector_beta_gate_parity(la, lt):
    torch.manual_seed(3)
    t = oracle.OracleVectorGate(48, 32)
    j = _bridge(t, VectorBetaGate(d_model=48, hidden_dim=32))
    h_a, h_t = _rand(3, la, 48, seed=10), _rand(3, lt, 48, seed=11)
    ma, mt = _masks(3, la, lt, seed=12)
    with torch.no_grad():
        tf, tb = t(torch.tensor(h_a), torch.tensor(h_t), torch.tensor(ma), torch.tensor(mt))
    jf, jb = j(jnp.asarray(h_a), jnp.asarray(h_t), jnp.asarray(ma), jnp.asarray(mt))
    np.testing.assert_allclose(np.asarray(jf), tf.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jb), tb.numpy(), atol=ATOL)


def test_emotion_decoder_parity():
    torch.manual_seed(4)
    t = oracle.OracleEmotionDecoder(64, 4, 4, 2, ff=128, p=0.1)
    j = _bridge(t, EmotionDecoder(d_model=64, num_emotions=4, n_heads=4, num_layers=2,
                                  dim_feedforward=128, dropout=0.1))
    mem = _rand(3, 11, 64, seed=13)
    mask = np.zeros((3, 11), bool)
    mask[0, 8:] = True
    with torch.no_grad():
        tz, tl, tattn = t(torch.tensor(mem), torch.tensor(mask), return_attention=True)
    jz, jl, jattn = j(jnp.asarray(mem), jnp.asarray(mask), return_attention=True)
    np.testing.assert_allclose(np.asarray(jz), tz.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jl), tl.numpy(), atol=ATOL)
    for ta, ja in zip(tattn, jattn):
        np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=ATOL)


@pytest.mark.parametrize("utter", [False, True])
def test_fusion_classifier_parity(utter):
    torch.manual_seed(5)
    t = oracle.OracleFusionClassifier(64, 4, 4, 2, 32, 0.2)
    j = _bridge(t, FusionClassifier(d_model=64, num_classes=4, n_heads=4, num_layers=2,
                                    beta_hidden=32, dropout=0.2))
    if utter:
        h_a, h_t = _rand(4, 64, seed=14), _rand(4, 64, seed=15)
        args_t = (torch.tensor(h_a), torch.tensor(h_t))
        args_j = (jnp.asarray(h_a), jnp.asarray(h_t))
    else:
        h_a, h_t = _rand(4, 8, 64, seed=16), _rand(4, 6, 64, seed=17)
        ma, mt = _masks(4, 8, 6, seed=18)
        args_t = (torch.tensor(h_a), torch.tensor(h_t), torch.tensor(ma), torch.tensor(mt))
        args_j = (jnp.asarray(h_a), jnp.asarray(h_t), jnp.asarray(ma), jnp.asarray(mt))
    with torch.no_grad():
        tl, tb, tp = t(*args_t)
    jl, jb, jp = j(*args_j)
    np.testing.assert_allclose(np.asarray(jl), tl.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jb), tb.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jp), tp.numpy(), atol=ATOL)


def test_fusion_with_emotion_decoder_parity():
    torch.manual_seed(6)
    t = oracle.OracleFusionWithEmotionDecoder(64, 4, 4, 2, 2, 32, 0.1)
    j = _bridge(t, FusionWithEmotionDecoder(d_model=64, num_emotions=4, n_heads=4,
                                            num_layers_fusion=2, num_layers_decoder=2,
                                            beta_hidden=32, dropout=0.1))
    h_a, h_t = _rand(2, 9, 64, seed=19), _rand(2, 6, 64, seed=20)
    ma, mt = _masks(2, 9, 6, seed=21)
    with torch.no_grad():
        tl, tb, tz, tpack = t(torch.tensor(h_a), torch.tensor(h_t), torch.tensor(ma),
                              torch.tensor(mt), return_attention=True)
    jl, jb, jz, jpack = j(jnp.asarray(h_a), jnp.asarray(h_t), jnp.asarray(ma),
                          jnp.asarray(mt), return_attention=True)
    np.testing.assert_allclose(np.asarray(jl), tl.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jb), tb.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jz), tz.numpy(), atol=ATOL)
    for td, jd in zip(tpack["decoder"], jpack["decoder"]):
        np.testing.assert_allclose(np.asarray(jd), td.numpy(), atol=ATOL)


def test_mosei_flagship_parity():
    torch.manual_seed(7)
    t = oracle.OracleMosei(74, 300, d=64, num_emotions=6, h=4, n_fusion=2, n_decoder=2,
                           beta_hidden=32, p=0.2)
    j = _bridge(t, MoseiFusionWithEmotionDecoder(d_audio=74, d_text=300, d_model=64,
                                                 num_emotions=6, n_heads=4,
                                                 num_layers_fusion=2, num_layers_decoder=2,
                                                 beta_hidden=32, dropout=0.2))
    h_a, h_t = _rand(3, 30, 74, seed=22), _rand(3, 12, 300, seed=23)
    ma, mt = _masks(3, 30, 12, seed=24)
    with torch.no_grad():
        tl, tb, tz = t(torch.tensor(h_a), torch.tensor(h_t), torch.tensor(ma), torch.tensor(mt))
    jl, jb, jz = j(jnp.asarray(h_a), jnp.asarray(h_t), jnp.asarray(ma), jnp.asarray(mt))
    np.testing.assert_allclose(np.asarray(jl), tl.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jb), tb.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jz), tz.numpy(), atol=ATOL)

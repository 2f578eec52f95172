"""Fused conv-stack kernel vs the XLA feature-encoder route (interpret).

Checks exact-semantics equivalence (same dtypes, fp32 accumulation) on
base-plus-shaped weights at several waveform lengths, including lengths
that exercise the tile tail and the stats-pass extra tile.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hriemo.frontends import WavLMConfig, WavLMEncoder
from hriemo.ops.conv_stack import conv_stack_fused, use_conv_stack

# base-plus conv pattern at a narrow width to keep interpret mode fast
CFG = dataclasses.replace(
    WavLMConfig.base_plus(), conv_dim=(128,) * 7, fast_gelu=True)
ENC = WavLMEncoder(dataclasses.replace(CFG, hidden_size=128,
                                       num_hidden_layers=1,
                                       num_attention_heads=2))


def _xla_route(params, wave):
    import jax.nn

    from hriemo.frontends.wavlm import conv1d, group_norm_per_channel

    x = wave[:, None, :]
    for i in range(7):
        lp = params["conv_layers"][str(i)]
        x = conv1d(x, lp["conv"]["weight"], None, stride=CFG.conv_stride[i])
        if i == 0:
            x = group_norm_per_channel(lp["layer_norm"], x, CFG.layer_norm_eps)
        x = jax.nn.gelu(x, approximate=True)
    return x.transpose(0, 2, 1)


@pytest.fixture(scope="module")
def fe_params():
    p = ENC.params["feature_extractor"]
    return jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), p)


@pytest.mark.parametrize("tw", [
    16000,          # 1.0 s -> 49 frames, 2 tiles
    40000,          # 2.5 s -> 124 frames, 4 tiles (the product bucket)
    10240 + 400,    # frame count hits the tile boundary exactly
])
def test_matches_xla_route(fe_params, tw):
    rng = np.random.default_rng(tw)
    wave = jnp.asarray(rng.standard_normal((2, tw)).astype(np.float32) * 0.3)
    ref = _xla_route(fe_params, wave)
    got = conv_stack_fused(fe_params, wave, CFG)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


def test_bf16_close_to_fp32(fe_params):
    """bf16 serving inputs stay within the serving numerics envelope."""
    rng = np.random.default_rng(7)
    wave = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.3)
    p16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), fe_params)
    ref = _xla_route(fe_params, wave)
    got = conv_stack_fused(p16, wave.astype(jnp.bfloat16), CFG)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=0.15, rtol=0.15)


def test_router():
    assert not use_conv_stack(WavLMConfig.tiny(),
                              {"conv_layers": {"0": {"layer_norm": {}}}})
    # (TPU-only routing: on CPU the router must always decline)
    assert not use_conv_stack(CFG, {"conv_layers": {"0": {"layer_norm": {}}}})


def test_gram_stats_match_direct_gn(fe_params):
    """Gram-matrix GN stats == stats of the actual conv0 output."""
    from hriemo.frontends.wavlm import conv1d
    from hriemo.ops.conv_stack import group_norm_stats_from_waveform

    rng = np.random.default_rng(3)
    wave = jnp.asarray(rng.standard_normal((3, 12345)).astype(np.float32) * 0.4)
    w0 = fe_params["conv_layers"]["0"]["conv"]["weight"]
    mean, var = group_norm_stats_from_waveform(wave, w0)
    x0 = conv1d(wave[:, None, :], w0, None, stride=5)      # [B, C, T']
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x0.mean(axis=-1)),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(x0.var(axis=-1)),
                               atol=1e-5, rtol=1e-4)

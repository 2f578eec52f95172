"""Fused FFN-block kernel numerics (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hriemo.ops.fused_ffn import (
    _xla_reference,
    ffn_block_bf16,
    ffn_block_int8,
    quantize_ffn_params,
    use_fused_ffn,
)

D, F, M = 128, 256, 48


@pytest.fixture(scope="module")
def ffn():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.standard_normal((F, D)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal((F,)).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.standard_normal((D, F)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.02)
    g = jnp.asarray(1.0 + rng.standard_normal((D,)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    return x, w1, b1, w2, b2, g, b


@pytest.mark.parametrize("fast_gelu", [True, False])
def test_bf16_kernel_matches_reference(ffn, fast_gelu):
    x, w1, b1, w2, b2, g, b = ffn
    ref = _xla_reference(x, w1, b1, w2, b2, g, b, 1e-5, fast_gelu)
    got = ffn_block_bf16(x, w1, b1, w2, b2, g, b, 1e-5, fast_gelu, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_bf16_kernel_pads_ragged_rows(ffn):
    x, w1, b1, w2, b2, g, b = ffn
    x41 = x[:41]  # not a multiple of block_m=16
    ref = _xla_reference(x41, w1, b1, w2, b2, g, b, 1e-5, True)
    got = ffn_block_bf16(x41, w1, b1, w2, b2, g, b, 1e-5, True, 16)
    assert got.shape == (41, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_int8_kernel_close_to_reference(ffn):
    x, w1, b1, w2, b2, g, b = ffn
    ref = _xla_reference(x, w1, b1, w2, b2, g, b, 1e-5, True)
    qp = quantize_ffn_params(w1, b1, w2, b2)
    got = ffn_block_int8(x, qp, g, b, 1e-5, True, 16)
    rms = float(jnp.sqrt(jnp.mean(jnp.asarray(ref, jnp.float32) ** 2)))
    rel = float(jnp.sqrt(jnp.mean((np.asarray(got, np.float32) - np.asarray(ref)) ** 2))) / rms
    # LN at the block output renormalises, so W8A8 error stays ~1-2% rel RMS
    assert rel < 0.03, rel


def test_bf16_kernel_has_gradient(ffn):
    x, w1, b1, w2, b2, g, b = ffn

    def loss(x, w1):
        return jnp.sum(ffn_block_bf16(x, w1, b1, w2, b2, g, b, 1e-5, True, 16) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w1)
    # vjp recomputes through the XLA reference — compare against it directly
    def loss_ref(x, w1):
        return jnp.sum(_xla_reference(x, w1, b1, w2, b2, g, b, 1e-5, True) ** 2)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w1)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=1e-3)


def test_use_fused_ffn_budget():
    assert not use_fused_ffn(768, 3072) or jax.default_backend() == "tpu"
    # 4096x16384 int8 weights = 128 MB >> VMEM: never legal
    assert use_fused_ffn(4096, 16384) is False

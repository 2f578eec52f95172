"""Fused WavLM gated-bias attention kernel vs XLA reference (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hriemo.ops.wavlm_attention import _fused_impl, _xla_reference, wavlm_fused_attention


def _inputs(b=2, h=4, l=140, hd=32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    q, k, v = mk(b, h, l, hd), mk(b, h, l, hd), mk(b, h, l, hd)
    gate = jnp.asarray(rng.uniform(0.5, 2.0, size=(b, h, l)).astype(np.float32))
    pos = mk(h, l, l) * 0.1
    kpb = np.zeros((b, l), np.float32)
    kpb[1, 100:] = -1e9
    return q, k, v, gate, pos, jnp.asarray(kpb)


def test_fused_matches_reference():
    args = _inputs()
    np.testing.assert_allclose(
        np.asarray(_fused_impl(*args)), np.asarray(_xla_reference(*args)), atol=2e-5
    )


def test_fused_unaligned_length():
    args = _inputs(l=130)
    np.testing.assert_allclose(
        np.asarray(_fused_impl(*args)), np.asarray(_xla_reference(*args)), atol=2e-5
    )


def test_fused_grads():
    q, k, v, gate, pos, kpb = _inputs(l=128)
    for argnum, name in [(0, "q"), (3, "gate"), (4, "pos")]:
        g1 = jax.grad(lambda *a: jnp.sum(wavlm_fused_attention(*a) ** 2), argnum)(
            q, k, v, gate, pos, kpb)
        g2 = jax.grad(lambda *a: jnp.sum(_xla_reference(*a) ** 2), argnum)(
            q, k, v, gate, pos, kpb)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4,
                                   err_msg=name)


def test_fully_masked_keys_finite():
    q, k, v, gate, pos, _ = _inputs(l=128)
    kpb = jnp.full((2, 128), -1e9, jnp.float32)
    out = _fused_impl(q, k, v, gate, pos, kpb)
    assert np.isfinite(np.asarray(out)).all()

"""Ring attention (sequence parallel) vs dense attention on the CPU mesh."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hriemo.core.masking import NEG_INF
from hriemo.parallel import make_mesh
from hriemo.parallel.sequence_parallel import sp_self_attention


def _dense(q, k, v, mask):
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32)
    s = s + jnp.where(mask, NEG_INF, 0.0)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_ring_matches_dense(n_shards):
    mesh = make_mesh(n_data=8 // n_shards, n_model=n_shards)
    rng = np.random.default_rng(0)
    b, h, l, hd = 2, 4, 8 * n_shards, 16
    q = jnp.asarray(rng.standard_normal((b, h, l, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, l, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, l, hd)).astype(np.float32))
    mask = np.zeros((b, l), bool)
    mask[0, l - 3:] = True
    mask = jnp.asarray(mask)

    ring = sp_self_attention(mesh)
    out = ring(q, k, v, mask)
    ref = _dense(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_under_jit_and_grad():
    mesh = make_mesh(n_data=2, n_model=4)
    rng = np.random.default_rng(1)
    b, h, l, hd = 2, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((b, h, l, hd)).astype(np.float32))
    mask = jnp.zeros((b, l), bool)
    ring = sp_self_attention(mesh)

    out = jax.jit(ring)(q, q, q, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_dense(q, q, q, mask)),
                               atol=2e-5)

    g_ring = jax.grad(lambda q: jnp.sum(ring(q, q, q, mask) ** 2))(q)
    g_ref = jax.grad(lambda q: jnp.sum(_dense(q, q, q, mask) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref), atol=1e-4)

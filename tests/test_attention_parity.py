"""Bit-level parity of hriemo MHA vs torch.nn.MultiheadAttention.

The whole reference model zoo is built on torch MHA; this test pins the
projection layout, masking, scaling, and head-averaged weight export
before anything is built on top (SURVEY.md §7 step 2).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from hriemo.nn import MultiheadAttention

ATOL = 2e-5


def _make_pair(d_model=64, n_heads=4, seed=0):
    torch.manual_seed(seed)
    tmha = torch.nn.MultiheadAttention(d_model, n_heads, dropout=0.0, batch_first=True)
    tmha.eval()
    jmha = MultiheadAttention(d_model, n_heads, dropout=0.0)
    jmha.load_state_dict({k: v for k, v in tmha.state_dict().items()})
    return tmha, jmha


def _rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("lq,lk", [(1, 1), (7, 13), (16, 16)])
def test_output_parity_no_mask(lq, lk):
    tmha, jmha = _make_pair()
    q, k, v = _rand(2, lq, 64, seed=1), _rand(2, lk, 64, seed=2), _rand(2, lk, 64, seed=3)
    with torch.no_grad():
        t_out, t_w = tmha(torch.tensor(q), torch.tensor(k), torch.tensor(v), need_weights=True)
    j_out, j_w = jmha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), need_weights=True)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_w), t_w.numpy(), atol=ATOL)
    assert j_w.shape == (2, lq, lk)  # head-averaged export


def test_output_parity_key_padding_mask():
    tmha, jmha = _make_pair(seed=7)
    q, k, v = _rand(3, 5, 64, seed=4), _rand(3, 9, 64, seed=5), _rand(3, 9, 64, seed=5)
    mask = np.zeros((3, 9), dtype=bool)
    mask[0, 6:] = True
    mask[1, 2:] = True
    with torch.no_grad():
        t_out, t_w = tmha(
            torch.tensor(q), torch.tensor(k), torch.tensor(v),
            key_padding_mask=torch.tensor(mask), need_weights=True,
        )
    j_out, j_w = jmha(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        key_padding_mask=jnp.asarray(mask), need_weights=True,
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_w), t_w.numpy(), atol=ATOL)
    # masked keys get exactly zero probability
    assert np.asarray(j_w)[0, :, 6:].max() == 0.0


def test_self_attention_parity():
    tmha, jmha = _make_pair(seed=11)
    x = _rand(2, 10, 64, seed=8)
    with torch.no_grad():
        t_out, _ = tmha(torch.tensor(x), torch.tensor(x), torch.tensor(x), need_weights=False)
    j_out, j_w = jmha(jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))
    assert j_w is None
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=ATOL)


def test_weights_rows_sum_to_one_under_mask():
    _, jmha = _make_pair(seed=3)
    x = _rand(2, 6, 64, seed=9)
    mask = np.zeros((2, 6), dtype=bool)
    mask[:, 4:] = True
    _, w = jmha(
        jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
        key_padding_mask=jnp.asarray(mask), need_weights=True,
    )
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)


def test_grad_flows():
    jmha = MultiheadAttention(32, 4)
    params = jmha.init(jax.random.key(0))
    x = jnp.asarray(_rand(2, 5, 32, seed=10))

    def loss(p):
        out, _ = jmha.apply(p, x, x, x)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)

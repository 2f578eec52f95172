import numpy as np
import jax.numpy as jnp

from hriemo.core import (
    masked_mean,
    align_mask_to_length,
    build_fused_mask,
    invert_valid_mask,
)


def test_masked_mean_no_mask():
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    out = masked_mean(x, None)
    np.testing.assert_allclose(out, np.asarray(x).mean(axis=1), rtol=1e-6)


def test_masked_mean_golden():
    # hand-computed: batch 0 keeps rows 0,1; batch 1 keeps row 0 only.
    x = np.zeros((2, 3, 2), np.float32)
    x[0] = [[1, 2], [3, 4], [100, 100]]
    x[1] = [[5, 6], [100, 100], [100, 100]]
    mask = np.array([[False, False, True], [False, True, True]])
    out = np.asarray(masked_mean(jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(out, [[2.0, 3.0], [5.0, 6.0]], rtol=1e-6)


def test_masked_mean_fully_padded_row_is_finite():
    # clamp(min=1) denominator guard: fully-padded row -> zeros, not NaN.
    x = jnp.ones((1, 3, 2))
    mask = jnp.ones((1, 3), dtype=bool)
    out = np.asarray(masked_mean(x, mask))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, 0.0)


def test_invert_valid_mask():
    am = jnp.asarray([[1, 1, 0], [1, 0, 0]])
    m = invert_valid_mask(am)
    assert m.dtype == bool
    np.testing.assert_array_equal(
        np.asarray(m), [[False, False, True], [False, True, True]]
    )


def test_align_mask_truncate_and_pad():
    m = jnp.asarray([[False, False, True, True]])
    np.testing.assert_array_equal(
        np.asarray(align_mask_to_length(m, 2)), [[False, False]]
    )
    # pad with True (=PAD) when shorter
    np.testing.assert_array_equal(
        np.asarray(align_mask_to_length(m, 6)),
        [[False, False, True, True, True, True]],
    )


def test_build_fused_mask_or_rule():
    ma = jnp.asarray([[False, True, False]])
    mt = jnp.asarray([[False, False, True]])
    fused = build_fused_mask(ma, mt, 3)
    np.testing.assert_array_equal(np.asarray(fused), [[False, True, True]])
    assert build_fused_mask(None, None, 3) is None
    np.testing.assert_array_equal(np.asarray(build_fused_mask(ma, None, 3)), np.asarray(ma))
    # different source lengths: audio mask longer -> truncated; text shorter -> padded
    ma4 = jnp.asarray([[False, False, True, True]])
    mt2 = jnp.asarray([[False, True]])
    fused = build_fused_mask(ma4, mt2, 3)
    np.testing.assert_array_equal(np.asarray(fused), [[False, True, True]])

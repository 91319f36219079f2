"""SS2D v0 scan variant, PatchMerging2D, and LPIPS structure tests."""

import jax
import jax.numpy as jnp
import numpy as np

from founddiff_tpu.models.lpips import LPIPS
from founddiff_tpu.models.ss2d import SS2D, PatchMerging2D
from founddiff_tpu.ops.selective_scan import cross_merge_v0, cross_scan_v0


def test_cross_scan_v0_directions():
    """Direction order matches reference src/emamba2.py:605-606:
    [rows, cols, reversed rows, reversed cols]."""
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    xs = cross_scan_v0(x)
    grid = np.arange(16).reshape(4, 4)
    np.testing.assert_array_equal(xs[0, 0, :, 0], grid.reshape(-1))
    np.testing.assert_array_equal(xs[0, 1, :, 0], grid.T.reshape(-1))
    np.testing.assert_array_equal(xs[0, 2, :, 0], grid.reshape(-1)[::-1])
    np.testing.assert_array_equal(xs[0, 3, :, 0], grid.T.reshape(-1)[::-1])


def test_cross_merge_v0_accumulates():
    """Merging the scan of a constant map sums the 4 directions
    (reference sums out_y + inv_y + wh_y + invwh_y, src/emamba2.py:625-630)."""
    x = jnp.ones((2, 4, 6, 3))
    xs = cross_scan_v0(x)
    y = cross_merge_v0(xs, 4, 6)
    np.testing.assert_allclose(np.asarray(y), 4.0)


def test_ss2d_v0_forward():
    m = SS2D(d_model=16, d_state=4, forward_type="v0", scan_impl="ref")
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 16), jnp.float32)
    c = jnp.zeros((1, 1, 256))
    p = m.init(jax.random.PRNGKey(0), x, c)
    y = m.apply(p, x, c)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


def test_patch_merging():
    m = PatchMerging2D(dim=8)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 7, 9, 8), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (1, 4, 5, 16)


def test_lpips_structure():
    m = LPIPS()
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, 64, 64, 3) * 2 - 1, jnp.float32)
    b = jnp.clip(a + 0.2 * jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32), -1, 1)
    p = m.init(jax.random.PRNGKey(0), a, b)
    d_same = m.apply(p, a, a)
    d_diff = m.apply(p, a, b)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    assert float(jnp.abs(d_diff[0])) > 0

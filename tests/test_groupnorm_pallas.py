"""Fused GroupNorm+SiLU(+residual) kernel vs the flax/XLA composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from founddiff_tpu.ops.groupnorm_pallas import group_norm_silu


def _ref(x, scale, bias, residual=None, scale_shift=None, groups=8, eps=1e-5):
    y = nn.GroupNorm(num_groups=groups, epsilon=eps).apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )
    if scale_shift is not None:
        ms, mt = scale_shift
        y = y * (ms + 1.0) + mt
    y = nn.silu(y)
    if residual is not None:
        y = y + residual
    return y


@pytest.mark.parametrize("with_res", [False, True])
def test_matches_flax_groupnorm(with_res):
    rng = np.random.RandomState(0)
    B, H, W, C, G = 2, 12, 10, 16, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    scale = jnp.asarray(1 + 0.1 * rng.randn(C).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    res = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)) if with_res else None
    got = group_norm_silu(x, scale, bias, residual=res, groups=G)
    want = _ref(x, scale, bias, residual=res, groups=G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_scale_shift_modulation():
    rng = np.random.RandomState(1)
    B, H, W, C, G = 2, 8, 8, 16, 4
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    scale = jnp.asarray(1 + 0.1 * rng.randn(C).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    ms = jnp.asarray(0.2 * rng.randn(B, 1, 1, C).astype(np.float32))
    mt = jnp.asarray(0.2 * rng.randn(B, 1, 1, C).astype(np.float32))
    got = group_norm_silu(x, scale, bias, scale_shift=(ms, mt), groups=G)
    want = _ref(x, scale, bias, scale_shift=(ms, mt), groups=G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bf16_io():
    rng = np.random.RandomState(2)
    B, H, W, C = 1, 16, 16, 8
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    got = group_norm_silu(x, scale, bias, groups=4)
    assert got.dtype == jnp.bfloat16
    want = _ref(x.astype(jnp.float32), scale, bias, groups=4)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_gradients_match_xla():
    rng = np.random.RandomState(3)
    B, H, W, C, G = 2, 6, 6, 8, 4
    x = rng.randn(B, H, W, C).astype(np.float32)
    scale = (1 + 0.1 * rng.randn(C)).astype(np.float32)
    bias = (0.1 * rng.randn(C)).astype(np.float32)
    res = rng.randn(B, H, W, C).astype(np.float32)

    def f_fused(x_, s_, b_, r_):
        return jnp.sum(group_norm_silu(x_, s_, b_, residual=r_, groups=G) ** 2)

    def f_ref(x_, s_, b_, r_):
        return jnp.sum(_ref(x_, s_, b_, residual=r_, groups=G) ** 2)

    args = tuple(map(jnp.asarray, (x, scale, bias, res)))
    g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_odd_rows_padding():
    """R not divisible by the row block must not corrupt the statistics."""
    rng = np.random.RandomState(4)
    B, H, W, C = 1, 7, 9, 8  # R = 63
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    got = group_norm_silu(x, scale, bias, groups=4)
    want = _ref(x, scale, bias, groups=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

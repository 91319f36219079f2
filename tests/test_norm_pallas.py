"""Fused LayerNorm kernel vs flax nn.LayerNorm."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from founddiff_tpu.ops.norm_pallas import layer_norm


@pytest.mark.parametrize("shape", [(2, 8, 8, 64), (1, 300, 128)])
def test_layer_norm_matches_flax(shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape) * 3 + 1, jnp.float32)
    scale = jnp.asarray(rng.rand(shape[-1]) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(shape[-1]), jnp.float32)

    got = layer_norm(x, scale, bias, eps=1e-5)
    ln = nn.LayerNorm(epsilon=1e-5)
    want = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_layer_norm_no_affine():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 32), jnp.float32)
    got = layer_norm(x, None, None, eps=1e-6)
    want = nn.LayerNorm(epsilon=1e-6, use_scale=False, use_bias=False).apply({}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_layer_norm_grads_match():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(16, 64), jnp.float32)
    scale = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(64), jnp.float32)

    def f_fused(x, s, b):
        return jnp.sum(layer_norm(x, s, b) ** 2)

    def f_flax(x, s, b):
        return jnp.sum(
            nn.LayerNorm(epsilon=1e-5).apply({"params": {"scale": s, "bias": b}}, x)
            ** 2
        )

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(f_flax, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_layer_norm_bf16():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 128), jnp.bfloat16)
    got = layer_norm(x, jnp.ones(128), jnp.zeros(128))
    assert got.dtype == jnp.bfloat16
    want = nn.LayerNorm(epsilon=1e-5).apply(
        {"params": {"scale": jnp.ones(128), "bias": jnp.zeros(128)}},
        x.astype(jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.05
    )

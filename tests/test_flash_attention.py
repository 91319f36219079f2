"""Flash attention vs reference softmax attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from founddiff_tpu.ops.attention_pallas import flash_attention


def ref_attention(q, k, v, scale):
    s = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", a, v)


@pytest.mark.parametrize("lq,lk", [(64, 64), (100, 60), (256, 256)])
def test_flash_matches_reference(lq, lk):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 2, lq, 32), jnp.float32)
    k = jnp.asarray(rng.randn(2, 2, lk, 32), jnp.float32)
    v = jnp.asarray(rng.randn(2, 2, lk, 32), jnp.float32)
    scale = 32**-0.5
    got = flash_attention(q, k, v, scale, blk_q=32, blk_k=32)
    want = ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_flash_numerical_stability():
    """Large logits must not overflow (online softmax)."""
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 1, 64, 16) * 30, jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, 64, 16) * 30, jnp.float32)
    v = jnp.asarray(rng.randn(1, 1, 64, 16), jnp.float32)
    got = flash_attention(q, k, v, 1.0, blk_q=16, blk_k=16)
    want = ref_attention(q, k, v, 1.0)
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)


def test_flash_bf16():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 2, 128, 32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 2, 128, 32), jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 2, 128, 32), jnp.bfloat16)
    got = flash_attention(q, k, v)
    assert got.dtype == jnp.bfloat16
    want = ref_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        32**-0.5,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_flash_backward_pallas_matches_xla():
    """The Pallas dq/dk/dv kernels vs autodiff through XLA attention
    (VERDICT weak #5: backward used to remat the full L x L)."""
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, 2, 96, 32), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 72, 32), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 72, 32), jnp.float32)
    scale = 32**-0.5

    def loss_flash(q, k, v):
        return jnp.sum(jnp.tanh(flash_attention(q, k, v, scale,
                                                blk_q=32, blk_k=32)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.tanh(ref_attention(q, k, v, scale)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

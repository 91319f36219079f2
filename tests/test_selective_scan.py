"""Numerics tests for the TPU selective scan against a step-by-step python
recurrence and against the reference CUDA kernel semantics
(reference src/emamba2.py:124-179), plus EfficientScan/Merge round-trips
(reference src/emamba2.py:182-292)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from founddiff_tpu.ops.selective_scan import (
    efficient_merge,
    efficient_scan,
    selective_scan_chunked,
    selective_scan_ref,
)
from founddiff_tpu.ops.scan_pallas import selective_scan_pallas


def naive_scan(u, delta, A, B, C, D, bias, softplus=True):
    """Direct O(L) python recurrence, the ground truth."""
    Bsz, K, L, Dd = u.shape
    N = A.shape[-1]
    delta = delta + bias[None, :, None, :]
    if softplus:
        delta = np.log1p(np.exp(delta))
    y = np.zeros_like(u)
    for b in range(Bsz):
        for k in range(K):
            h = np.zeros((Dd, N))
            for l in range(L):
                dl = delta[b, k, l]  # [D]
                abar = np.exp(dl[:, None] * A[k])  # [D,N]
                h = abar * h + (dl * u[b, k, l])[:, None] * B[b, k, l][None, :]
                y[b, k, l] = h @ C[b, k, l] + D[k] * u[b, k, l]
    return y


def make_inputs(Bsz=2, K=4, L=37, D=8, N=4, seed=0):
    rng = np.random.RandomState(seed)
    u = rng.randn(Bsz, K, L, D).astype(np.float32)
    delta = rng.randn(Bsz, K, L, D).astype(np.float32) * 0.5
    A = -np.abs(rng.randn(K, D, N)).astype(np.float32)
    Bm = rng.randn(Bsz, K, L, N).astype(np.float32)
    Cm = rng.randn(Bsz, K, L, N).astype(np.float32)
    Dk = rng.randn(K, D).astype(np.float32)
    bias = rng.randn(K, D).astype(np.float32) * 0.1
    return u, delta, A, Bm, Cm, Dk, bias


def test_ref_matches_naive():
    args = make_inputs()
    expected = naive_scan(*args)
    got = selective_scan_ref(*args)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_chunked_matches_ref():
    args = make_inputs(L=100)
    ref = selective_scan_ref(*args)
    got = selective_scan_chunked(*args, chunk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_pallas_matches_ref():
    # D=128 to satisfy lane alignment; L not a multiple of the chunk
    args = make_inputs(Bsz=1, K=4, L=50, D=128, N=4)
    ref = selective_scan_ref(*args)
    got = selective_scan_pallas(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_pallas_larger_state():
    args = make_inputs(Bsz=1, K=4, L=33, D=128, N=16, seed=3)
    ref = selective_scan_ref(*args)
    got = selective_scan_pallas(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_pallas_gradients_match_ref():
    u, delta, A, Bm, Cm, Dk, bias = make_inputs(Bsz=1, K=2, L=24, D=128, N=4)

    def loss_pallas(*args):
        return jnp.sum(jnp.tanh(selective_scan_pallas(*args)))

    def loss_ref(*args):
        return jnp.sum(jnp.tanh(selective_scan_ref(*args)))

    args = (u, delta, A, Bm, Cm, Dk, bias)
    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_pallas_bwd_multichunk_padded():
    """Pallas backward across many chunks with trailing padding (regression:
    the reverse-visited chunk index must drive the padding mask)."""
    import founddiff_tpu.ops.scan_pallas as sp

    orig = sp._pick_chunk
    sp._pick_chunk = lambda G, D, N, L: 16
    try:
        args = make_inputs(Bsz=2, K=4, L=75, D=8, N=4, seed=5)

        def loss(fn):
            return lambda *a: jnp.sum(jnp.tanh(fn(*a)))

        gp = jax.grad(loss(sp.selective_scan_pallas),
                      argnums=tuple(range(7)))(*args)
        gr = jax.grad(loss(selective_scan_ref), argnums=tuple(range(7)))(*args)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            )
    finally:
        sp._pick_chunk = orig


def test_chunked_gradients_match_ref():
    args = make_inputs(L=40, D=8, N=4)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.square(fn(*a)))

    g_c = jax.grad(loss(lambda *a: selective_scan_chunked(*a, chunk=8)),
                   argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    g_r = jax.grad(loss(selective_scan_ref), argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    for a, b in zip(g_c, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_selective_scan_vs_torch_golden():
    """Cross-check against an independent torch recurrence (sequential,
    float64) to guard against a shared-bug between the JAX variants."""
    import torch

    u, delta, A, Bm, Cm, Dk, bias = make_inputs(Bsz=1, K=1, L=20, D=4, N=3, seed=7)
    tu = torch.tensor(u, dtype=torch.float64)
    td = torch.nn.functional.softplus(
        torch.tensor(delta, dtype=torch.float64)
        + torch.tensor(bias, dtype=torch.float64)[None, :, None, :]
    )
    tA = torch.tensor(A, dtype=torch.float64)
    tB = torch.tensor(Bm, dtype=torch.float64)
    tC = torch.tensor(Cm, dtype=torch.float64)
    tD = torch.tensor(Dk, dtype=torch.float64)
    h = torch.zeros(4, 3, dtype=torch.float64)
    ys = []
    for l in range(20):
        dl = td[0, 0, l]
        h = torch.exp(dl[:, None] * tA[0]) * h + (dl * tu[0, 0, l])[:, None] * tB[
            0, 0, l
        ][None, :]
        ys.append(h @ tC[0, 0, l] + tD[0] * tu[0, 0, l])
    golden = torch.stack(ys).numpy()[None, None]
    got = selective_scan_ref(u, delta, A, Bm, Cm, Dk, bias)
    np.testing.assert_allclose(np.asarray(got), golden, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# EfficientScan / EfficientMerge


def test_efficient_scan_directions():
    """Check the exact pixel ordering of the 4 strided directions
    (reference src/emamba2.py:206-212)."""
    H = W = 4
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W, 1)
    xs = efficient_scan(x, 2)
    assert xs.shape == (1, 4, 4, 1)
    grid = np.arange(16).reshape(4, 4)
    # dir0: (h even, w even) row-major
    np.testing.assert_array_equal(xs[0, 0, :, 0], grid[::2, ::2].reshape(-1))
    # dir1: transposed image, rows ::2 (w even), cols 1::2 (h odd)
    np.testing.assert_array_equal(xs[0, 1, :, 0], grid.T[::2, 1::2].reshape(-1))
    # dir2: (h even, w odd) row-major
    np.testing.assert_array_equal(xs[0, 2, :, 0], grid[::2, 1::2].reshape(-1))
    # dir3: transposed, (w odd, h odd)
    np.testing.assert_array_equal(xs[0, 3, :, 0], grid.T[1::2, 1::2].reshape(-1))


@pytest.mark.parametrize("hw", [(4, 4), (6, 8), (5, 7)])
def test_efficient_scan_merge_roundtrip(hw):
    H, W = hw
    x = jnp.asarray(np.random.RandomState(0).randn(2, H, W, 3).astype(np.float32))
    xs = efficient_scan(x, 2)
    y = efficient_merge(xs, H, W, 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=0)


def test_efficient_scan_jittable():
    f = jax.jit(lambda x: efficient_merge(efficient_scan(x, 2), 8, 8, 2))
    x = jnp.ones((1, 8, 8, 4))
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(x))

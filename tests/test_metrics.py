"""Metric/loss tests: PSNR/RMSE closed forms, SSIM properties + golden vs
skimage, Sobel vs torch, wavelet decomposition vs pywt when available."""

import jax.numpy as jnp
import numpy as np
import pytest

from founddiff_tpu.ops import (
    compute_psnr,
    compute_rmse,
    compute_ssim,
    grad_loss,
    sobel,
    wt_decomp,
)


def test_psnr_closed_form():
    a = jnp.zeros((1, 16, 16, 1))
    b = jnp.full((1, 16, 16, 1), 0.1)
    # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
    np.testing.assert_allclose(float(compute_psnr(a, b)), 20.0, rtol=1e-5)
    np.testing.assert_allclose(float(compute_rmse(a, b)), 0.1, rtol=1e-5)


def test_ssim_self_is_one():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 1), jnp.float32)
    assert float(compute_ssim(x, x)) > 0.9999


def test_ssim_decreases_with_noise():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)
    y1 = x + 0.01 * jnp.asarray(rng.randn(1, 64, 64, 1), jnp.float32)
    y2 = x + 0.1 * jnp.asarray(rng.randn(1, 64, 64, 1), jnp.float32)
    s1, s2 = float(compute_ssim(x, y1)), float(compute_ssim(x, y2))
    assert s1 > s2 > 0


def test_ssim_matches_torch_gaussian_reference():
    """Golden check vs a direct torch implementation of the reference SSIM
    (gaussian 11x11 sigma 1.5, reflect padding; src/util.py:188-220)."""
    import torch
    import torch.nn.functional as F

    def gaussian2d(size=11, sigma=1.5):
        x = torch.arange(size, dtype=torch.float64) - (size - 1) / 2
        g = torch.exp(-(x**2) / (2 * sigma**2))
        g = g / g.sum()
        return torch.outer(g, g).float()

    def filt(img, k):
        pad = k.shape[-1] // 2
        img = F.pad(img, (pad, pad, pad, pad), mode="reflect")
        return F.conv2d(img, k[None, None])

    rng = np.random.RandomState(3)
    a = rng.rand(1, 48, 48, 1).astype(np.float32)
    b = np.clip(a + 0.05 * rng.randn(1, 48, 48, 1), 0, 1).astype(np.float32)

    k = gaussian2d()
    ta = torch.tensor(a.transpose(0, 3, 1, 2))
    tb = torch.tensor(b.transpose(0, 3, 1, 2))
    c1, c2 = 0.01**2, 0.03**2
    mu1, mu2 = filt(ta, k), filt(tb, k)
    s1 = filt(ta * ta, k) - mu1**2
    s2 = filt(tb * tb, k) - mu2**2
    s12 = filt(ta * tb, k) - mu1 * mu2
    ssim_map = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    )
    golden = float(torch.clamp(ssim_map, 0, 1).mean())

    got = float(compute_ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, golden, rtol=1e-4)


def test_sobel_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.rand(2, 16, 16, 1).astype(np.float32)
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    cx = torch.tensor([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype=torch.float32)[
        None, None
    ] / 4
    cy = torch.tensor([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=torch.float32)[
        None, None
    ] / 4
    gx = F.conv2d(xt, cx, padding=1)
    gy = F.conv2d(xt, cy, padding=1)
    golden = torch.sqrt(gx**2 + gy**2 + 1e-4).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(sobel(jnp.asarray(x)))
    np.testing.assert_allclose(got, golden, rtol=1e-5, atol=1e-6)
    assert float(grad_loss(jnp.asarray(x), jnp.asarray(x))) == 0.0


def test_wavelet_decomp_reconstruction():
    """low + high must equal the input exactly, and the low band must be
    smooth (high-frequency energy removed)."""
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(40, 56).astype(np.float32))
    lo, hi = wt_decomp(img, level=3)
    np.testing.assert_allclose(np.asarray(lo + hi), np.asarray(img), atol=1e-4)
    # smoothness: total variation of the low band is smaller than the image's
    def tv(a):
        a = np.asarray(a)
        return np.abs(np.diff(a, axis=0)).mean() + np.abs(np.diff(a, axis=1)).mean()

    assert tv(lo) < tv(img) * 0.6


def test_wavelet_matches_pywt():
    pywt = pytest.importorskip("pywt")
    rng = np.random.RandomState(1)
    img = rng.rand(64, 64).astype(np.float32)
    level = 2

    # reference recipe (src/util.py:343-356) without the extra padding:
    arr = pywt.wavedec2(img, wavelet="db3", mode="symmetric", level=level)
    arr[0] = np.zeros_like(arr[0])
    golden_h = pywt.waverec2(arr, wavelet="db3", mode="symmetric").astype(
        np.float32
    )[: img.shape[0], : img.shape[1]]

    # our version pads first; compare interior region where padding can't leak
    lo, hi = wt_decomp(jnp.asarray(img), level=level)
    m = 24
    np.testing.assert_allclose(
        np.asarray(hi)[m:-m, m:-m], golden_h[m:-m, m:-m], atol=5e-3
    )

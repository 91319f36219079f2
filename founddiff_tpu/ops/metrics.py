"""Image quality metrics in pure JAX (reference src/util.py:188-236).

The reference computes SSIM with kornia's 11x11 sigma-1.5 gaussian window and
PSNR/RMSE from fp32 MSE.  Here SSIM is a depthwise gaussian convolution
(VPU/MXU-friendly, jittable, batchable), matching kornia's semantics:
normalized separable gaussian kernel, reflect-padded 'same' filtering
(kornia ``filter2d`` default ``border_type='reflect'``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    """kornia-style normalized gaussian (centered)."""
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def gaussian_kernel2d(size: int, sigma: float) -> np.ndarray:
    k = gaussian_kernel1d(size, sigma)
    return np.outer(k, k).astype(np.float32)


def _filter2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2-D 'same' filter with reflect padding on NHWC input
    (kornia filter2d default semantics)."""
    kh, kw = kernel.shape
    C = x.shape[-1]
    # reflect-pad as kornia filter2d default border_type='reflect'
    ph, pw = kh // 2, kw // 2
    x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")
    k = jnp.broadcast_to(kernel[:, :, None, None], (kh, kw, 1, C))
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def compute_ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    max_val: float = 1.0,
    reduction: str = "mean",
    full: bool = False,
):
    """SSIM on NHWC images (reference src/util.py:188-220: gaussian 11x11,
    sigma 1.5, clamp to [0,1] before reduction)."""
    kernel = jnp.asarray(gaussian_kernel2d(window_size, 1.5))
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    mu1 = _filter2d(img1, kernel)
    mu2 = _filter2d(img2, kernel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, kernel) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, kernel) - mu2_sq
    sigma12 = _filter2d(img1 * img2, kernel) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if reduction == "none":
        out = ssim_map
    else:
        clamped = jnp.clip(ssim_map, 0.0, 1.0)
        out = jnp.mean(clamped) if reduction == "mean" else jnp.sum(clamped)
    if full:
        cs = jnp.mean((2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2))
        return out, cs
    return out


def compute_psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0):
    """reference src/util.py:223-232."""
    mse = jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))
    return 10.0 * jnp.log10(max_val * max_val / mse)


def compute_rmse(pred: jnp.ndarray, target: jnp.ndarray):
    """reference src/util.py:235-236."""
    return jnp.sqrt(
        jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))
    )


@jax.jit
def slice_metrics(pred: jnp.ndarray, target: jnp.ndarray):
    """PSNR/SSIM/RMSE for one batch of slices in one jitted call."""
    return {
        "psnr": compute_psnr(pred, target),
        "ssim": compute_ssim(pred, target),
        "rmse": compute_rmse(pred, target),
    }

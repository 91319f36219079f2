"""Auxiliary losses: Sobel gradient loss, BMC contrastive-regression loss,
and db3 wavelet low/high-frequency decomposition
(reference src/util.py:293-530), all in pure JAX.

The wavelet decomposition (``wt_decomp``) is implemented as an undecimated-
equivalent DWT pipeline via ``jax.scipy`` convolutions with symmetric
padding — zeroing the level-J approximation band and reconstructing, like the
reference's pywt db3/level-6 recipe.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Daubechies-3 decomposition/reconstruction filters (pywt 'db3').
_DB3_DEC_LO = np.array(
    [0.03522629188210, -0.08544127388224, -0.13501102001039,
     0.45987750211933, 0.80689150931334, 0.33267055295096],
    dtype=np.float64,
)
_DB3_DEC_HI = np.array(
    [-0.33267055295096, 0.80689150931334, -0.45987750211933,
     -0.13501102001039, 0.08544127388224, 0.03522629188210],
    dtype=np.float64,
)
_DB3_REC_LO = _DB3_DEC_LO[::-1].copy()
_DB3_REC_HI = _DB3_DEC_HI[::-1].copy()


def sobel(x: jnp.ndarray, epsilon: float = 1e-4) -> jnp.ndarray:
    """Sobel gradient magnitude on NHWC images
    (reference ``SobelOperator`` src/util.py:498-519; kernels scaled by 1/4,
    zero 'same' padding)."""
    kx = (
        jnp.asarray([[1, 0, -1], [2, 0, -2], [1, 0, -1]], jnp.float32) / 4.0
    )
    ky = (
        jnp.asarray([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32) / 4.0
    )
    C = x.shape[-1]

    def depthwise(img, k):
        kern = jnp.broadcast_to(k[:, :, None, None], (3, 3, 1, C))
        return jax.lax.conv_general_dilated(
            img,
            kern,
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    gx = depthwise(x, kx)
    gy = depthwise(x, ky)
    return jnp.sqrt(gx**2 + gy**2 + epsilon)


def grad_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 between Sobel maps (reference ``GradLoss`` src/util.py:522-530)."""
    return jnp.mean(jnp.abs(sobel(target) - sobel(pred)))


def euclidean_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise distances (reference src/util.py:319-337)."""
    xx = jnp.sum(x**2, axis=1, keepdims=True)
    yy = jnp.sum(y**2, axis=1, keepdims=True).T
    dist = xx + yy - 2.0 * x @ y.T
    return jnp.sqrt(jnp.clip(dist, 1e-12, None))


def bmc_loss(pred: jnp.ndarray, target: jnp.ndarray, noise_var) -> jnp.ndarray:
    """Balanced-MSE contrastive regression loss
    (reference src/util.py:304-316).  ``pred``/``target``: [B, ...]."""
    b = pred.shape[0]
    pred = pred.reshape(b, -1)
    target = target.reshape(b, -1)
    logits = -0.5 * euclidean_dist(pred, target) / noise_var
    labels = jnp.arange(b)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(logp[jnp.arange(b), labels])
    return loss * jax.lax.stop_gradient(2 * noise_var)


def _wave_padding(h: int, w: int, filter_len: int = 6, level: int = 6):
    """Padding recipe from reference ``apply_wave_padding``
    (src/util.py:357-381)."""
    hh = ((2**level) - h % (2**level)) % (2**level)
    ww = ((2**level) - w % (2**level)) % (2**level)
    hh += filter_len * (2**level)
    ww += filter_len * (2**level)
    return (hh // 2, hh - hh // 2), (ww // 2, ww - ww // 2)


def _dwt_rows(x, lo, hi):
    """Single-level 1-D DWT along the last axis with symmetric extension.
    x: [..., L] -> (approx, detail): [..., L//2] each (pywt 'symmetric')."""
    flen = lo.shape[0]
    # pywt symmetric mode pads flen-1 on both sides, then convolves and
    # downsamples starting at index 1 (odd positions).
    pad = flen - 1
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="symmetric")
    # correlate with flipped filter == convolve
    def corr(f):
        k = f[::-1]
        out = jax.vmap(
            lambda row: jnp.convolve(row, k[::-1], mode="valid")
        )(xp.reshape(-1, xp.shape[-1]))
        return out.reshape(x.shape[:-1] + (out.shape[-1],))

    a_full = corr(lo)
    d_full = corr(hi)
    return a_full[..., 1::2], d_full[..., 1::2]


def _idwt_rows(a, d, lo, hi, out_len):
    """Inverse of :func:`_dwt_rows` (pywt symmetric)."""
    flen = lo.shape[0]

    def up(c):
        z = jnp.zeros(c.shape[:-1] + (c.shape[-1] * 2,), c.dtype)
        return z.at[..., ::2].set(c)

    ua, ud = up(a), up(d)

    def conv_full(x, f):
        out = jax.vmap(lambda row: jnp.convolve(row, f, mode="full"))(
            x.reshape(-1, x.shape[-1])
        )
        return out.reshape(x.shape[:-1] + (out.shape[-1],))

    rec = conv_full(ua, lo) + conv_full(ud, hi)
    start = flen - 2
    return rec[..., start : start + out_len]


def _dwt2(x, lo, hi):
    """One 2-D DWT level on [..., H, W] -> (LL, (LH, HL, HH))."""
    a, d = _dwt_rows(x, lo, hi)  # along W
    xt = jnp.swapaxes(a, -1, -2)
    aa, ad = _dwt_rows(xt, lo, hi)
    ll, lh = jnp.swapaxes(aa, -1, -2), jnp.swapaxes(ad, -1, -2)
    xt = jnp.swapaxes(d, -1, -2)
    da, dd = _dwt_rows(xt, lo, hi)
    hl, hh = jnp.swapaxes(da, -1, -2), jnp.swapaxes(dd, -1, -2)
    return ll, (lh, hl, hh)


def _idwt2(ll, bands, lo, hi, shape):
    lh, hl, hh = bands
    H, W = shape
    Hc = ll.shape[-2]
    l_col = _idwt_rows(
        jnp.swapaxes(ll, -1, -2), jnp.swapaxes(lh, -1, -2), lo, hi, H
    )
    h_col = _idwt_rows(
        jnp.swapaxes(hl, -1, -2), jnp.swapaxes(hh, -1, -2), lo, hi, H
    )
    l_col = jnp.swapaxes(l_col, -1, -2)
    h_col = jnp.swapaxes(h_col, -1, -2)
    return _idwt_rows(l_col, h_col, lo, hi, W)


def wt_decomp(
    image: jnp.ndarray, level: int = 6
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a 2-D image into low/high frequency parts with a db3 DWT
    (reference ``wt_decomp`` src/util.py:343-356: zero the approximation
    band, reconstruct the high-pass, low = image - high)."""
    lo = jnp.asarray(_DB3_DEC_LO, jnp.float32)
    hi = jnp.asarray(_DB3_DEC_HI, jnp.float32)
    rlo = jnp.asarray(_DB3_REC_LO, jnp.float32)
    rhi = jnp.asarray(_DB3_REC_HI, jnp.float32)

    h, w = image.shape[-2], image.shape[-1]
    (t, d_), (l, r) = _wave_padding(h, w, 6, level)
    x = jnp.pad(
        image, [(0, 0)] * (image.ndim - 2) + [(t, d_), (l, r)], mode="symmetric"
    ).astype(jnp.float32)

    coeffs = []
    shapes = []
    for _ in range(level):
        shapes.append((x.shape[-2], x.shape[-1]))
        x, bands = _dwt2(x, lo, hi)
        coeffs.append(bands)

    x = jnp.zeros_like(x)  # zero the approximation band
    for bands, shp in zip(reversed(coeffs), reversed(shapes)):
        x = _idwt2(x, bands, rlo, rhi, shp)

    arr_h = x[..., t : t + h, l : l + w]
    arr_l = image - arr_h
    return arr_l, arr_h

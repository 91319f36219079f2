"""Selective scan (Mamba S6 recurrence) for TPU.

The reference's only native dependency is the ``selective_scan_cuda`` kernel
(reference src/emamba2.py:23-34,124-179).  This module provides its TPU
equivalents:

- :func:`selective_scan_ref` — a pure-XLA implementation via
  ``jax.lax.associative_scan`` (work-efficient in depth, but materializes the
  ``[B,K,L,D,N]`` element tensor; used for correctness tests and small L).
- :func:`selective_scan_chunked` — a memory-lean ``lax.scan`` over L-chunks
  with per-chunk associative scans and rematerialized backward
  (``jax.checkpoint``); fully differentiable, bounded memory.
- :func:`selective_scan` — dispatching entry; on TPU the forward runs the
  Pallas kernel from :mod:`founddiff_tpu.ops.scan_pallas` with a custom VJP
  whose backward is the chunked rematerialized path.

Math (diagonal SSM, per direction k and channel d with state size N):

    delta' = softplus(delta + delta_bias)              (if delta_softplus)
    abar_t = exp(delta'_t * A)                          [D, N]
    h_t    = abar_t * h_{t-1} + delta'_t * B_t * u_t    [D, N]
    y_t    = sum_n C_t[n] * h_t[:, n] + Dskip * u_t     [D]

Shapes (TPU-native layout, time on the second-to-last axis for MXU-friendly
projections):
    u, delta: [B, K, L, D]
    A:        [K, D, N]
    Bmat, Cmat: [B, K, L, N]
    Dskip:    [K, D]
    delta_bias: [K, D]
returns y: [B, K, L, D] (fp32)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _softplus(x):
    return jax.nn.softplus(x)


def _scan_combine(e1, e2):
    a1, b1 = e1
    a2, b2 = e2
    return a1 * a2, a2 * b1 + b2


def _prepare(u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus):
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias[None, :, None, :].astype(jnp.float32)
    if delta_softplus:
        delta = _softplus(delta)
    A = A.astype(jnp.float32)
    Bmat = Bmat.astype(jnp.float32)
    Cmat = Cmat.astype(jnp.float32)
    Dskip = None if Dskip is None else Dskip.astype(jnp.float32)
    return u, delta, A, Bmat, Cmat, Dskip


def selective_scan_ref(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    Bmat: jnp.ndarray,
    Cmat: jnp.ndarray,
    Dskip: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = True,
    h_init: Optional[jnp.ndarray] = None,
    return_last_state: bool = False,
):
    """Associative-scan reference implementation.

    ``h_init``: optional initial state [B, K, D, N] (used by the sequence-
    sharded path to stitch shards together).
    """
    u, delta, A, Bmat, Cmat, Dskip = _prepare(
        u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus
    )

    # elements over L: abar [B,K,L,D,N], bbar [B,K,L,D,N]
    abar = jnp.exp(delta[..., None] * A[None, :, None, :, :])
    bbar = (delta * u)[..., None] * Bmat[:, :, :, None, :]
    if h_init is not None:
        # fold the initial state into the first element: h_1 = a_1 h_0 + b_1
        bbar = bbar.at[:, :, 0].add(abar[:, :, 0] * h_init.astype(jnp.float32))
    _, h = jax.lax.associative_scan(_scan_combine, (abar, bbar), axis=2)
    y = jnp.einsum("bkldn,bkln->bkld", h, Cmat)
    if Dskip is not None:
        y = y + u * Dskip[None, :, None, :]
    if return_last_state:
        return y, h[:, :, -1]
    return y


def selective_scan_chunked(
    u, delta, A, Bmat, Cmat, Dskip=None, delta_bias=None, delta_softplus=True,
    chunk: int = 256, return_last_state: bool = False,
):
    """``lax.scan`` over L-chunks with per-chunk remat; bounded memory & AD-able.

    Used as the differentiable backward path of the Pallas forward kernel (the
    CUDA reference saves intermediate states for its bwd kernel,
    src/emamba2.py:155-179; here we rematerialize per chunk instead).
    """
    B, K, L, D = u.shape
    N = A.shape[-1]
    u, delta, A, Bmat, Cmat, Dskip = _prepare(
        u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus
    )

    pad = (-L) % chunk
    if pad:
        u_p = jnp.pad(u, ((0, 0), (0, 0), (0, pad), (0, 0)))
        delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, pad), (0, 0)))
        B_p = jnp.pad(Bmat, ((0, 0), (0, 0), (0, pad), (0, 0)))
        C_p = jnp.pad(Cmat, ((0, 0), (0, 0), (0, pad), (0, 0)))
    else:
        u_p, delta_p, B_p, C_p = u, delta, Bmat, Cmat
    Lp = L + pad
    nchunks = Lp // chunk

    def reshape_chunks(x):
        return x.reshape(B, K, nchunks, chunk, x.shape[-1]).transpose(2, 0, 1, 3, 4)

    xs = tuple(map(reshape_chunks, (u_p, delta_p, B_p, C_p)))

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def chunk_fn(h0, uc, dc, bc, cc):
        abar = jnp.exp(dc[..., None] * A[None, :, None, :, :])
        bbar = (dc * uc)[..., None] * bc[:, :, :, None, :]
        bbar = bbar.at[:, :, 0].add(abar[:, :, 0] * h0)
        _, h = jax.lax.associative_scan(_scan_combine, (abar, bbar), axis=2)
        y = jnp.einsum("bkldn,bkln->bkld", h, cc)
        return h[:, :, -1], y

    def step(h, x):
        uc, dc, bc, cc = x
        h_next, y = chunk_fn(h, uc, dc, bc, cc)
        return h_next, y

    # derive the zero carry from the input so it inherits the input's
    # varying-manual-axes under shard_map (a plain jnp.zeros carry trips
    # the scan carry-type check when L is sharded over a mesh axis)
    h0 = jnp.zeros((B, K, D, N), jnp.float32) + 0.0 * u_p[:, :, 0, :, None]
    h_last, ys = jax.lax.scan(step, h0, xs)
    y = ys.transpose(1, 2, 0, 3, 4).reshape(B, K, Lp, D)[:, :, :L]
    if Dskip is not None:
        y = y + u * Dskip[None, :, None, :]
    if return_last_state:
        # padded steps have delta'=0 (abar=1, bbar=0), so the carry equals
        # the state at step L
        return y, h_last
    return y


def selective_scan(
    u, delta, A, Bmat, Cmat, Dskip=None, delta_bias=None, delta_softplus=True,
    impl: str = "auto", return_last_state: bool = False,
):
    """Dispatching selective scan.

    impl: 'auto' | 'pallas' | 'chunked' | 'ref'.
    'auto' picks the Pallas kernel on TPU and the chunked XLA path elsewhere.
    """
    if impl == "auto":
        impl = (
            "pallas"
            if jax.default_backend() == "tpu"
            else "chunked"
        )
    if impl == "ref":
        return selective_scan_ref(
            u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus,
            return_last_state=return_last_state,
        )
    if impl == "chunked":
        return selective_scan_chunked(
            u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus,
            return_last_state=return_last_state,
        )
    if impl == "pallas":
        from founddiff_tpu.ops.scan_pallas import selective_scan_pallas

        return selective_scan_pallas(
            u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus,
            return_last_state=return_last_state,
        )
    raise ValueError(f"unknown selective_scan impl {impl!r}")


def flops_selective_scan(
    B: int, L: int, D: int, N: int,
    with_D: bool = True, with_Z: bool = False, with_group: bool = True,
    with_complex: bool = False,
) -> int:
    """Static FLOP estimate of one selective scan
    (reference ``flops_selective_scan_fn`` src/emamba2.py:38-110).

    Recurrence: 9 * B*L*D*N flops (exp/mul/mul/fma per element plus the
    C-contraction), + D skip, + optional z gating.
    """
    assert not with_complex
    flops = 9 * B * L * D * N
    if with_D:
        flops += B * D * L
    if with_Z:
        flops += B * D * L
    return flops


# ---------------------------------------------------------------------------
# EfficientScan / EfficientMerge (reference src/emamba2.py:182-292).
#
# These are pure strided gather/interleave patterns; XLA lowers them to cheap
# reshapes/transposes, so no Pallas is needed (the CUDA repo needed autograd
# Functions only because of the in-place strided writes).
# Layout: NHWC images, scan sequences [B, K, L, C].
# ---------------------------------------------------------------------------


def efficient_scan(x: jnp.ndarray, step_size: int = 2) -> jnp.ndarray:
    """Decimate an NHWC image into 4 strided sub-sequences.

    Direction order matches reference src/emamba2.py:206-212:
      0: (h even, w even), row-major
      1: (w even, h odd),  column-major (transposed image)
      2: (h even, w odd),  row-major
      3: (w odd,  h odd),  column-major
    Returns [B, 4, (H/s)*(W/s), C].
    """
    B, H, W, C = x.shape
    s = step_size
    pad_h, pad_w = (-H) % s, (-W) % s
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        H, W = H + pad_h, W + pad_w
    # decimate via reshape+static-slice (XLA lowers strided slicing of the
    # original layout to index gathers, which dominated profiles); the
    # column-major directions additionally transpose a quarter-size map
    xr = x.reshape(B, H // s, s, W // s, s, C)
    d0 = xr[:, :, 0, :, 0, :]  # (h even, w even) row-major
    d2 = xr[:, :, 0, :, 1, :]  # (h even, w odd)  row-major
    d1 = jnp.swapaxes(xr[:, :, 1, :, 0, :], 1, 2)  # (w even, h odd) col-major
    d3 = jnp.swapaxes(xr[:, :, 1, :, 1, :], 1, 2)  # (w odd,  h odd) col-major
    flat = lambda d: d.reshape(B, -1, C)
    return jnp.stack([flat(d0), flat(d1), flat(d2), flat(d3)], axis=1)


def cross_scan_v0(x: jnp.ndarray) -> jnp.ndarray:
    """Full (non-decimated) 4-direction scan layout
    (reference ``forward_corev0`` src/emamba2.py:589-612): directions are
    [row-major, column-major, reversed-row-major, reversed-column-major].
    x: [B, H, W, C] -> [B, 4, H*W, C]."""
    B, H, W, C = x.shape
    rows = x.reshape(B, H * W, C)
    cols = jnp.swapaxes(x, 1, 2).reshape(B, H * W, C)
    return jnp.stack(
        [rows, cols, rows[:, ::-1], cols[:, ::-1]], axis=1
    )


def cross_merge_v0(ys: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Inverse-accumulate of :func:`cross_scan_v0`
    (reference src/emamba2.py:625-630): un-flip/un-transpose each direction
    and sum.  ys: [B, 4, H*W, C] -> [B, H, W, C]."""
    B, K, L, C = ys.shape
    rows = ys[:, 0] + ys[:, 2, ::-1]
    cols = ys[:, 1] + ys[:, 3, ::-1]
    out = rows.reshape(B, H, W, C) + jnp.swapaxes(
        cols.reshape(B, W, H, C), 1, 2
    )
    return out


def efficient_merge(
    ys: jnp.ndarray, ori_h: int, ori_w: int, step_size: int = 2
) -> jnp.ndarray:
    """Re-interleave 4 direction sequences into an NHWC image
    (reference src/emamba2.py:236-263).  ys: [B, 4, L, C] -> [B, H, W, C]."""
    B, K, L, C = ys.shape
    s = step_size
    H = -(-ori_h // s)
    W = -(-ori_w // s)
    d0 = ys[:, 0].reshape(B, H, W, C)
    d1 = jnp.swapaxes(ys[:, 1].reshape(B, W, H, C), 1, 2)
    d2 = ys[:, 2].reshape(B, H, W, C)
    d3 = jnp.swapaxes(ys[:, 3].reshape(B, W, H, C), 1, 2)
    # out[2i, 2j] = d0; out[2i+1, 2j] = d1; out[2i, 2j+1] = d2; out[2i+1, 2j+1] = d3
    # build [B, H, s, W, s, C] then collapse the interleave axes
    row_even = jnp.stack([d0, d2], axis=3)  # j index: [B, H, W, 2, C]
    row_odd = jnp.stack([d1, d3], axis=3)  # [B, H, W, 2, C]
    grid = jnp.stack([row_even, row_odd], axis=2)  # i index: [B, H, 2, W, 2, C]
    y = grid.reshape(B, H * s, W * s, C)
    if ori_h != H * s or ori_w != W * s:
        y = y[:, :ori_h, :ori_w, :]
    return y

"""Pallas TPU kernel for the selective scan (Mamba S6 recurrence).

TPU-native replacement for ``selective_scan_cuda.fwd`` (reference
src/emamba2.py:124-179).  Design (v2, time-vectorized):

- Each grid step processes one L-chunk of S timesteps.  Within the chunk the
  linear recurrence is computed with a **Hillis-Steele parallel scan over the
  time axis**: all operands are full [N, S, D] VMEM tiles (N = d_state on the
  outer axis, S timesteps on sublanes, D = d_inner on 128-wide lanes), so the
  kernel issues only large static vector ops — no per-timestep dynamic
  slicing, which dominates a naive sequential loop on TPU.
- The carried state (one [G, N, D] tile, G = batch*4 directions) is folded
  into the chunk result through the closed form
  ``h_t = h_local_t + cumA_t * h_carry`` (the recurrence is linear in its
  initial state), so chunks chain with O(1) extra work.
- softplus(delta + bias) is fused in-kernel; inputs stream through the Pallas
  pipeline double-buffered; B/C chunks arrive as [G, N, S] slabs
  (contiguous S rows -> efficient DMA).
- log2(S) scan levels trade ~4x elementwise work for full VPU occupancy; the
  chunk length balances that against pipeline overheads.

Backward: a custom VJP rematerializes through the chunked XLA implementation
(:func:`founddiff_tpu.ops.selective_scan.selective_scan_chunked`), which is
work-efficient and memory-bounded.  (The CUDA reference saves intermediate
states instead; a full Pallas backward is a planned optimization.)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 8 * 1024 * 1024  # conservative per-kernel VMEM target (bytes)


def _pick_chunk(G: int, D: int, N: int, L: int) -> int:
    """Chunk length S: the dominant VMEM residents are the [N, S, D] scan
    work arrays (x2 for (a, b)) plus 3 double-buffered [G, S, D] blocks."""
    per_step_bytes = (2 * N + 6 * G) * D * 4
    # floor 16: bf16 blocks need sublane multiples of 16
    s = max(16, min(512, _VMEM_BUDGET // max(per_step_bytes, 1)))
    p = 1
    while p * 2 <= s:
        p *= 2
    # S must stay a power of two (tiles divide it); shrink toward L to avoid
    # padding waste on short sequences
    while p // 2 >= L and p > 16:
        p //= 2
    return p


def _scan_kernel(u_ref, dl_ref, b_ref, c_ref, a_ref, d_ref, bias_ref, y_ref,
                 hout_ref, h_ref, *, chunk: int, softplus: bool,
                 seq_len: int, padded: bool):
    """One grid step = one (L-chunk, direction-group) cell; grid is (C, G)
    with G innermost so each group's state streams through all its chunks.

    Shapes: u_ref, dl_ref, y_ref: [1, S, D]; b_ref, c_ref: [1, S, N];
    a_ref: [1, N, D]; d_ref, bias_ref: [1, 1, D]; hout_ref: [1, N, D];
    h_ref (scratch): [G, N, D].
    """
    S = chunk
    g = pl.program_id(1)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[g] = jnp.zeros_like(h_ref[g])

    base = pl.program_id(0) * S

    # two-level scan: Hillis-Steele within TILE-step tiles (masks on the
    # local index kill roll wraparound AND cross-tile leakage in one go),
    # then a static-sliced sequential carry across tiles.
    TILE = min(32, S)
    ntiles = S // TILE
    local_idx = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1) % TILE

    # IO rides in the caller's dtype (bf16 halves HBM traffic); the
    # recurrence itself runs fp32
    u = u_ref[0].astype(jnp.float32)  # [S, D]
    dl = dl_ref[0].astype(jnp.float32) + bias_ref[0]  # [S, D] (+ [1, D])
    if softplus:
        dl = jax.nn.softplus(dl)
    if padded:
        # trailing padded steps: delta'=0 -> identity transition
        step_ids = base + jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        dl = dl * (step_ids < seq_len).astype(jnp.float32)
    a_g = a_ref[0]  # [N, D]
    # one small [S, N] -> [N, S] transpose per (chunk, group); cast BEFORE
    # inserting the minor dim (Mosaic only supports that for 32-bit types)
    bmat = jnp.swapaxes(b_ref[0], 0, 1).astype(jnp.float32)[:, :, None]
    cmat = jnp.swapaxes(c_ref[0], 0, 1).astype(jnp.float32)[:, :, None]

    # per-step transitions, vectorized over the whole chunk
    abar = jnp.exp(dl[None, :, :] * a_g[:, None, :])  # [N, S, D]
    bbar = (dl * u)[None, :, :] * bmat  # [N, S, D]

    # per-tile inclusive scans:
    #   (a, b)_t <- combine((a, b)_{t-s}, (a, b)_t)
    #             = (a_{t-s} * a_t, a_t * b_{t-s} + b_t)
    a_sc, b_sc = abar, bbar
    shift = 1
    while shift < TILE:
        a_sh = jnp.roll(a_sc, shift, axis=1)
        b_sh = jnp.roll(b_sc, shift, axis=1)
        m = local_idx >= shift
        a_sh = jnp.where(m, a_sh, 1.0)
        b_sh = jnp.where(m, b_sh, 0.0)
        b_sc = a_sc * b_sh + b_sc
        a_sc = a_sc * a_sh
        shift *= 2

    # sequential carry across tiles (static slices), fusing the chunk
    # entry state: h_t = b_sc_t + cumA_tile_t * carry
    carry = h_ref[g]  # [N, D]
    y_parts = []
    for ti in range(ntiles):
        sl = slice(ti * TILE, (ti + 1) * TILE)
        h_tile = b_sc[:, sl, :] + a_sc[:, sl, :] * carry[:, None, :]
        y_parts.append(jnp.sum(h_tile * cmat[:, sl, :], axis=0))
        carry = h_tile[:, TILE - 1, :]
    y = jnp.concatenate(y_parts, axis=0) if ntiles > 1 else y_parts[0]
    y_ref[0] = (y + d_ref[0] * u).astype(y_ref.dtype)

    h_ref[g] = carry
    hout_ref[0] = carry


@functools.partial(jax.jit, static_argnames=("delta_softplus",))
def _pallas_fwd(u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus):
    """u, delta: [B,K,L,D]; A: [K,D,N]; Bmat,Cmat: [B,K,L,N]; Dskip,bias: [K,D].

    Returns (y: [B,K,L,D] fp32, h_last: [B,K,D,N] fp32).
    """
    B, K, L, D = u.shape
    N = A.shape[-1]
    G = B * K

    S = _pick_chunk(G, D, N, L)
    pad = (-L) % S
    Lp = L + pad
    C = Lp // S

    f32 = jnp.float32
    # IO dtype follows the inputs (bf16 halves the kernel's HBM traffic; the
    # recurrence still runs fp32 in VMEM)
    io_dtype = u.dtype

    def to_gld(x):  # [B,K,L,*] -> [G, Lp, *] (pad only; no transpose)
        x = x.reshape(G, L, -1).astype(io_dtype)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    u_c = to_gld(u)
    dl_c = to_gld(delta)
    b_c = to_gld(Bmat)  # [G, Lp, N]
    c_c = to_gld(Cmat)

    a_g = jnp.broadcast_to(
        jnp.transpose(A.astype(f32), (0, 2, 1))[None], (B, K, N, D)
    ).reshape(G, N, D)
    d_g = jnp.broadcast_to(Dskip.astype(f32)[None], (B, K, D)).reshape(G, 1, D)
    bias_g = jnp.broadcast_to(
        delta_bias.astype(f32)[None], (B, K, D)
    ).reshape(G, 1, D)

    kernel = functools.partial(
        _scan_kernel,
        chunk=S,
        softplus=delta_softplus,
        seq_len=L,
        padded=bool(pad),
    )

    grid = (C, G)  # G innermost: per-group state streams through its chunks
    spec_sd = pl.BlockSpec(
        (1, S, D), lambda c, g: (g, c, 0), memory_space=pltpu.VMEM
    )
    spec_sn = pl.BlockSpec(
        (1, S, N), lambda c, g: (g, c, 0), memory_space=pltpu.VMEM
    )
    per_g = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda c, g: (g,) + (0,) * len(dims),
        memory_space=pltpu.VMEM,
    )

    import math

    y, h_last = pl.pallas_call(
        kernel,
        # interpret off-TPU so the same kernel logic is exercised by CPU tests
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            spec_sd,  # u
            spec_sd,  # delta
            spec_sn,  # B
            spec_sn,  # C
            per_g(N, D),  # A
            per_g(1, D),  # D skip
            per_g(1, D),  # delta bias
        ],
        out_specs=(spec_sd, per_g(N, D)),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lp, D), io_dtype),
            jax.ShapeDtypeStruct((G, N, D), f32),
        ),
        scratch_shapes=[pltpu.VMEM((G, N, D), f32)],
        cost_estimate=pl.CostEstimate(
            flops=int((8 + 5 * math.log2(max(S, 2))) * C * S * G * N * D),
            bytes_accessed=(3 * C * G * S * D + 2 * C * G * N * S) * 4,
            transcendentals=C * S * G * N * D,
        ),
    )(u_c, dl_c, b_c, c_c, a_g, d_g, bias_g)

    y = y[:, :L]
    h_last = h_last.reshape(B, K, N, D).transpose(0, 1, 3, 2)  # [B,K,D,N]
    return y.reshape(B, K, L, D), h_last


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _selective_scan_pallas(u, delta, A, Bmat, Cmat, Dskip, delta_bias,
                           delta_softplus):
    y, _ = _pallas_fwd(u, delta, A, Bmat, Cmat, Dskip, delta_bias,
                       delta_softplus)
    return y


def _ss_fwd(u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus):
    y, _ = _pallas_fwd(u, delta, A, Bmat, Cmat, Dskip, delta_bias,
                       delta_softplus)
    return y, (u, delta, A, Bmat, Cmat, Dskip, delta_bias)


def _ss_bwd(delta_softplus, residuals, g):
    from founddiff_tpu.ops.selective_scan import selective_scan_chunked

    u, delta, A, Bmat, Cmat, Dskip, delta_bias = residuals

    def f(u_, delta_, A_, B_, C_, D_, bias_):
        return selective_scan_chunked(
            u_, delta_, A_, B_, C_, D_, bias_, delta_softplus
        )

    _, vjp = jax.vjp(f, u, delta, A, Bmat, Cmat, Dskip, delta_bias)
    return vjp(g)


_selective_scan_pallas.defvjp(_ss_fwd, _ss_bwd)


def selective_scan_pallas(
    u, delta, A, Bmat, Cmat,
    Dskip: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = True,
    return_last_state: bool = False,
):
    """Public entry.  See module docstring for shapes."""
    K, D = A.shape[0], A.shape[1]
    if Dskip is None:
        Dskip = jnp.zeros((K, D), jnp.float32)
    if delta_bias is None:
        delta_bias = jnp.zeros((K, D), jnp.float32)
    if return_last_state:
        # fwd-only path (no VJP): used by sequence-sharded inference
        return _pallas_fwd(
            u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus
        )
    return _selective_scan_pallas(
        u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus
    )

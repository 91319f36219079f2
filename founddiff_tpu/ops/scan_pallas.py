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

Backward: a full Pallas kernel (:func:`_pallas_bwd`): the forward saves only
chunk-entry states; the backward revisits chunks in reverse, recomputes each
trajectory, and runs the adjoint recurrence as a suffix tile-scan — ~5x
faster than the XLA chunked-remat fallback (kept selectable via
``_BWD_IMPL``).  The CUDA reference instead saves intermediate states for
its bwd kernel (src/emamba2.py:161-179).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-kernel VMEM target; v5e has far more VMEM than v4's 16MB, and larger
# chunks halve the grid-cell overhead at the deep (large-N) UNet scales
_VMEM_BUDGET = 16 * 1024 * 1024


def _pick_chunk(G: int, D: int, N: int, L: int) -> int:
    """Chunk length S: the dominant VMEM residents are the [N, S, D] scan
    work arrays (~4 fp32 copies live through the tile scan) plus the
    double-buffered [1, S, D] / [1, S, N] io blocks (6 inputs+outputs x2
    buffers).  The [G, N, D] state scratch is chunk-independent and small."""
    per_step_bytes = (4 * N + 12) * D * 4 + 4 * N * 4
    s = max(16, min(1024, _VMEM_BUDGET // max(per_step_bytes, 1)))
    p = 1
    while p * 2 <= s:
        p *= 2
    # S must stay a power of two (tiles divide it); shrink toward L to avoid
    # padding waste on short sequences
    while p // 2 >= L and p > 16:
        p //= 2
    return p


def _chunk_inputs(u_ref, dl_ref, b_ref, c_ref, bias_ref, chunk_index, *,
                  softplus, padded, seq_len, chunk):
    """Shared fwd/bwd chunk preprocessing: returns (u, dl_raw, dl', bmat,
    cmat) with dl' = masked softplus(delta + bias).  ``chunk_index`` is the
    TRUE (global) chunk index — the backward visits chunks in reverse, so it
    differs from program_id there."""
    u = u_ref[0].astype(jnp.float32)  # [S, D]
    dl_raw = dl_ref[0].astype(jnp.float32) + bias_ref[0]  # [S, D]
    dl = jax.nn.softplus(dl_raw) if softplus else dl_raw
    valid = None
    if padded:
        base = chunk_index * chunk
        step_ids = base + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        valid = (step_ids < seq_len).astype(jnp.float32)
        dl = dl * valid
    # one small [S, N] -> [N, S] transpose per (chunk, group); cast BEFORE
    # inserting the minor dim (Mosaic only supports that for 32-bit types)
    bmat = jnp.swapaxes(b_ref[0], 0, 1).astype(jnp.float32)[:, :, None]
    cmat = jnp.swapaxes(c_ref[0], 0, 1).astype(jnp.float32)[:, :, None]
    return u, dl_raw, dl, valid, bmat, cmat


import os as _os0

# 'shift' (concat-slice Hillis-Steele, 4 vector ops/level x log2(TILE)
# levels) | 'roll' (roll + masks) | 'seq' (static sequential recurrence
# over the in-tile time axis: 2 ops/step on [N, nt, D] slices — O(TILE)
# ops total vs O(TILE log TILE), betting that Mosaic's static strided
# sublane slices are cheap; the r1 170-cycle cost was DYNAMIC slicing).
_TILE_SCAN_IMPL = _os0.environ.get("FOUNDDIFF_TILE_SCAN", "shift")


def _tile_scan(a, b, TILE, local_idx):
    """Hillis-Steele inclusive scans within TILE-step tiles.
      (a, b)_t <- combine((a, b)_{t-s}, (a, b)_t)
                = (a_{t-s} * a_t, a_t * b_{t-s} + b_t)

    'shift' variant: expose the tile axis ([N, S, D] -> [N, nt, T, D]) and
    shift with identity fill via concat+static-slice — 4 vector ops/level
    instead of roll's 6 (2 rolls + 2 masked selects + mul + fma), and no
    cross-tile leakage to mask.
    """
    if _TILE_SCAN_IMPL == "seq" and TILE > 1:
        N, S, D = a.shape
        nt = S // TILE
        a4 = a.reshape(N, nt, TILE, D)
        b4 = b.reshape(N, nt, TILE, D)
        ca = [a4[:, :, 0]]
        cb = [b4[:, :, 0]]
        for t in range(1, TILE):
            at = a4[:, :, t]
            cb.append(at * cb[-1] + b4[:, :, t])
            ca.append(at * ca[-1])
        a_s = jnp.stack(ca, axis=2)
        b_s = jnp.stack(cb, axis=2)
        return a_s.reshape(N, S, D), b_s.reshape(N, S, D)

    if _TILE_SCAN_IMPL == "shift":
        N, S, D = a.shape
        nt = S // TILE
        a4 = a.reshape(N, nt, TILE, D)
        b4 = b.reshape(N, nt, TILE, D)
        shift = 1
        while shift < TILE:
            ident = jnp.ones_like(a4[:, :, :shift])
            zero = jnp.zeros_like(ident)
            a_sh = jnp.concatenate([ident, a4[:, :, :-shift]], axis=2)
            b_sh = jnp.concatenate([zero, b4[:, :, :-shift]], axis=2)
            b4 = a4 * b_sh + b4
            a4 = a4 * a_sh
            shift *= 2
        return a4.reshape(N, S, D), b4.reshape(N, S, D)

    shift = 1
    while shift < TILE:
        a_sh = jnp.roll(a, shift, axis=1)
        b_sh = jnp.roll(b, shift, axis=1)
        m = local_idx >= shift
        a_sh = jnp.where(m, a_sh, 1.0)
        b_sh = jnp.where(m, b_sh, 0.0)
        b = a * b_sh + b
        a = a * a_sh
        shift *= 2
    return a, b


def _tile_scan_rev(w, q, TILE, local_idx):
    """Suffix (right-to-left) Hillis-Steele within tiles for the adjoint
    recurrence  gh_t = q_t + w_t * gh_{t+1}:
      (w, q)_t <- (w_t * w_{t+s}, q_t + W_t * q_{t+s})
    After the scan: q = reverse-inclusive values (zero state right of the
    tile), w = cumulative products from t to the tile end."""
    shift = 1
    while shift < TILE:
        w_sh = jnp.roll(w, -shift, axis=1)
        q_sh = jnp.roll(q, -shift, axis=1)
        m = local_idx < (TILE - shift)
        w_sh = jnp.where(m, w_sh, 1.0)
        q_sh = jnp.where(m, q_sh, 0.0)
        q = q + w * q_sh
        w = w * w_sh
        shift *= 2
    return w, q


def _resolve_tiles_rev(w_sc, q_sc, TILE, ntiles):
    """Combine reverse (suffix) tile scans right-to-left:
    gh_t = q_sc_t + w_sc_t * gh_{first element of the next tile}.

    'tree' mirror of :func:`_resolve_tiles`: suffix Hillis-Steele over the
    per-tile first-element summaries, then one broadcast fma."""
    if _RESOLVE_IMPL == "tree" and ntiles > 1:
        N, S, D = q_sc.shape
        w4 = w_sc.reshape(N, ntiles, TILE, D)
        q4 = q_sc.reshape(N, ntiles, TILE, D)
        wf = w4[:, :, 0, :]  # [N, nt, D] suffix products from tile start
        qf = q4[:, :, 0, :]  # tile-first suffix values (zero beyond tile)
        Ww, Qq = wf, qf
        shift = 1
        while shift < ntiles:
            ident = jnp.ones_like(Ww[:, :shift])
            zero = jnp.zeros_like(ident)
            w_sh = jnp.concatenate([Ww[:, shift:], ident], axis=1)
            q_sh = jnp.concatenate([Qq[:, shift:], zero], axis=1)
            Qq = Qq + Ww * q_sh
            Ww = Ww * w_sh
            shift *= 2
        # state entering tile t FROM THE RIGHT = gh at first element of
        # tile t+1 (zero after the last tile)
        r = jnp.concatenate(
            [Qq[:, 1:, :], jnp.zeros_like(Qq[:, :1, :])], axis=1
        )  # [N, nt, D]
        return (q4 + w4 * r[:, :, None, :]).reshape(N, S, D)

    parts = [None] * ntiles
    carry = None
    for ti in reversed(range(ntiles)):
        sl = slice(ti * TILE, (ti + 1) * TILE)
        if carry is None:
            gh_tile = q_sc[:, sl, :]
        else:
            gh_tile = q_sc[:, sl, :] + w_sc[:, sl, :] * carry[:, None, :]
        parts[ti] = gh_tile
        carry = gh_tile[:, 0, :]
    return jnp.concatenate(parts, axis=1) if ntiles > 1 else parts[0]


import os as _os

# 'chain' (sequential per-tile carry) | 'tree' (HS over tile carries).
# Measured r3 on v5e (scan-only capture, all 4 UNet scales, bs8): chain
# 32.3 ms vs tree 55.8 ms — the strided tile-carry extraction + small-array
# HS cost more than the 128-step chain; the kernel is ALU-throughput bound,
# not latency bound.  'tree' kept selectable for future Mosaic versions.
_RESOLVE_IMPL = _os.environ.get("FOUNDDIFF_RESOLVE", "chain")


def _resolve_tiles(a_sc, b_sc, carry, TILE, ntiles):
    """Combine the per-tile inclusive scans into the global scan:
    h_t = b_sc_t + cumA_tile_t * carry_entering_tile(t).

    'tree': a second-level Hillis-Steele over the ntiles tile carries
    (~log2(ntiles) vector ops on [N, ntiles, D]) followed by ONE broadcast
    fma over the full [N, S, D] tile — the sequential chain serialized
    ntiles (up to 128) small dependent ops per grid cell and was the
    latency bottleneck of the whole scan ("resolve chain" in the r2 notes).
    Returns ([N, S, D] states, carry)."""
    if _RESOLVE_IMPL == "tree" and ntiles > 1:
        N, S, D = a_sc.shape
        a4 = a_sc.reshape(N, ntiles, TILE, D)
        b4 = b_sc.reshape(N, ntiles, TILE, D)
        ta = a4[:, :, TILE - 1, :]  # [N, nt, D] per-tile decay products
        tb = b4[:, :, TILE - 1, :]  # per-tile end states (zero carry-in)
        Aa, Bb = ta, tb
        shift = 1
        while shift < ntiles:
            ident = jnp.ones_like(Aa[:, :shift])
            zero = jnp.zeros_like(ident)
            a_sh = jnp.concatenate([ident, Aa[:, :-shift]], axis=1)
            b_sh = jnp.concatenate([zero, Bb[:, :-shift]], axis=1)
            Bb = Aa * b_sh + Bb
            Aa = Aa * a_sh
            shift *= 2
        # state ENTERING tile t: e_0 = carry; e_t = Bb_{t-1} + Aa_{t-1}*carry
        e = jnp.concatenate(
            [
                carry[:, None, :],
                Bb[:, :-1, :] + Aa[:, :-1, :] * carry[:, None, :],
            ],
            axis=1,
        )  # [N, nt, D]
        h_all = (b4 + a4 * e[:, :, None, :]).reshape(N, S, D)
        # static (non-negative) index: Mosaic has no dynamic_slice
        last = ntiles - 1
        new_carry = Bb[:, last, :] + Aa[:, last, :] * carry
        return h_all, new_carry

    parts = []
    for ti in range(ntiles):
        sl = slice(ti * TILE, (ti + 1) * TILE)
        h_tile = b_sc[:, sl, :] + a_sc[:, sl, :] * carry[:, None, :]
        parts.append(h_tile)
        carry = h_tile[:, TILE - 1, :]
    h_all = jnp.concatenate(parts, axis=1) if ntiles > 1 else parts[0]
    return h_all, carry


def _scan_kernel(u_ref, dl_ref, b_ref, c_ref, a_ref, d_ref, bias_ref, y_ref,
                 hout_ref, hb_ref, h_ref, *, chunk: int, softplus: bool,
                 seq_len: int, padded: bool):
    """One grid step = one (L-chunk, direction-group) cell; grid is (C, G)
    with G innermost so each group's state streams through all its chunks.

    Shapes: u_ref, dl_ref, y_ref: [1, S, D]; b_ref, c_ref: [1, S, N];
    a_ref: [1, N, D]; d_ref, bias_ref: [1, 1, D]; hout_ref: [1, N, D];
    hb_ref (chunk-entry states, for the backward): [1, 1, N, D];
    h_ref (scratch): [G, N, D].
    """
    S = chunk
    g = pl.program_id(1)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[g] = jnp.zeros_like(h_ref[g])

    TILE = min(8, S)
    ntiles = S // TILE
    local_idx = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1) % TILE

    u, _, dl, _, bmat, cmat = _chunk_inputs(
        u_ref, dl_ref, b_ref, c_ref, bias_ref, pl.program_id(0),
        softplus=softplus, padded=padded, seq_len=seq_len, chunk=S,
    )
    a_g = a_ref[0]  # [N, D]

    # per-step transitions, vectorized over the whole chunk
    abar = jnp.exp(dl[None, :, :] * a_g[:, None, :])  # [N, S, D]
    bbar = (dl * u)[None, :, :] * bmat  # [N, S, D]

    a_sc, b_sc = _tile_scan(abar, bbar, TILE, local_idx)

    h_in = h_ref[g]  # [N, D] chunk-entry state
    hb_ref[0, 0] = h_in
    h_all, carry = _resolve_tiles(a_sc, b_sc, h_in, TILE, ntiles)
    y = jnp.sum(h_all * cmat, axis=0)
    y_ref[0] = (y + d_ref[0] * u).astype(y_ref.dtype)

    h_ref[g] = carry
    hout_ref[0] = carry


@functools.partial(jax.jit, static_argnames=("delta_softplus",))
def _pallas_fwd(u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus):
    """u, delta: [B,K,L,D]; A: [K,D,N]; Bmat,Cmat: [B,K,L,N]; Dskip,bias: [K,D].

    Returns (y: [B,K,L,D] in u.dtype, h_last: [B,K,D,N] fp32,
    h_bounds: [G, C, N, D] fp32 chunk-entry states for the backward).
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

    hb_spec = pl.BlockSpec(
        (1, 1, N, D), lambda c, g: (g, c, 0, 0), memory_space=pltpu.VMEM
    )

    y, h_last, h_bounds = pl.pallas_call(
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
        out_specs=(spec_sd, per_g(N, D), hb_spec),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lp, D), io_dtype),
            jax.ShapeDtypeStruct((G, N, D), f32),
            jax.ShapeDtypeStruct((G, C, N, D), f32),
        ),
        scratch_shapes=[pltpu.VMEM((G, N, D), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int((8 + 5 * math.log2(max(S, 2))) * C * S * G * N * D),
            bytes_accessed=(3 * C * G * S * D + 2 * C * G * N * S) * 4,
            transcendentals=C * S * G * N * D,
        ),
    )(u_c, dl_c, b_c, c_c, a_g, d_g, bias_g)

    y = y[:, :L]
    h_last = h_last.reshape(B, K, N, D).transpose(0, 1, 3, 2)  # [B,K,D,N]
    return y.reshape(B, K, L, D), h_last, h_bounds


def _scan_bwd_kernel(u_ref, dl_ref, b_ref, c_ref, a_ref, d_ref, bias_ref,
                     hb_ref, dy_ref,
                     gu_ref, gdl_ref, gb_ref, gc_ref, ga_ref, gd_ref,
                     gbias_ref, ghz_ref,
                     *, chunk: int, softplus: bool, seq_len: int,
                     padded: bool):
    """Backward grid cell (chunks visited in REVERSE via the index maps).

    Recomputes the chunk's state trajectory from the saved entry state, runs
    the adjoint recurrence  gh_t = C_t (x) dy_t + abar_{t+1} gh_{t+1}  as a
    flipped tile-scan, and accumulates parameter gradients in revisited
    output blocks (mirrors selective_scan_cuda.bwd, reference
    src/emamba2.py:161-179, but with chunk recompute instead of saved x).

    ghz_ref (scratch [G, N, D]): the carried  abar_first * gh_first  of the
    later chunk.
    """
    S = chunk
    g = pl.program_id(1)
    crev = pl.program_id(0)
    nchunks = pl.num_programs(0)

    @pl.when(crev == 0)
    def _init():
        ghz_ref[g] = jnp.zeros_like(ghz_ref[g])

    TILE = min(8, S)
    ntiles = S // TILE
    local_idx = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1) % TILE

    u, dl_raw, dl, valid, bmat, cmat = _chunk_inputs(
        u_ref, dl_ref, b_ref, c_ref, bias_ref, nchunks - 1 - crev,
        softplus=softplus, padded=padded, seq_len=seq_len, chunk=S,
    )
    a_g = a_ref[0]  # [N, D]
    dy = dy_ref[0].astype(jnp.float32)  # [S, D]

    abar = jnp.exp(dl[None, :, :] * a_g[:, None, :])  # [N, S, D]
    bbar = (dl * u)[None, :, :] * bmat

    # recompute the forward trajectory from the saved chunk-entry state
    a_sc, b_sc = _tile_scan(abar, bbar, TILE, local_idx)
    h_in = hb_ref[0, 0]  # [N, D]
    h_all, _ = _resolve_tiles(a_sc, b_sc, h_in, TILE, ntiles)
    h_prev = jnp.concatenate([h_in[:, None, :], h_all[:, : S - 1, :]], axis=1)

    # adjoint recurrence as a suffix tile-scan (Mosaic has no `rev`):
    #   gh_t = q_t + w_t gh_{t+1},  q_t = C_t (x) dy_t,  w_t = abar_{t+1}
    # (the incoming chunk carry z = abar_first * gh_first of the LATER
    # chunk folds into q at the last step, so w_{S-1} is never used)
    q = cmat * dy[None, :, :]  # [N, S, D]
    w = jnp.concatenate(
        [abar[:, 1:, :], jnp.ones_like(abar[:, :1, :])], axis=1
    )
    q = jnp.concatenate(
        [q[:, : S - 1, :], q[:, S - 1 :, :] + ghz_ref[g][:, None, :]], axis=1
    )
    w_sc, q_sc = _tile_scan_rev(w, q, TILE, local_idx)
    gh = _resolve_tiles_rev(w_sc, q_sc, TILE, ntiles)  # [N, S, D]

    # out-carry for the previous (earlier) chunk
    ghz_ref[g] = abar[:, 0, :] * gh[:, 0, :]

    # gradients
    dlu = dl * u  # [S, D]
    sB = jnp.sum(gh * bmat, axis=0)  # [S, D]
    gu = d_ref[0] * dy + dl * sB
    ghh = gh * h_prev  # [N, S, D]
    gdlp = u * sB + jnp.sum(ghh * abar * a_g[:, None, :], axis=0)
    if softplus:
        gdelta = gdlp * jax.nn.sigmoid(dl_raw)
    else:
        gdelta = gdlp
    if padded:
        gdelta = gdelta * valid
    gu_ref[0] = gu.astype(gu_ref.dtype)
    gdl_ref[0] = gdelta.astype(gdl_ref.dtype)

    # [N, S] -> [S, N] small transposes for the per-step B/C grads
    gb = jnp.sum(gh * dlu[None, :, :], axis=2)  # [N, S]
    gc = jnp.sum(h_all * dy[None, :, :], axis=2)  # [N, S]
    gb_ref[0] = jnp.swapaxes(gb, 0, 1).astype(gb_ref.dtype)
    gc_ref[0] = jnp.swapaxes(gc, 0, 1).astype(gc_ref.dtype)

    # per-chunk partials (reduced over chunks outside the kernel — Mosaic
    # does not preserve interleaved revisited output blocks)
    ga_ref[0, 0] = jnp.sum(ghh * abar * dl[None, :, :], axis=1)  # [N, D]
    gd_ref[0, 0] = jnp.sum(dy * u, axis=0, keepdims=True)  # [1, D]
    gbias_ref[0, 0] = jnp.sum(gdelta, axis=0, keepdims=True)  # [1, D]


@functools.partial(jax.jit, static_argnames=("delta_softplus",))
def _pallas_bwd(u, delta, A, Bmat, Cmat, Dskip, delta_bias, h_bounds, dy,
                delta_softplus):
    """Pallas backward pass.  Returns cotangents for
    (u, delta, A, Bmat, Cmat, Dskip, delta_bias)."""
    B, K, L, D = u.shape
    N = A.shape[-1]
    G = B * K
    S = _pick_chunk(G, D, N, L)
    pad = (-L) % S
    Lp = L + pad
    C = Lp // S

    f32 = jnp.float32
    io_dtype = u.dtype

    def to_gld(x):
        x = x.reshape(G, L, -1).astype(io_dtype)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    u_c, dl_c = to_gld(u), to_gld(delta)
    b_c, c_c = to_gld(Bmat), to_gld(Cmat)
    dy_c = to_gld(dy)

    a_g = jnp.broadcast_to(
        jnp.transpose(A.astype(f32), (0, 2, 1))[None], (B, K, N, D)
    ).reshape(G, N, D)
    d_g = jnp.broadcast_to(Dskip.astype(f32)[None], (B, K, D)).reshape(G, 1, D)
    bias_g = jnp.broadcast_to(
        delta_bias.astype(f32)[None], (B, K, D)
    ).reshape(G, 1, D)

    kernel = functools.partial(
        _scan_bwd_kernel,
        chunk=S,
        softplus=delta_softplus,
        seq_len=L,
        padded=bool(pad),
    )

    rev = lambda c: C - 1 - c
    spec_sd = pl.BlockSpec(
        (1, S, D), lambda c, g: (g, rev(c), 0), memory_space=pltpu.VMEM
    )
    spec_sn = pl.BlockSpec(
        (1, S, N), lambda c, g: (g, rev(c), 0), memory_space=pltpu.VMEM
    )
    per_g = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda c, g: (g,) + (0,) * len(dims),
        memory_space=pltpu.VMEM,
    )
    hb_spec = pl.BlockSpec(
        (1, 1, N, D), lambda c, g: (g, rev(c), 0, 0), memory_space=pltpu.VMEM
    )
    per_cg = lambda *dims: pl.BlockSpec(
        (1, 1) + dims, lambda c, g: (g, rev(c)) + (0,) * len(dims),
        memory_space=pltpu.VMEM,
    )

    gu, gdl, gb, gc, ga, gd, gbias = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(C, G),
        in_specs=[
            spec_sd,  # u
            spec_sd,  # delta
            spec_sn,  # B
            spec_sn,  # C
            per_g(N, D),  # A
            per_g(1, D),  # D skip
            per_g(1, D),  # delta bias
            hb_spec,  # chunk-entry states
            spec_sd,  # dy
        ],
        out_specs=(
            spec_sd,  # gu
            spec_sd,  # gdelta
            spec_sn,  # gB
            spec_sn,  # gC
            per_cg(N, D),  # gA per-chunk partials
            per_cg(1, D),  # gD per-chunk partials
            per_cg(1, D),  # gbias per-chunk partials
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lp, D), io_dtype),
            jax.ShapeDtypeStruct((G, Lp, D), io_dtype),
            jax.ShapeDtypeStruct((G, Lp, N), io_dtype),
            jax.ShapeDtypeStruct((G, Lp, N), io_dtype),
            jax.ShapeDtypeStruct((G, C, N, D), f32),
            jax.ShapeDtypeStruct((G, C, 1, D), f32),
            jax.ShapeDtypeStruct((G, C, 1, D), f32),
        ),
        scratch_shapes=[pltpu.VMEM((G, N, D), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(u_c, dl_c, b_c, c_c, a_g, d_g, bias_g, h_bounds, dy_c)

    def from_gld(x, feat):
        return x[:, :L].reshape(B, K, L, feat)

    gu = from_gld(gu, D).astype(u.dtype)
    gdl = from_gld(gdl, D).astype(delta.dtype)
    gb = from_gld(gb, N).astype(Bmat.dtype)
    gc = from_gld(gc, N).astype(Cmat.dtype)
    # per-(b,k,chunk) partials -> parameter shapes (sum over batch and chunks)
    ga = ga.sum(1).reshape(B, K, N, D).sum(0).transpose(0, 2, 1).astype(A.dtype)
    gd = gd.sum(1).reshape(B, K, D).sum(0).astype(Dskip.dtype)
    gbias = gbias.sum(1).reshape(B, K, D).sum(0).astype(delta_bias.dtype)
    return gu, gdl, ga, gb, gc, gd, gbias


# ---------------------------------------------------------------------------
# Fused-projection forward: the SS2D x_dbl / dt projections run INSIDE the
# scan kernel as per-chunk MXU matmuls, so delta/B/C never exist in HBM
# (the reference materializes all of them around selective_scan_cuda,
# src/emamba2.py:335-357).  The dt low-rank factorization is pre-folded into
# one [D, D] matrix outside (delta = (x Wx_dt) Wdt == x (Wx_dt Wdt)), which
# keeps every in-kernel slice lane-aligned.
# ---------------------------------------------------------------------------


def _scan_kernel_fused(x_ref, wd_ref, wb_ref, wc_ref, a_ref, d_ref, bias_ref,
                       y_ref, hout_ref, hb_ref, h_ref, *, chunk: int,
                       softplus: bool, seq_len: int, padded: bool):
    """Grid cell like :func:`_scan_kernel` but with in-kernel projections.

    x_ref: [1, S, D] (post-conv activations = scan input u);
    wd_ref: [1, D, D] folded delta weight; wb_ref, wc_ref: [1, D, N];
    a_ref: [1, N, D]; d_ref, bias_ref: [1, 1, D].
    """
    S = chunk
    g = pl.program_id(1)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[g] = jnp.zeros_like(h_ref[g])

    TILE = min(8, S)
    ntiles = S // TILE
    local_idx = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1) % TILE

    x_io = x_ref[0]  # [S, D] in io dtype (keeps the MXU in bf16 when bf16)
    u = x_io.astype(jnp.float32)
    dl_raw = (
        jax.lax.dot_general(
            x_io, wd_ref[0].astype(x_io.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias_ref[0]
    )  # [S, D]
    dl = jax.nn.softplus(dl_raw) if softplus else dl_raw
    if padded:
        base = pl.program_id(0) * S
        step_ids = base + jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        dl = dl * (step_ids < seq_len).astype(jnp.float32)
    bmat_sn = jax.lax.dot_general(
        x_io, wb_ref[0].astype(x_io.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S, N]
    cmat_sn = jax.lax.dot_general(
        x_io, wc_ref[0].astype(x_io.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    bmat = jnp.swapaxes(bmat_sn, 0, 1)[:, :, None]  # [N, S, 1]
    cmat = jnp.swapaxes(cmat_sn, 0, 1)[:, :, None]
    a_g = a_ref[0]  # [N, D]

    abar = jnp.exp(dl[None, :, :] * a_g[:, None, :])  # [N, S, D]
    bbar = (dl * u)[None, :, :] * bmat

    a_sc, b_sc = _tile_scan(abar, bbar, TILE, local_idx)
    h_in = h_ref[g]
    hb_ref[0, 0] = h_in
    h_all, carry = _resolve_tiles(a_sc, b_sc, h_in, TILE, ntiles)
    y = jnp.sum(h_all * cmat, axis=0)
    y_ref[0] = (y + d_ref[0] * u).astype(y_ref.dtype)

    h_ref[g] = carry
    hout_ref[0] = carry


@functools.partial(jax.jit, static_argnames=("delta_softplus",))
def _pallas_fwd_fused(xs, w_delta, w_b, w_c, A, Dskip, delta_bias,
                      delta_softplus):
    """xs: [B,K,L,D]; w_delta: [K,D,D]; w_b, w_c: [K,D,N]; A: [K,D,N];
    Dskip, delta_bias: [K,D].  Returns (y, h_last, h_bounds)."""
    B, K, L, D = xs.shape
    N = A.shape[-1]
    G = B * K

    S = _pick_chunk(G, D, N, L)
    pad = (-L) % S
    Lp = L + pad
    C = Lp // S
    f32 = jnp.float32
    io_dtype = xs.dtype

    x_c = xs.reshape(G, L, D)
    if pad:
        x_c = jnp.pad(x_c, ((0, 0), (0, pad), (0, 0)))

    a_g = jnp.transpose(A.astype(f32), (0, 2, 1))  # [K, N, D]
    d_g = Dskip.astype(f32)[:, None, :]  # [K, 1, D]
    bias_g = delta_bias.astype(f32)[:, None, :]

    kernel = functools.partial(
        _scan_kernel_fused, chunk=S, softplus=delta_softplus, seq_len=L,
        padded=bool(pad),
    )
    grid = (C, G)
    spec_sd = pl.BlockSpec(
        (1, S, D), lambda c, g: (g, c, 0), memory_space=pltpu.VMEM
    )
    # per-direction weights: k = g % K (g = b * K + k)
    per_k = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda c, g: (g % K,) + (0,) * len(dims),
        memory_space=pltpu.VMEM,
    )
    per_g = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda c, g: (g,) + (0,) * len(dims),
        memory_space=pltpu.VMEM,
    )
    hb_spec = pl.BlockSpec(
        (1, 1, N, D), lambda c, g: (g, c, 0, 0), memory_space=pltpu.VMEM
    )

    import math

    y, h_last, h_bounds = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            spec_sd,          # xs
            per_k(D, D),      # folded delta weight
            per_k(D, N),      # B projection
            per_k(D, N),      # C projection
            per_k(N, D),      # A
            per_k(1, D),      # D skip
            per_k(1, D),      # delta bias
        ],
        out_specs=(spec_sd, per_g(N, D), hb_spec),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lp, D), io_dtype),
            jax.ShapeDtypeStruct((G, N, D), f32),
            jax.ShapeDtypeStruct((G, C, N, D), f32),
        ),
        scratch_shapes=[pltpu.VMEM((G, N, D), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(
                (8 + 5 * math.log2(max(S, 2))) * C * S * G * N * D
                + 2 * G * L * D * (D + 2 * N)
            ),
            bytes_accessed=2 * G * L * D * (2 if io_dtype == jnp.bfloat16 else 4),
            transcendentals=C * S * G * N * D,
        ),
    )(x_c, w_delta, w_b, w_c, a_g, d_g, bias_g)

    y = y[:, :L].reshape(B, K, L, D)
    h_last = h_last.reshape(B, K, N, D).transpose(0, 1, 3, 2)
    return y, h_last, h_bounds


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _selective_scan_pallas_fused(xs, w_delta, w_b, w_c, A, Dskip, delta_bias,
                                 delta_softplus):
    y, _, _ = _pallas_fwd_fused(xs, w_delta, w_b, w_c, A, Dskip, delta_bias,
                                delta_softplus)
    return y


def _ssf_fwd(xs, w_delta, w_b, w_c, A, Dskip, delta_bias, delta_softplus):
    y, _, h_bounds = _pallas_fwd_fused(
        xs, w_delta, w_b, w_c, A, Dskip, delta_bias, delta_softplus
    )
    return y, (xs, w_delta, w_b, w_c, A, Dskip, delta_bias, h_bounds)


def _ssf_bwd(delta_softplus, residuals, g):
    """Backward: rematerialize delta/B/C (training only), reuse the Pallas
    scan backward, then chain through the projections with einsums."""
    xs, w_delta, w_b, w_c, A, Dskip, delta_bias, h_bounds = residuals
    delta = jnp.einsum("bkld,kde->bkle", xs, w_delta.astype(xs.dtype))
    Bmat = jnp.einsum("bkld,kdn->bkln", xs, w_b.astype(xs.dtype))
    Cmat = jnp.einsum("bkld,kdn->bkln", xs, w_c.astype(xs.dtype))
    gu, gdl, ga, gb, gc, gd, gbias = _pallas_bwd(
        xs, delta, A, Bmat, Cmat, Dskip, delta_bias, h_bounds, g,
        delta_softplus,
    )
    gxs = (
        gu
        + jnp.einsum("bkle,kde->bkld", gdl, w_delta.astype(gdl.dtype))
        + jnp.einsum("bkln,kdn->bkld", gb, w_b.astype(gb.dtype))
        + jnp.einsum("bkln,kdn->bkld", gc, w_c.astype(gc.dtype))
    )
    gwd = jnp.einsum("bkld,bkle->kde", xs, gdl).astype(w_delta.dtype)
    gwb = jnp.einsum("bkld,bkln->kdn", xs, gb).astype(w_b.dtype)
    gwc = jnp.einsum("bkld,bkln->kdn", xs, gc).astype(w_c.dtype)
    return gxs.astype(xs.dtype), gwd, gwb, gwc, ga, gd, gbias


_selective_scan_pallas_fused.defvjp(_ssf_fwd, _ssf_bwd)


def selective_scan_pallas_fused(
    xs, x_proj_weight, dt_projs_weight, A, Dskip, delta_bias,
    dt_rank: int, d_state: int, delta_softplus: bool = True,
):
    """SS2D fused core: ``cross_selective_scan`` minus scan/merge layout
    (reference src/emamba2.py:335-357) in one kernel.

    xs: [B,K,L,D] decimated scan sequences; x_proj_weight: [K, R+2N, D];
    dt_projs_weight: [K, D, R].  Returns y: [B,K,L,D].
    """
    R, N = dt_rank, d_state
    wx = x_proj_weight
    # fold the dt low-rank pair into one [D, D] matrix:
    # delta = (x @ Wx_dt^T) @ Wdt^T  ==  x @ (Wx_dt^T Wdt^T)
    w_delta = jnp.einsum("krd,ker->kde", wx[:, :R, :], dt_projs_weight)
    w_b = jnp.transpose(wx[:, R : R + N, :], (0, 2, 1))  # [K, D, N]
    w_c = jnp.transpose(wx[:, R + N : R + 2 * N, :], (0, 2, 1))
    return _selective_scan_pallas_fused(
        xs,
        w_delta.astype(xs.dtype),
        w_b.astype(xs.dtype),
        w_c.astype(xs.dtype),
        A,
        Dskip,
        delta_bias,
        delta_softplus,
    )


# ---------------------------------------------------------------------------
# Image-direct fused scan: reads the FOUR decimated direction sequences
# straight out of the NHWC activation via strided block DMA (a
# [B, H/2, 2, W/2, 2, D] view), so EfficientScan never materializes
# (reference src/emamba2.py:182-234 is an explicit strided copy).  Two
# pallas_calls: row-major dirs (0, 2) chunk over row blocks; column-major
# dirs (1, 3) chunk over column blocks with an in-VMEM transpose.  Outputs
# stay in per-orientation sequence layout for the fused epilogue.
# ---------------------------------------------------------------------------


_TILE_TARGET = int(_os.environ.get("FOUNDDIFF_TILE", "0"))


def _pick_tile(S: int, D: int = 0) -> int:
    """Hillis-Steele tile length.  TILE=8 everywhere: the r4 D-aware rule
    (16 at D<=128) won standalone device-loop timing (s0 49.97->48.29,
    s1 34.33->32.16 ms/call) but was an IN-MODEL regression at the serving
    batch — full-model bench r5: TILE=8 0.7739 vs D-aware 0.7676
    slices/sec (DDIM-50 512^2 bs16).  Same lesson as the r4 GN stats:
    standalone kernel wins don't survive surrounding-fusion changes;
    nothing ships as default without a full-model bench.  FOUNDDIFF_TILE
    forces a global value for sweeps."""
    target = _TILE_TARGET if _TILE_TARGET else 8
    t = min(target, S)
    while S % t:
        t //= 2
    return max(t, 1)


def _pick_image_s(major: int, minor: int, D: int, N: int, B: int,
                  col_major: bool) -> int:
    """Column-block length (in major-dim units) for the image-direct scan.
    For the col orientation, Mosaic requires the x-block's second-minor dim
    (s) to be a multiple of 8 or the full dim.  Returns 0 when no legal
    choice exists (callers fall back to the decimated fused kernel)."""
    target = _pick_chunk(2 * B, D, N, major * minor)
    s = max(1, min(major, target // max(minor, 1)))
    while major % s:
        s -= 1
    if col_major and s % 8 and s != major:
        s = major if major < 8 else 8
        while s > 1 and major % s:
            s //= 2
        if s % 8 and s != major:
            return 0
    return s


def _scan_kernel_image(x_ref, wd_ref, wb_ref, wc_ref, a_ref, d_ref, bias_ref,
                       y_ref, h_ref, *, chunk: int, softplus: bool,
                       col_major: bool, D: int):
    """One grid cell scans BOTH pixel-parity directions of one orientation
    (their inputs share lanes: the pixel-pair dim is merged into the lane
    axis, so the block DMA is perfectly shaped and x is read once for two
    directions).

    Row variant: x_ref [1, s, 1, W2, 2D] (pi=0 plane),
                 y_ref [1, 2, s, W2, D].
    Col variant: x_ref [1, H2, 1, s, 2D] (pi=1 plane),
                 y_ref [1, 2, s, H2, D].
    Weight refs hold the two directions stacked: e.g. wd_ref [1, 2, D, D].
    Scratch h_ref: [B, 2, N, D]."""
    S = chunk
    b = pl.program_id(1)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[b] = jnp.zeros_like(h_ref[b])

    TILE = _pick_tile(S, D)
    ntiles = S // TILE
    local_idx = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1) % TILE

    t = x_ref[0, :, 0, :, :]  # [s, W2, 2D] or [H2, s, 2D]
    if col_major:
        t = jnp.swapaxes(t, 0, 1)  # -> [s, H2, 2D] (w-major sequence)
    pair = t.reshape(S, 2 * D)

    for j in (0, 1):
        x_io = pair[:, j * D : (j + 1) * D]  # lane-aligned static slice
        u = x_io.astype(jnp.float32)
        dl_raw = (
            jax.lax.dot_general(
                x_io, wd_ref[0, j].astype(x_io.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bias_ref[0, j]
        )
        dl = jax.nn.softplus(dl_raw) if softplus else dl_raw
        bmat = jnp.swapaxes(
            jax.lax.dot_general(
                x_io, wb_ref[0, j].astype(x_io.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ), 0, 1,
        )[:, :, None]
        cmat = jnp.swapaxes(
            jax.lax.dot_general(
                x_io, wc_ref[0, j].astype(x_io.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ), 0, 1,
        )[:, :, None]
        a_g = a_ref[0, j]

        abar = jnp.exp(dl[None, :, :] * a_g[:, None, :])
        bbar = (dl * u)[None, :, :] * bmat
        a_sc, b_sc = _tile_scan(abar, bbar, TILE, local_idx)
        h_all, carry = _resolve_tiles(a_sc, b_sc, h_ref[b, j], TILE, ntiles)
        y = jnp.sum(h_all * cmat, axis=0) + d_ref[0, j] * u
        y_ref[0, j] = y.reshape(y_ref.shape[2:]).astype(y_ref.dtype)
        h_ref[b, j] = carry


def _image_call(x5, w_delta, w_b, w_c, a_k, d_k, bias_k, *, col_major: bool,
                softplus: bool):
    """One orientation (both pixel-parity directions).
    x5: [B, H2, 2, W2, 2*D] (pixel-pair dim merged into lanes);
    weights stacked per orientation, e.g. w_delta [2, D, D].
    Returns [B, 2, L, D] sequences in that orientation's layout."""
    B, H2, _, W2, DD = x5.shape
    D = DD // 2
    N = a_k.shape[1]  # a_k is [2, N, D]
    L = H2 * W2
    minor = H2 if col_major else W2
    major = W2 if col_major else H2
    s = _pick_image_s(major, minor, D, N, B, col_major)
    assert s > 0, "caller must gate on image_scan_vmem_ok"
    S = s * minor
    C = major // s

    if col_major:
        x_spec = pl.BlockSpec(
            (1, H2, 1, s, 2 * D), lambda c, b: (b, 0, 1, c, 0),
            memory_space=pltpu.VMEM,
        )
        y_shape = (B, 2, W2, H2, D)
        y_spec = pl.BlockSpec(
            (1, 2, s, H2, D), lambda c, b: (b, 0, c, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        x_spec = pl.BlockSpec(
            (1, s, 1, W2, 2 * D), lambda c, b: (b, c, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        y_shape = (B, 2, H2, W2, D)
        y_spec = pl.BlockSpec(
            (1, 2, s, W2, D), lambda c, b: (b, 0, c, 0, 0),
            memory_space=pltpu.VMEM,
        )

    per_k = lambda *dims: pl.BlockSpec(
        (1, 2) + dims, lambda c, b: (0, 0) + (0,) * len(dims),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _scan_kernel_image, chunk=S, softplus=softplus, col_major=col_major,
        D=D,
    )
    y = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(C, B),
        in_specs=[
            x_spec,
            per_k(D, D), per_k(D, N), per_k(D, N),
            per_k(N, D), per_k(1, D), per_k(1, D),
        ],
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct(y_shape, x5.dtype),
        scratch_shapes=[pltpu.VMEM((B, 2, N, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(60 * B * L * N * D + 4 * B * L * D * (D + 2 * N)),
            bytes_accessed=3 * B * L * D * 2 * x5.dtype.itemsize,
            transcendentals=2 * B * L * N * D,
        ),
    )(
        x5, w_delta[None], w_b[None], w_c[None], a_k[None], d_k[None],
        bias_k[None],
    )
    return y.reshape(B, 2, L, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _scan_image(x, w_delta, w_b, w_c, A, Dskip, delta_bias, delta_softplus):
    B, H, W, D = x.shape
    # pixel-pair dim merged into lanes: free view, lane-aligned splits
    x5 = x.reshape(B, H // 2, 2, W // 2, 2 * D)
    a_k = jnp.transpose(A.astype(jnp.float32), (0, 2, 1))  # [K, N, D]
    d_k = Dskip.astype(jnp.float32)[:, None, :]
    bias_k = delta_bias.astype(jnp.float32)[:, None, :]
    rows_idx = jnp.asarray([0, 2])  # dirs (pi=0): row-major
    cols_idx = jnp.asarray([1, 3])  # dirs (pi=1): column-major
    pick = lambda w, idx: w[idx]
    ys_rows = _image_call(
        x5, pick(w_delta, rows_idx), pick(w_b, rows_idx),
        pick(w_c, rows_idx), pick(a_k, rows_idx), pick(d_k, rows_idx),
        pick(bias_k, rows_idx), col_major=False, softplus=delta_softplus,
    )
    ys_cols = _image_call(
        x5, pick(w_delta, cols_idx), pick(w_b, cols_idx),
        pick(w_c, cols_idx), pick(a_k, cols_idx), pick(d_k, cols_idx),
        pick(bias_k, cols_idx), col_major=True, softplus=delta_softplus,
    )
    return ys_rows, ys_cols


def _scan_image_fwd(x, w_delta, w_b, w_c, A, Dskip, delta_bias,
                    delta_softplus):
    out = _scan_image(x, w_delta, w_b, w_c, A, Dskip, delta_bias,
                      delta_softplus)
    return out, (x, w_delta, w_b, w_c, A, Dskip, delta_bias)


def _scan_image_bwd(delta_softplus, residuals, g):
    """Training path: rematerialize the decimated layout + projections and
    reuse the [B,K,L,D] Pallas backward; the pixel gradient reassembles via
    the (bijective) EfficientMerge permutation."""
    from founddiff_tpu.ops.selective_scan import efficient_merge, efficient_scan

    x, w_delta, w_b, w_c, A, Dskip, delta_bias = residuals
    g_rows, g_cols = g
    B, H, W, D = x.shape
    xs = efficient_scan(x, 2)  # [B, 4, L, D]
    g_all = jnp.stack(
        [g_rows[:, 0], g_cols[:, 0], g_rows[:, 1], g_cols[:, 1]], axis=1
    )
    delta = jnp.einsum("bkld,kde->bkle", xs, w_delta.astype(xs.dtype))
    Bmat = jnp.einsum("bkld,kdn->bkln", xs, w_b.astype(xs.dtype))
    Cmat = jnp.einsum("bkld,kdn->bkln", xs, w_c.astype(xs.dtype))
    _, _, h_bounds = _pallas_fwd(xs, delta, A, Bmat, Cmat, Dskip, delta_bias,
                                 delta_softplus)
    gu, gdl, ga, gb, gc, gd, gbias = _pallas_bwd(
        xs, delta, A, Bmat, Cmat, Dskip, delta_bias, h_bounds, g_all,
        delta_softplus,
    )
    gxs = (
        gu
        + jnp.einsum("bkle,kde->bkld", gdl, w_delta.astype(gdl.dtype))
        + jnp.einsum("bkln,kdn->bkld", gb, w_b.astype(gb.dtype))
        + jnp.einsum("bkln,kdn->bkld", gc, w_c.astype(gc.dtype))
    )
    gx = efficient_merge(gxs, H, W, 2).astype(x.dtype)
    gwd = jnp.einsum("bkld,bkle->kde", xs, gdl).astype(w_delta.dtype)
    gwb = jnp.einsum("bkld,bkln->kdn", xs, gb).astype(w_b.dtype)
    gwc = jnp.einsum("bkld,bkln->kdn", xs, gc).astype(w_c.dtype)
    return gx, gwd, gwb, gwc, ga, gd, gbias


_scan_image.defvjp(_scan_image_fwd, _scan_image_bwd)


def image_scan_vmem_ok(H: int, W: int, d_inner: int, d_state: int) -> bool:
    """Whether the image-direct kernels have a Mosaic-legal column block at
    this shape AND the column-orientation chunk fits the VMEM budget; deeper
    UNet scales (and awkward grids) fall back to the decimate + [B,K,L,D]
    fused kernel.  (_pick_chunk ignores the group count, so B=1 here picks
    the same s as the kernel launch.)"""
    H2, W2 = H // 2, W // 2
    s_row = _pick_image_s(H2, W2, d_inner, d_state, 1, col_major=False)
    s_col = _pick_image_s(W2, H2, d_inner, d_state, 1, col_major=True)
    if not (s_row and s_col):
        return False
    S = s_col * H2
    # measured scoped usage runs ~1.3x this estimate; keep well under the
    # 64 MB kernel limit
    return 4 * d_state * S * d_inner * 4 <= 40 * 1024 * 1024


def selective_scan_image(
    x, x_proj_weight, dt_projs_weight, A, Dskip, delta_bias,
    dt_rank: int, d_state: int, delta_softplus: bool = True,
):
    """SS2D core straight from the NHWC image: decimation happens in the
    kernels' block DMA, never in HBM.  x: [B, H, W, D] (even H, W).
    Returns (ys_rows [B,2,L,D] dirs (0,2), ys_cols [B,2,L,D] dirs (1,3))
    in the layouts :func:`founddiff_tpu.ops.ss2d_fused.merge_ln_gate_split`
    consumes."""
    R, N = dt_rank, d_state
    wx = x_proj_weight
    w_delta = jnp.einsum("krd,ker->kde", wx[:, :R, :], dt_projs_weight)
    w_b = jnp.transpose(wx[:, R : R + N, :], (0, 2, 1))
    w_c = jnp.transpose(wx[:, R + N : R + 2 * N, :], (0, 2, 1))
    return _scan_image(
        x, w_delta.astype(x.dtype), w_b.astype(x.dtype), w_c.astype(x.dtype),
        A, Dskip, delta_bias, delta_softplus,
    )


_BWD_IMPL = "pallas"  # 'pallas' | 'xla' (chunked remat fallback)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _selective_scan_pallas(u, delta, A, Bmat, Cmat, Dskip, delta_bias,
                           delta_softplus):
    y, _, _ = _pallas_fwd(u, delta, A, Bmat, Cmat, Dskip, delta_bias,
                          delta_softplus)
    return y


def _ss_fwd(u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus):
    y, _, h_bounds = _pallas_fwd(u, delta, A, Bmat, Cmat, Dskip, delta_bias,
                                 delta_softplus)
    return y, (u, delta, A, Bmat, Cmat, Dskip, delta_bias, h_bounds)


def _ss_bwd(delta_softplus, residuals, g):
    u, delta, A, Bmat, Cmat, Dskip, delta_bias, h_bounds = residuals
    if _BWD_IMPL == "pallas":
        return _pallas_bwd(
            u, delta, A, Bmat, Cmat, Dskip, delta_bias, h_bounds, g,
            delta_softplus,
        )

    from founddiff_tpu.ops.selective_scan import selective_scan_chunked

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
        y, h_last, _ = _pallas_fwd(
            u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus
        )
        return y, h_last
    return _selective_scan_pallas(
        u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus
    )

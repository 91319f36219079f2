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
    s = max(8, min(512, _VMEM_BUDGET // max(per_step_bytes, 1)))
    p = 1
    while p * 2 <= s:
        p *= 2
    # S must stay a power of two (tiles divide it); shrink toward L to avoid
    # padding waste on short sequences
    while p // 2 >= L and p > 8:
        p //= 2
    return p


def _scan_kernel(u_ref, dl_ref, b_ref, c_ref, a_ref, d_ref, bias_ref, y_ref,
                 hout_ref, h_ref, *, chunk: int, softplus: bool,
                 seq_len: int, padded: bool, groups: int):
    """One grid step = one L-chunk.

    Shapes: u_ref, dl_ref, y_ref: [1, G, S, D]; b_ref, c_ref: [1, G, N, S];
    a_ref: [G, N, D]; d_ref, bias_ref: [G, D]; hout_ref, h_ref: [G, N, D].
    """
    S = chunk

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)

    base = pl.program_id(0) * S
    # mask for trailing padded steps (delta'=0 -> identity transition)
    if padded:
        step_ids = base + jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        valid = (step_ids < seq_len).astype(jnp.float32)  # [S, 1]

    # two-level scan: Hillis-Steele within TILE-step tiles (masks on the
    # local index kill roll wraparound AND cross-tile leakage in one go),
    # then a static-sliced sequential carry across tiles.
    TILE = min(32, S)
    ntiles = S // TILE
    local_idx = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1) % TILE

    for g in range(groups):
        u = u_ref[0, g]  # [S, D]
        dl = dl_ref[0, g] + bias_ref[g][None, :]  # [S, D]
        if softplus:
            dl = jax.nn.softplus(dl)
        if padded:
            dl = dl * valid
        a_g = a_ref[g]  # [N, D]
        bmat = b_ref[0, g][:, :, None]  # [N, S, 1]
        cmat = c_ref[0, g][:, :, None]  # [N, S, 1]

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
        y_ref[0, g] = y + d_ref[g][None, :] * u

        h_ref[g] = carry
        hout_ref[g] = carry


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

    def to_gsd(x):  # [B,K,L,D] -> [C, G, S, D]
        x = x.reshape(G, L, -1)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x = x.reshape(G, C, S, -1).transpose(1, 0, 2, 3)
        return x.astype(f32)

    def to_gns(x):  # [B,K,L,N] -> [C, G, N, S]
        x = x.reshape(G, L, -1)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x = x.reshape(G, C, S, -1).transpose(1, 0, 3, 2)
        return x.astype(f32)

    u_c = to_gsd(u)
    dl_c = to_gsd(delta)
    b_c = to_gns(Bmat)
    c_c = to_gns(Cmat)

    a_g = jnp.broadcast_to(
        jnp.transpose(A.astype(f32), (0, 2, 1))[None], (B, K, N, D)
    ).reshape(G, N, D)
    d_g = jnp.broadcast_to(Dskip.astype(f32)[None], (B, K, D)).reshape(G, D)
    bias_g = jnp.broadcast_to(delta_bias.astype(f32)[None], (B, K, D)).reshape(G, D)

    kernel = functools.partial(
        _scan_kernel,
        chunk=S,
        softplus=delta_softplus,
        seq_len=L,
        padded=bool(pad),
        groups=G,
    )

    grid = (C,)
    chunk_spec_gsd = pl.BlockSpec(
        (1, G, S, D), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    chunk_spec_gns = pl.BlockSpec(
        (1, G, N, S), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    import math

    y, h_last = pl.pallas_call(
        kernel,
        # interpret off-TPU so the same kernel logic is exercised by CPU tests
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            chunk_spec_gsd,  # u
            chunk_spec_gsd,  # delta
            chunk_spec_gns,  # B
            chunk_spec_gns,  # C
            full((G, N, D)),  # A
            full((G, D)),  # D skip
            full((G, D)),  # delta bias
        ],
        out_specs=(chunk_spec_gsd, full((G, N, D))),
        out_shape=(
            jax.ShapeDtypeStruct((C, G, S, D), f32),
            jax.ShapeDtypeStruct((G, N, D), f32),
        ),
        scratch_shapes=[pltpu.VMEM((G, N, D), f32)],
        cost_estimate=pl.CostEstimate(
            flops=int((8 + 5 * math.log2(max(S, 2))) * C * S * G * N * D),
            bytes_accessed=(3 * C * G * S * D + 2 * C * G * N * S) * 4,
            transcendentals=C * S * G * N * D,
        ),
    )(u_c, dl_c, b_c, c_c, a_g, d_g, bias_g)

    y = y.transpose(1, 0, 2, 3).reshape(G, Lp, D)[:, :L]
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

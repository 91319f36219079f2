"""Pallas TPU kernel for the selective scan (Mamba S6 recurrence).

TPU-native replacement for ``selective_scan_cuda.fwd`` (reference
src/emamba2.py:124-179).  Design:

- The scan is sequential in L but fully vectorized over (batch*directions,
  d_state, d_inner): the carried state ``h`` is a ``[G, N, D]`` fp32 VMEM
  tile (G = B*K on the outer axis, N on sublanes, D on lanes; D is always a
  multiple of 128 for the FoundDiff UNet widths 128/256/512/1024).
- L is processed in chunks that ride the Pallas grid; the state persists in a
  VMEM scratch buffer across sequential grid steps while input/output blocks
  are double-buffered HBM<->VMEM by the Pallas pipeline.
- ``delta_bias``/softplus are fused into the kernel (the CUDA kernel does the
  same), so ``delta`` never round-trips through HBM in transformed form.
- Chunk layouts are pre-transposed in XLA so that per-step reads are sublane
  selects for [G, S, D] operands (u, delta) and lane selects for [G, N, S]
  operands (B, C) — both cheap on the VPU.

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

_VMEM_BUDGET = 6 * 1024 * 1024  # conservative per-kernel VMEM target (bytes)


def _pick_chunk(G: int, D: int, L: int) -> int:
    """Chunk length S: 3 fp32 [G,S,D] buffers double-buffered under budget."""
    per_step_bytes = 3 * G * D * 4 * 2
    s = max(8, min(512, _VMEM_BUDGET // max(per_step_bytes, 1)))
    # round down to a power of two for clean tiling
    p = 1
    while p * 2 <= s:
        p *= 2
    return min(p, max(8, L))


def _scan_kernel(u_ref, dl_ref, b_ref, c_ref, a_ref, d_ref, bias_ref, y_ref,
                 hout_ref, h_ref, *, chunk: int, softplus: bool,
                 seq_len: int, padded: bool):
    """One grid step = one L-chunk.  Shapes:
    u_ref, dl_ref, y_ref: [1, G, S, D]; b_ref, c_ref: [1, S, G, N] (step on a
    non-tiled axis — Mosaic cannot dynamically slice the lane dim);
    a_ref: [G, N, D]; d_ref, bias_ref: [G, D]; hout_ref: [G, N, D] (final
    state output); h_ref (scratch): [G, N, D].  ``seq_len`` masks trailing
    padded steps so the carried state is exactly the state at step L.
    """

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)

    a = a_ref[...]  # [G, N, D]
    d_skip = d_ref[...]  # [G, D]
    bias = bias_ref[...]  # [G, D]
    base = pl.program_id(0) * chunk

    def step(s, h):
        u_s = u_ref[0, :, s, :]  # [G, D]
        dl_s = dl_ref[0, :, s, :] + bias  # [G, D]
        if softplus:
            dl_s = jax.nn.softplus(dl_s)
        if padded:
            dl_s = jnp.where(base + s < seq_len, dl_s, 0.0)
        b_s = b_ref[0, s][:, :, None]  # [G, N, 1]
        c_s = c_ref[0, s][:, :, None]  # [G, N, 1]

        abar = jnp.exp(dl_s[:, None, :] * a)  # [G, N, D]
        x_s = (dl_s * u_s)[:, None, :]  # [G, 1, D]
        h = abar * h + x_s * b_s  # [G, N, D]
        y_s = jnp.sum(h * c_s, axis=1) + d_skip * u_s  # [G, D]
        y_ref[0, :, s, :] = y_s
        return h

    h = jax.lax.fori_loop(0, chunk, step, h_ref[...])
    h_ref[...] = h
    hout_ref[...] = h


@functools.partial(jax.jit, static_argnames=("delta_softplus",))
def _pallas_fwd(u, delta, A, Bmat, Cmat, Dskip, delta_bias, delta_softplus):
    """u, delta: [B,K,L,D]; A: [K,D,N]; Bmat,Cmat: [B,K,L,N]; Dskip,bias: [K,D].

    Returns (y: [B,K,L,D] fp32, h_last: [B,K,D,N] fp32).
    """
    B, K, L, D = u.shape
    N = A.shape[-1]
    G = B * K

    S = _pick_chunk(G, D, L)
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

    def to_sgn(x):  # [B,K,L,N] -> [C, S, G, N]
        x = x.reshape(G, L, -1)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x = x.reshape(G, C, S, -1).transpose(1, 2, 0, 3)
        return x.astype(f32)

    u_c = to_gsd(u)
    dl_c = to_gsd(delta)
    b_c = to_sgn(Bmat)
    c_c = to_sgn(Cmat)

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
    )

    grid = (C,)
    chunk_spec_gsd = pl.BlockSpec(
        (1, G, S, D), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    chunk_spec_sgn = pl.BlockSpec(
        (1, S, G, N), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    y, h_last = pl.pallas_call(
        kernel,
        # interpret off-TPU so the same kernel logic is exercised by CPU tests
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            chunk_spec_gsd,  # u
            chunk_spec_gsd,  # delta
            chunk_spec_sgn,  # B
            chunk_spec_sgn,  # C
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
            flops=9 * C * S * G * N * D,
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

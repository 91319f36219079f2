"""Fused SS2D epilogue: EfficientMerge + LayerNorm + z-gate + conditioning.

The reference chains these as separate CUDA ops (merge src/emamba2.py:236-263,
out_norm :357, gating/cond :748-751), and the XLA graph mirrors that with a
merge copy plus 2-3 full-map elementwise passes.  This kernel does the whole
epilogue in ONE pass over HBM:

    out = LayerNorm(merge(ys)) * z + local

- ``ys`` [B, 4, L, C] holds the 4 decimated direction sequences (dirs 1/3 are
  column-major).  The column-major tiles are read via a transposed *view* of
  the same buffer (free reshape) and transposed to row-major inside VMEM —
  the interleave itself happens in registers, never in HBM.
- LayerNorm statistics run in fp32 regardless of io dtype.
- Backward (training) remats through the XLA composition via custom VJP.

step_size == 2 and even H/W only (the shipped FoundDiff config); callers fall
back to the unfused path otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _epilogue_kernel(d0_ref, d1_ref, d2_ref, d3_ref, z_ref, g_ref, b_ref,
                     loc_ref, pw_ref, gate_ref, rx_ref, o_ref, *,
                     eps: float, has_local: bool, gate_silu: bool,
                     fold_proj: bool):
    """One (batch, row-block) cell.
    d0/d2: [1, 1, bh, W2, C] row-major dirs; d1/d3: [1, 1, W2, bh, C]
    column-major dirs; z: [1, bh, 2, W2, 2, C]; g/b: [1, C];
    loc: [1, 1, C].  With ``fold_proj``: pw [1, C, Co] out_proj kernel,
    gate [1, 1, Co] adaLN gate, rx [1, bh, 2, W2, 2, Co] residual, o in Co
    channels — the whole ``x + gate * out_proj(epilogue)`` tail runs here
    so no 128-ch intermediate ever returns to HBM."""
    # out[2i, 2j]=d0, out[2i+1, 2j]=d1, out[2i, 2j+1]=d2, out[2i+1, 2j+1]=d3
    # (reference src/emamba2.py:245-253).  LayerNorm is per-pixel over C, so
    # each direction is processed independently on a small [bh, W2, C] tile
    # and written straight into its (pi, pj) parity plane of the output
    # block — no interleaved intermediate is ever materialized.
    g = g_ref[0].astype(jnp.float32)
    b = b_ref[0].astype(jnp.float32)
    loc = loc_ref[0, 0].astype(jnp.float32) if has_local else None

    def ln(ref, transposed):
        t = ref[0, 0]
        if transposed:
            t = jnp.swapaxes(t, 0, 1)  # [W2, bh, C] -> [bh, W2, C]
        tf = t.astype(jnp.float32)
        mean = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.mean(tf * tf, axis=-1, keepdims=True) - mean * mean
        return (tf - mean) * jax.lax.rsqrt(var + eps) * g + b

    d0n, d1n = ln(d0_ref, False), ln(d1_ref, True)
    d2n, d3n = ln(d2_ref, False), ln(d3_ref, True)
    # interleave in registers: [bh, 2, W2, 2, C] == a contiguous
    # [2bh, W, C] row band (reference merge src/emamba2.py:245-253)
    bh, W2, C = d0n.shape
    row_even = jnp.stack([d0n, d2n], axis=2)  # j-parity
    row_odd = jnp.stack([d1n, d3n], axis=2)
    y = jnp.stack([row_even, row_odd], axis=1)  # i-parity
    y = y.reshape(2 * bh, 2 * W2, C)

    zt = z_ref[0].astype(jnp.float32)  # contiguous [2bh, W, C]
    if gate_silu:
        zt = zt * jax.nn.sigmoid(zt)  # silu folded in (one less pass)
    out = y * zt
    if has_local:
        out = out + loc
    if fold_proj:
        # out_proj on the MXU + adaLN gate + residual add, all in-VMEM
        Co = pw_ref.shape[-1]
        C = out.shape[-1]
        flat = out.reshape(-1, C).astype(pw_ref.dtype)
        proj = jax.lax.dot_general(
            flat, pw_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bh*2*W2*2? , Co] -- out is [2bh, W, C] contiguous
        gate = gate_ref[0, 0].astype(jnp.float32)
        rx = rx_ref[0].astype(jnp.float32).reshape(-1, Co)
        final = rx + gate * proj
        o_ref[0] = final.reshape(o_ref.shape[1:]).astype(o_ref.dtype)
    else:
        o_ref[0] = out.astype(o_ref.dtype)


def _merge_ln_gate_xla(ys, z, scale, bias, local, H, W, eps,
                       gate_silu=False, proj_w=None, gate=None, rx=None):
    """Unfused reference composition (also the VJP path)."""
    from founddiff_tpu.ops.selective_scan import efficient_merge

    y = efficient_merge(ys, H, W, 2)
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(yf * yf, axis=-1, keepdims=True) - mean * mean
    yn = (yf - mean) * jax.lax.rsqrt(var + eps)
    yn = yn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    zf = z.astype(jnp.float32)
    if gate_silu:
        zf = zf * jax.nn.sigmoid(zf)
    out = yn * zf
    if local is not None:
        out = out + local[:, None, None, :].astype(jnp.float32)
    out = out.astype(z.dtype)
    if proj_w is not None:
        proj = jnp.einsum(
            "bhwc,ce->bhwe", out, proj_w.astype(out.dtype),
            preferred_element_type=jnp.float32,
        )
        out = (rx.astype(jnp.float32)
               + gate.astype(jnp.float32)[:, None, None, :] * proj).astype(
            z.dtype)
    return out


def _pick_bh(H2: int, W2: int, C: int) -> int:
    # ~10 live fp32 copies of a [2bh, W, C] tile through the assembly chain;
    # Mosaic needs the col input block's second-minor (bh) to be a multiple
    # of 8 or the full H2.  Returns 0 when no legal block exists (callers
    # fall back to the XLA composition).
    budget = 24 * 1024 * 1024
    bh = max(8, budget // max(80 * W2 * C * 4, 1))
    bh = min(bh, H2)
    while H2 % bh:
        bh -= 1
    if bh % 8 and bh != H2:
        bh = H2 if H2 < 8 else 8
        while H2 % bh:
            bh //= 2
    if bh < 1 or (bh % 8 and bh != H2):
        return 0
    return bh


@functools.partial(jax.jit, static_argnames=("H", "W", "eps", "has_local",
                                             "gate_silu", "row_dirs",
                                             "col_dirs", "fold_proj"))
def _fused_fwd(ys_rows, ys_cols, z, scale, bias, local, proj_w, gate, rx,
               H, W, eps, has_local, gate_silu, row_dirs=(0, 2),
               col_dirs=(1, 3), fold_proj=False):
    """ys_rows: [B, *, H2, W2, C] (row-major dirs at indices ``row_dirs``);
    ys_cols: [B, *, W2, H2, C] (column-major dirs at ``col_dirs``).
    ``fold_proj``: proj_w [C, Co], gate [B, Co], rx [B, H, W, Co] fold the
    MambaBlock tail ``rx + gate * (epilogue @ proj_w)`` into the kernel."""
    B = z.shape[0]
    C = z.shape[-1]
    H2, W2 = H // 2, W // 2
    bh = _pick_bh(H2, W2, C)

    loc = (local if has_local else jnp.zeros((B, C), z.dtype)).reshape(B, 1, C)
    Co = proj_w.shape[-1] if fold_proj else C
    if not fold_proj:
        proj_w = jnp.zeros((C, Co), z.dtype)
        gate = jnp.zeros((B, Co), z.dtype)
        rx = jnp.zeros((B, 1, 1, Co), z.dtype)

    row_spec = lambda d: pl.BlockSpec(
        (1, 1, bh, W2, C), lambda b, h: (b, d, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    col_spec = lambda d: pl.BlockSpec(
        (1, 1, W2, bh, C), lambda b, h: (b, d, 0, h, 0),
        memory_space=pltpu.VMEM,
    )
    # z / out ride CONTIGUOUS [2bh, W, C] row bands of the image — the
    # interleave is assembled in registers inside the kernel
    img_spec = pl.BlockSpec(
        (1, 2 * bh, W, C), lambda b, h: (b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 2 * bh, W, Co), lambda b, h: (b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if fold_proj:
        rx_spec = out_spec
    else:
        rx_spec = pl.BlockSpec(
            (1, 1, 1, Co), lambda b, h: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    vec_spec = pl.BlockSpec((1, C), lambda b, h: (0, 0),
                            memory_space=pltpu.VMEM)
    loc_spec = pl.BlockSpec((1, 1, C), lambda b, h: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    pw_spec = pl.BlockSpec((1, C, Co), lambda b, h: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    gate_spec = pl.BlockSpec((1, 1, Co), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_epilogue_kernel, eps=eps, has_local=has_local,
                          gate_silu=gate_silu, fold_proj=fold_proj),
        interpret=jax.default_backend() != "tpu",
        grid=(B, H2 // bh),
        in_specs=[
            row_spec(row_dirs[0]), col_spec(col_dirs[0]),
            row_spec(row_dirs[1]), col_spec(col_dirs[1]),
            img_spec, vec_spec, vec_spec, loc_spec,
            pw_spec, gate_spec, rx_spec,
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), z.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(14 * B * H * W * C
                   + (2 * B * H * W * C * Co if fold_proj else 0)),
            bytes_accessed=3 * B * H * W * C * z.dtype.itemsize,
            transcendentals=0,
        ),
    )(
        ys_rows, ys_cols, ys_rows, ys_cols,
        z, scale.reshape(1, C), bias.reshape(1, C), loc,
        proj_w[None], gate.reshape(B, 1, Co), rx,
    )
    return out


def _split_views(ys, H, W):
    B, K, L, C = ys.shape
    return ys.reshape(B, K, H // 2, W // 2, C), ys.reshape(
        B, K, W // 2, H // 2, C
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _merge_ln_gate(ys, z, scale, bias, local, proj_w, gate, rx, H, W, eps,
                   has_local, gate_silu, fold_proj):
    rows, cols = _split_views(ys, H, W)
    return _fused_fwd(rows, cols, z, scale, bias, local, proj_w, gate, rx,
                      H, W, eps, has_local, gate_silu, fold_proj=fold_proj)


def _mlg_fwd(ys, z, scale, bias, local, proj_w, gate, rx, H, W, eps,
             has_local, gate_silu, fold_proj):
    rows, cols = _split_views(ys, H, W)
    return (
        _fused_fwd(rows, cols, z, scale, bias, local, proj_w, gate, rx,
                   H, W, eps, has_local, gate_silu, fold_proj=fold_proj),
        (ys, z, scale, bias, local, proj_w, gate, rx),
    )


def _mlg_bwd(H, W, eps, has_local, gate_silu, fold_proj, res, g):
    ys, z, scale, bias, local, proj_w, gate, rx = res

    def f(ys_, z_, scale_, bias_, local_, pw_, gate_, rx_):
        return _merge_ln_gate_xla(
            ys_, z_, scale_, bias_, local_ if has_local else None, H, W, eps,
            gate_silu=gate_silu,
            proj_w=pw_ if fold_proj else None,
            gate=gate_, rx=rx_,
        )

    _, vjp = jax.vjp(f, ys, z, scale, bias, local, proj_w, gate, rx)
    return vjp(g)


_merge_ln_gate.defvjp(_mlg_fwd, _mlg_bwd)


def merge_ln_gate(
    ys: jnp.ndarray,
    z: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    local: Optional[jnp.ndarray] = None,
    *,
    H: int,
    W: int,
    eps: float = 1e-5,
    gate_silu: bool = False,
    proj_w: Optional[jnp.ndarray] = None,
    gate: Optional[jnp.ndarray] = None,
    residual_x: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``LayerNorm(efficient_merge(ys)) * gate(z) (+ local)`` in one HBM
    pass; ``gate_silu=True`` applies silu(z) in-kernel (pass raw z).

    ys: [B, 4, (H/2)*(W/2), C]; z: [B, H, W, C]; scale/bias: [C];
    local: [B, C] conditioning (added per-pixel) or None.
    ``proj_w [C, Co]`` + ``gate [B, Co]`` + ``residual_x [B, H, W, Co]``
    additionally fold the MambaBlock tail
    ``residual_x + gate * (out @ proj_w)`` into the kernel.
    Requires even H, W (step_size=2 decimation).
    """
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    has_local = local is not None
    fold_proj = proj_w is not None
    assert fold_proj == (gate is not None) == (residual_x is not None)
    if not _pick_bh(H // 2, W // 2, z.shape[-1]):
        # no Mosaic-legal row block at this shape -> unfused composition
        return _merge_ln_gate_xla(ys, z, scale, bias, local, H, W, eps,
                                  gate_silu=gate_silu, proj_w=proj_w,
                                  gate=gate, rx=residual_x)
    if local is None:
        local = jnp.zeros((z.shape[0], z.shape[-1]), z.dtype)
    if not fold_proj:
        B, C = z.shape[0], z.shape[-1]
        proj_w = jnp.zeros((C, C), z.dtype)
        gate = jnp.zeros((B, C), z.dtype)
        residual_x = jnp.zeros((B, 1, 1, C), z.dtype)
    return _merge_ln_gate(ys, z, scale, bias, local, proj_w, gate,
                          residual_x, H, W, eps, has_local, gate_silu,
                          fold_proj)


# ---------------------------------------------------------------------------
# Split-input variant: consumes the image-direct scan outputs
# (founddiff_tpu.ops.scan_pallas.selective_scan_image) without ever forming
# the joint [B, 4, L, C] array.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def _merge_ln_gate_split(ys_rows, ys_cols, z, scale, bias, local, proj_w,
                         gate, rx, H, W, eps, has_local, gate_silu,
                         fold_proj):
    B = z.shape[0]
    C = z.shape[-1]
    rows = ys_rows.reshape(B, 2, H // 2, W // 2, C)
    cols = ys_cols.reshape(B, 2, W // 2, H // 2, C)
    return _fused_fwd(rows, cols, z, scale, bias, local, proj_w, gate, rx,
                      H, W, eps, has_local, gate_silu, row_dirs=(0, 1),
                      col_dirs=(0, 1), fold_proj=fold_proj)


def _mlgs_fwd(ys_rows, ys_cols, z, scale, bias, local, proj_w, gate, rx,
              H, W, eps, has_local, gate_silu, fold_proj):
    out = _merge_ln_gate_split(ys_rows, ys_cols, z, scale, bias, local,
                               proj_w, gate, rx, H, W, eps, has_local,
                               gate_silu, fold_proj)
    return out, (ys_rows, ys_cols, z, scale, bias, local, proj_w, gate, rx)


def _mlgs_bwd(H, W, eps, has_local, gate_silu, fold_proj, res, g):
    ys_rows, ys_cols, z, scale, bias, local, proj_w, gate, rx = res

    def f(r_, c_, z_, scale_, bias_, local_, pw_, gate_, rx_):
        ys = jnp.stack([r_[:, 0], c_[:, 0], r_[:, 1], c_[:, 1]], axis=1)
        return _merge_ln_gate_xla(
            ys, z_, scale_, bias_, local_ if has_local else None, H, W, eps,
            gate_silu=gate_silu,
            proj_w=pw_ if fold_proj else None,
            gate=gate_, rx=rx_,
        )

    _, vjp = jax.vjp(f, ys_rows, ys_cols, z, scale, bias, local, proj_w,
                     gate, rx)
    return vjp(g)


_merge_ln_gate_split.defvjp(_mlgs_fwd, _mlgs_bwd)


def merge_ln_gate_split(
    ys_rows: jnp.ndarray,
    ys_cols: jnp.ndarray,
    z: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    local: Optional[jnp.ndarray] = None,
    *,
    H: int,
    W: int,
    eps: float = 1e-5,
    gate_silu: bool = False,
    proj_w: Optional[jnp.ndarray] = None,
    gate: Optional[jnp.ndarray] = None,
    residual_x: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Like :func:`merge_ln_gate` but takes the row-major dirs (0, 2) as
    ``ys_rows`` [B, 2, L, C] and the column-major dirs (1, 3) as ``ys_cols``
    [B, 2, L, C] (w-major layout), as produced by ``selective_scan_image``.
    ``proj_w``/``gate``/``residual_x`` fold the MambaBlock tail (see
    :func:`merge_ln_gate`)."""
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    has_local = local is not None
    fold_proj = proj_w is not None
    assert fold_proj == (gate is not None) == (residual_x is not None)
    if not _pick_bh(H // 2, W // 2, z.shape[-1]):
        B, C = z.shape[0], z.shape[-1]
        ys = jnp.stack(
            [ys_rows[:, 0], ys_cols[:, 0], ys_rows[:, 1], ys_cols[:, 1]],
            axis=1,
        )
        return _merge_ln_gate_xla(ys, z, scale, bias, local, H, W, eps,
                                  gate_silu=gate_silu, proj_w=proj_w,
                                  gate=gate, rx=residual_x)
    if local is None:
        local = jnp.zeros((z.shape[0], z.shape[-1]), z.dtype)
    if not fold_proj:
        B, C = z.shape[0], z.shape[-1]
        proj_w = jnp.zeros((C, C), z.dtype)
        gate = jnp.zeros((B, C), z.dtype)
        residual_x = jnp.zeros((B, 1, 1, C), z.dtype)
    return _merge_ln_gate_split(ys_rows, ys_cols, z, scale, bias, local,
                                proj_w, gate, residual_x, H, W, eps,
                                has_local, gate_silu, fold_proj)

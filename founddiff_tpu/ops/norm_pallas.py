"""Fused Pallas LayerNorm (channel-minor).

Profiles of the 512^2 UNet show ~10 ms/forward in `convert_reduce` fusions —
XLA's fp32-upcast norm statistics passes.  This kernel does the whole
LayerNorm (fp32 stats, affine, cast back) in one HBM pass over row blocks.

Backward remats through the XLA formulation (custom VJP), matching the
framework's other kernels.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float, has_affine: bool):
    x = x_ref[0].astype(jnp.float32)  # [R, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if has_affine:
        y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _ln_forward(x2d, scale, bias, eps):
    R, C = x2d.shape
    # Mosaic: the block's second-minor dim must be a multiple of 8 (or the
    # full array dim); R is padded to a blk multiple below, so keep blk 8-
    # aligned unless it covers the whole array
    blk = max(256, min(2048, (2 * 1024 * 1024) // (C * 4))) // 8 * 8
    blk = min(blk, R)
    pad = (-R) % blk
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    Rp = R + pad
    has_affine = scale is not None
    g = (scale if has_affine else jnp.zeros((C,), x2d.dtype)).reshape(1, C)
    b = (bias if has_affine else jnp.zeros((C,), x2d.dtype)).reshape(1, C)
    kernel = functools.partial(_ln_kernel, eps=eps, has_affine=has_affine)
    out = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(Rp // blk,),
        in_specs=[
            pl.BlockSpec((1, blk, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, C), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Rp, C), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * Rp * C,
            bytes_accessed=2 * Rp * C * x2d.dtype.itemsize,
            transcendentals=Rp,
        ),
    )(x2d[None], g[None], b[None])
    return out[0, :R]


def _xla_layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_ln(x2d, scale, bias, eps):
    return _ln_forward(x2d, scale, bias, eps)


def _fused_ln_fwd(x2d, scale, bias, eps):
    return _ln_forward(x2d, scale, bias, eps), (x2d, scale, bias)


def _fused_ln_bwd(eps, res, g):
    x2d, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _xla_layer_norm(x_, s_, b_, eps), x2d, scale, bias
    )
    return vjp(g)


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def layer_norm(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm over the trailing axis of an N-D array, fused on TPU."""
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    out = _fused_ln(x2d, scale, bias, eps)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# LayerNorm + adaLN modulation fused: modulate(LN(x), shift_b, scale_b)
# = LN(x) * (1 + scale_b) + shift_b (reference `modulate`
# src/DADiff.py:450-451 applied to norm1/norm2 outputs in Mamba_block
# :478-486) — one HBM pass instead of LN + a separate modulate fusion.
# ---------------------------------------------------------------------------


def _ln_mod_kernel(x_ref, g_ref, b_ref, ms_ref, mt_ref, o_ref, *, eps: float,
                   has_affine: bool):
    x = x_ref[0].astype(jnp.float32)  # [R, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if has_affine:
        y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    y = y * (1.0 + ms_ref[0, 0].astype(jnp.float32)) + mt_ref[0, 0].astype(
        jnp.float32
    )
    o_ref[0] = y.astype(o_ref.dtype)


def _ln_mod_forward(x3d, scale, bias, mod_scale, mod_shift, eps):
    B, R, C = x3d.shape
    blk = max(256, min(2048, (2 * 1024 * 1024) // (C * 4))) // 8 * 8
    blk = min(blk, R)
    pad = (-R) % blk
    if pad:
        x3d = jnp.pad(x3d, ((0, 0), (0, pad), (0, 0)))
    Rp = R + pad
    has_affine = scale is not None
    g = (scale if has_affine else jnp.zeros((C,), x3d.dtype)).reshape(1, C)
    b = (bias if has_affine else jnp.zeros((C,), x3d.dtype)).reshape(1, C)
    kernel = functools.partial(_ln_mod_kernel, eps=eps, has_affine=has_affine)
    vec = pl.BlockSpec((1, C), lambda bi, i: (0, 0), memory_space=pltpu.VMEM)
    # per-batch vectors carry a dummy middle dim so the block's last two
    # dims are (1, C) == the array dims (Mosaic block-shape rule)
    bvec = pl.BlockSpec((1, 1, C), lambda bi, i: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(B, Rp // blk),
        in_specs=[
            pl.BlockSpec((1, blk, C), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            vec, vec, bvec, bvec,
        ],
        out_specs=pl.BlockSpec((1, blk, C), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Rp, C), x3d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * Rp * C,
            bytes_accessed=2 * B * Rp * C * x3d.dtype.itemsize,
            transcendentals=B * Rp,
        ),
    )(x3d, g, b, mod_scale[:, None, :], mod_shift[:, None, :])
    return out[:, :R]


def _xla_ln_mod(x3d, scale, bias, mod_scale, mod_shift, eps):
    y = _xla_layer_norm(x3d, scale, bias, eps).astype(jnp.float32)
    y = y * (1.0 + mod_scale[:, None, :].astype(jnp.float32)) + mod_shift[
        :, None, :
    ].astype(jnp.float32)
    return y.astype(x3d.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_ln_mod(x3d, scale, bias, mod_scale, mod_shift, eps):
    return _ln_mod_forward(x3d, scale, bias, mod_scale, mod_shift, eps)


def _fused_ln_mod_fwd(x3d, scale, bias, mod_scale, mod_shift, eps):
    return (
        _ln_mod_forward(x3d, scale, bias, mod_scale, mod_shift, eps),
        (x3d, scale, bias, mod_scale, mod_shift),
    )


def _fused_ln_mod_bwd(eps, res, g):
    x3d, scale, bias, mod_scale, mod_shift = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_, ms_, mt_: _xla_ln_mod(x_, s_, b_, ms_, mt_, eps),
        x3d, scale, bias, mod_scale, mod_shift,
    )
    return vjp(g)


_fused_ln_mod.defvjp(_fused_ln_mod_fwd, _fused_ln_mod_bwd)


def layer_norm_modulated(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    mod_scale: jnp.ndarray,
    mod_shift: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """``modulate(LayerNorm(x))`` fused: x [B, ..., C];
    mod_scale/mod_shift [B, C] (adaLN chunks).

    ``FOUNDDIFF_LNMOD=xla`` routes through the XLA composition instead of
    the Pallas kernel: in today's fused-block graph the Pallas boundary
    forces row-major relayouts between the conv-fed producer and the
    einsum/dwconv consumer, which can cost more than the kernel saves
    (r4 experiment; the r1 win predates the block kernels)."""
    shape = x.shape
    x3d = x.reshape(shape[0], -1, shape[-1])
    if os.environ.get("FOUNDDIFF_LNMOD", "pallas") == "xla":
        out = _xla_ln_mod(x3d, scale, bias, mod_scale, mod_shift, eps)
    else:
        out = _fused_ln_mod(x3d, scale, bias, mod_scale, mod_shift, eps)
    return out.reshape(shape)

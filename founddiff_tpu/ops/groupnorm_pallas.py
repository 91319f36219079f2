"""Fused GroupNorm + SiLU (+ residual add) for the resnet blocks.

The reference resnet block chains Conv -> nn.GroupNorm -> SiLU -> (+x)
(reference src/DADiff.py:214-233, 398-427).  On TPU the GroupNorm statistics
show up as fp32 ``convert_reduce`` passes (~15 ms/fwd at 512^2 bs8) and the
normalize/SiLU/add as separate elementwise fusions.  This module runs the
whole post-conv epilogue in two BW-bound Pallas passes:

1. a stats kernel accumulating per-channel sum/sumsq row-block by row-block
   (one HBM read, tiny output), reduced to per-group mean/rstd outside
   (negligible [B, 2, C] work);
2. an apply kernel computing ``silu(gn(x) * scale + bias) + residual`` in a
   single read-modify-write pass.

Math identical to ``nn.GroupNorm(groups, eps)`` + ``silu`` + add: stats are
fp32 regardless of io dtype, biased variance, per-channel affine.
Backward remats through the XLA composition (custom VJP), like the
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


def _pick_blk(R: int, C: int) -> int:
    blk = max(256, min(4096, (4 * 1024 * 1024) // (C * 4))) // 8 * 8
    return min(blk, R)


def _stats_kernel(x_ref, o_ref):
    i = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # [blk, C]

    @pl.when(i == 0)
    def _init():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    o_ref[0, 0, :] += jnp.sum(x, axis=0)
    o_ref[0, 1, :] += jnp.sum(x * x, axis=0)


def _apply_kernel(x_ref, m_ref, s_ref, g_ref, b_ref, r_ref, o_ref, *,
                  has_res: bool):
    x = x_ref[0].astype(jnp.float32)  # [blk, C]
    mean = m_ref[0, 0].astype(jnp.float32)  # [C] (group mean tiled)
    rstd = s_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)  # [C] per-batch effective affine
    b = b_ref[0, 0].astype(jnp.float32)
    y = (x - mean) * rstd * g + b
    y = y * jax.nn.sigmoid(y)  # silu
    if has_res:
        y = y + r_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "has_res"))
def _gn_silu_fwd(x, scale, bias, residual, groups, eps, has_res):
    """scale/bias: [B, C] effective per-batch affine (modulation pre-folded)."""
    B, H, W, C = x.shape
    R = H * W
    G = groups
    x2 = x.reshape(B, R, C)
    r2 = (residual if has_res else x).reshape(B, R, C)
    blk = _pick_blk(R, C)
    pad = (-R) % blk
    if pad:
        # zero rows contribute nothing to sum/sumsq; count uses the true R
        x2 = jnp.pad(x2, ((0, 0), (0, pad), (0, 0)))
        r2 = jnp.pad(r2, ((0, 0), (0, pad), (0, 0)))
    Rp = R + pad
    nb = Rp // blk

    xspec = pl.BlockSpec((1, blk, C), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM)
    sums = pl.pallas_call(
        _stats_kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(B, nb),
        in_specs=[xspec],
        out_specs=pl.BlockSpec((1, 2, C), lambda b_, i: (b_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * B * Rp * C,
            bytes_accessed=B * Rp * C * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x2)

    # [B, 2, C] channel sums -> per-group stats -> tiled back to channels
    # (tiny XLA work on [B, C])
    cg = C // G
    n = jnp.float32(R * cg)
    gsum = sums.reshape(B, 2, G, cg).sum(-1)  # [B, 2, G]
    mean_g = gsum[:, 0] / n
    var_g = gsum[:, 1] / n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean = jnp.repeat(mean_g, cg, axis=-1).reshape(B, 1, C)
    rstd = jnp.repeat(rstd_g, cg, axis=-1).reshape(B, 1, C)

    bvec = pl.BlockSpec((1, 1, C), lambda b_, i: (b_, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_apply_kernel, has_res=has_res),
        interpret=jax.default_backend() != "tpu",
        grid=(B, nb),
        in_specs=[xspec, bvec, bvec, bvec, bvec, xspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, Rp, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=9 * B * Rp * C,
            bytes_accessed=(2 + has_res) * B * Rp * C * x.dtype.itemsize,
            transcendentals=B * Rp * C,
        ),
    )(x2, mean, rstd, scale.reshape(B, 1, C), bias.reshape(B, 1, C), r2)
    return out[:, :R].reshape(B, H, W, C)


def _gn_silu_xla(x, scale, bias, residual, groups, eps, has_res):
    B, H, W, C = x.shape
    G = groups
    if os.environ.get("FOUNDDIFF_GN_STATS", "xla") == "mxu":
        # r4 NEGATIVE result (kept selectable): standalone the MXU stats
        # beat the naive convert+reduce (~25x off bandwidth), but in the
        # full UNet they cost +12 ms (226.3 vs 214.5 ms fwd, r4 profiles) —
        # splitting the stats out of the conv-fed fusion breaks XLA's
        # conv+GN epilogue fusion, the same failure mode as the r3 Pallas
        # GN pair.  Per-channel sums as a ones-matvec and sumsq as the
        # diagonal of a [C, C] Gram — bf16 inputs with f32 accumulation.
        x2 = x.reshape(B, H * W, C)
        s1 = jnp.einsum(
            "blc,l->bc", x2, jnp.ones((H * W,), x.dtype),
            preferred_element_type=jnp.float32,
        )
        gram = jnp.einsum(
            "blc,bld->bcd", x2, x2, preferred_element_type=jnp.float32
        )
        s2 = jnp.diagonal(gram, axis1=1, axis2=2)
        n = jnp.float32(H * W * (C // G))
        mean_g = s1.reshape(B, G, C // G).sum(-1) / n          # [B, G]
        var_g = s2.reshape(B, G, C // G).sum(-1) / n - mean_g * mean_g
        rstd_g = jax.lax.rsqrt(var_g + eps)
        mean = jnp.repeat(mean_g, C // G, axis=-1)[:, None, None, :]
        rstd = jnp.repeat(rstd_g, C // G, axis=-1)[:, None, None, :]
        y = (x.astype(jnp.float32) - mean) * rstd
    else:
        xf = x.astype(jnp.float32).reshape(B, H * W, G, C // G)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = jnp.mean(xf * xf, axis=(1, 3), keepdims=True) - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        y = y.reshape(B, H, W, C)
    y = y * scale.astype(jnp.float32)[:, None, None, :] + bias.astype(
        jnp.float32
    )[:, None, None, :]
    y = y * jax.nn.sigmoid(y)
    if has_res:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _gn_silu(x, scale, bias, residual, groups, eps, has_res):
    return _gn_silu_fwd(x, scale, bias, residual, groups, eps, has_res)


def _gn_silu_vjp_fwd(x, scale, bias, residual, groups, eps, has_res):
    out = _gn_silu_fwd(x, scale, bias, residual, groups, eps, has_res)
    return out, (x, scale, bias, residual)


def _gn_silu_vjp_bwd(groups, eps, has_res, res, g):
    x, scale, bias, residual = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_, r_: _gn_silu_xla(x_, s_, b_, r_, groups, eps,
                                            has_res),
        x, scale, bias, residual,
    )
    return vjp(g)


_gn_silu.defvjp(_gn_silu_vjp_fwd, _gn_silu_vjp_bwd)


def group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    residual: Optional[jnp.ndarray] = None,
    scale_shift=None,
    groups: int = 8,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """``silu(modulate(GroupNorm(x) * scale + bias)) (+ residual)`` fused.

    x, residual: [B, H, W, C]; scale, bias: [C] GroupNorm affine.
    ``scale_shift``: optional (mod_scale, mod_shift) pair broadcastable to
    [B, C] — the vanilla resnet block's time modulation
    ``y * (mod_scale + 1) + mod_shift`` (reference src/DADiff.py:228-231),
    pre-folded into the per-batch affine so the kernel stays one pass.
    """
    B, C = x.shape[0], x.shape[-1]
    assert C % groups == 0, (x.shape, groups)
    # Default measured r3 on v5e (512^2 bs8 bf16 full UNet fwd): the XLA
    # composition wins — 243.1 ms vs 263.9 ms with the Pallas pair.  XLA
    # fuses the normalize+silu+add epilogue INTO the convolution's output
    # loop (conv category grew 17.7 -> 33.2 ms when split out) and the
    # Pallas operands force relayout copies (copy 24.9 -> 35.8 ms).  The
    # kernel stays selectable (FOUNDDIFF_GN=pallas) for non-conv-fed uses.
    if os.environ.get("FOUNDDIFF_GN", "xla") == "xla":
        g0 = scale
        b0 = bias
        if scale_shift is not None:
            ms, mt = (jnp.asarray(t, jnp.float32).reshape(B, C)
                      for t in scale_shift)
            g = jnp.broadcast_to(g0.astype(jnp.float32), (B, C)) * (ms + 1.0)
            b = (jnp.broadcast_to(b0.astype(jnp.float32), (B, C))
                 * (ms + 1.0) + mt)
        else:
            g = jnp.broadcast_to(g0.astype(jnp.float32), (B, C))
            b = jnp.broadcast_to(b0.astype(jnp.float32), (B, C))
        return _gn_silu_xla(x, g, b, residual, groups, eps,
                            residual is not None)
    has_res = residual is not None
    if residual is None:
        residual = x  # unused placeholder with matching sharding/shape
    g = jnp.broadcast_to(scale.astype(jnp.float32), (B, C))
    b = jnp.broadcast_to(bias.astype(jnp.float32), (B, C))
    if scale_shift is not None:
        ms, mt = (jnp.asarray(t, jnp.float32).reshape(B, C)
                  for t in scale_shift)
        g = g * (ms + 1.0)
        b = b * (ms + 1.0) + mt
    return _gn_silu(x, g, b, residual, groups, eps, has_res)

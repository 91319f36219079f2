"""Pallas TPU flash attention.

TPU-native equivalent of the reference's pinned ``flash-attn==1.0.2``
dependency (reference install.yaml:188; capability N2 in SURVEY.md §2.2) —
used by the full-softmax ``Attention`` (vanilla UNet bottleneck,
src/denoising_diffusion_pytorch.py:369-392) and available to
``CrossAttention``/``AttentionPool2d``.

Standard online-softmax formulation: the query axis rides the grid; K/V are
streamed through VMEM in blocks with running (max, denominator, accumulator)
state, so the L x L score matrix is never materialized.  fp32 accumulation
regardless of input dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, blk_k: int, scale: float,
                  kv_len: int):
    """q_ref: [1, BLK_Q, d]; k_ref, v_ref: [1, Lk_pad, d]; o_ref: [1, BLK_Q, d]."""
    q = q_ref[0].astype(jnp.float32) * scale  # [BQ, d]
    bq, d = q.shape
    lk = k_ref.shape[1]
    num_kb = lk // blk_k

    def body(kb, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(kb * blk_k, blk_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * blk_k, blk_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, blk_k]
        if kv_len % blk_k:
            # mask padded keys
            key_ids = kb * blk_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, blk_k), 1
            )
            s = jnp.where(key_ids < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _xla_attention(q, k, v, scale):
    s = jnp.einsum(
        "bhid,bhjd->bhij",
        q.astype(jnp.float32),
        k.astype(jnp.float32),
    ) * scale
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", a, v.astype(jnp.float32)).astype(
        q.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(q, k, v, scale, blk_q, blk_k):
    return _flash_fwd_impl(q, k, v, scale, blk_q, blk_k)


def _flash_vjp_fwd(q, k, v, scale, blk_q, blk_k):
    return _flash_fwd_impl(q, k, v, scale, blk_q, blk_k), (q, k, v)


def _flash_vjp_bwd(scale, blk_q, blk_k, res, g):
    # backward remats through the XLA formulation (a fused Pallas backward is
    # a later optimization; training through full attention is off the
    # FoundDiff hot path)
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


_flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    blk_q: int = 256,
    blk_k: int = 256,
) -> jnp.ndarray:
    """softmax(q k^T * scale) v without materializing the score matrix.

    q: [B, H, Lq, d]; k, v: [B, H, Lk, d]; returns [B, H, Lq, d] in q.dtype.
    Differentiable (backward remats via XLA attention).
    """
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    return _flash_attention(q, k, v, scale, blk_q, blk_k)


def _flash_fwd_impl(q, k, v, scale, blk_q=256, blk_k=256) -> jnp.ndarray:
    """softmax(q k^T * scale) v without materializing the score matrix.

    q: [B, H, Lq, d]; k, v: [B, H, Lk, d]; returns [B, H, Lq, d] in q.dtype.
    d should be a multiple of 128 for peak MXU use; smaller head dims work
    (Mosaic pads lanes).
    """
    B, H, Lq, d = q.shape
    Lk = k.shape[2]
    scale = d**-0.5 if scale is None else scale

    blk_q = min(blk_q, max(16, 1 << (Lq - 1).bit_length()))
    blk_k = min(blk_k, max(16, 1 << (Lk - 1).bit_length()))
    pad_q = (-Lq) % blk_q
    pad_k = (-Lk) % blk_k

    G = B * H
    qf = q.reshape(G, Lq, d)
    kf = k.reshape(G, Lk, d)
    vf = v.reshape(G, Lk, d)
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        kf = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0)))
    Lqp, Lkp = Lq + pad_q, Lk + pad_k

    kernel = functools.partial(
        _flash_kernel, blk_k=blk_k, scale=scale, kv_len=Lk
    )
    out = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(G, Lqp // blk_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lkp, d), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lkp, d), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d), lambda g, i: (g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Lqp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * Lqp * Lkp * d,
            bytes_accessed=(G * (Lqp + 2 * Lkp) * d + G * Lqp * d)
            * q.dtype.itemsize,
            transcendentals=G * Lqp * Lkp,
        ),
    )(qf, kf, vf)
    return out[:, :Lq].reshape(B, H, Lq, d)

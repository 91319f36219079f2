"""Pallas TPU flash attention (forward + backward).

TPU-native equivalent of the reference's pinned ``flash-attn==1.0.2``
dependency (reference install.yaml:188; capability N2 in SURVEY.md §2.2) —
used by the full-softmax ``Attention`` (vanilla UNet bottleneck,
src/denoising_diffusion_pytorch.py:369-392) and available to
``CrossAttention``/``AttentionPool2d``.

Design:
- Forward: online softmax with BOTH q and k/v blocked on the grid — K/V
  stream HBM->VMEM one [blk_k, d] block per grid step (k innermost), with
  running (max, denom, accumulator) in VMEM scratch.  VMEM residency is
  O(blk_q * d + blk_k * d) regardless of sequence length, so L in the
  hundreds of thousands works.  The per-row logsumexp is saved for the
  backward.
- Backward: two Pallas kernels in the standard FlashAttention-2 style —
  dq over a (G, nq, nk) grid (k innermost) and dk/dv over (G, nk, nq)
  (q innermost) — recomputing p = exp(s - lse) blockwise; the L x L score
  matrix is never materialized in either direction.  ``D = rowsum(do * o)``
  is precomputed outside (one cheap fused elementwise pass).

fp32 accumulation regardless of input dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
                *, scale: float, kv_len: int, blk_k: int):
    """Grid (G, nq, nk), k innermost.  q_ref/o_ref: [1, blk_q, d];
    k_ref/v_ref: [1, blk_k, d]; lse_ref: [1, 1, blk_q];
    scratch acc [blk_q, d], m/l [blk_q, 128] (col 0 used)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * scale  # [BQ, d]
    k = k_ref[0].astype(jnp.float32)  # [BK, d]
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    if kv_len % blk_k:
        key_ids = ki * blk_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, blk_k), 1
        )
        s = jnp.where(key_ids < kv_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:, :1] = m_new
    l_ref[:, :1] = l_new

    @pl.when(ki == nk - 1)
    def _finish():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)
        lse_ref[0, 0] = jnp.broadcast_to(
            (m_ref[:, :1] + jnp.log(l)).reshape(1, -1), lse_ref.shape[2:]
        )


def _pad_to(x, L, axis=1):
    pad = L - x.shape[axis]
    if pad:
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, pad)
        x = jnp.pad(x, cfg)
    return x


def _flash_fwd_impl(q, k, v, scale, blk_q=256, blk_k=256):
    """Returns (out [B,H,Lq,d], lse [G, nq, blk_q])."""
    B, H, Lq, d = q.shape
    Lk = k.shape[2]
    blk_q = min(blk_q, max(16, 1 << (Lq - 1).bit_length()))
    blk_k = min(blk_k, max(16, 1 << (Lk - 1).bit_length()))
    Lqp, Lkp = Lq + (-Lq) % blk_q, Lk + (-Lk) % blk_k
    G = B * H
    qf = _pad_to(q.reshape(G, Lq, d), Lqp)
    kf = _pad_to(k.reshape(G, Lk, d), Lkp)
    vf = _pad_to(v.reshape(G, Lk, d), Lkp)
    nq, nk = Lqp // blk_q, Lkp // blk_k

    kernel = functools.partial(
        _fwd_kernel, scale=scale, kv_len=Lk, blk_k=blk_k
    )
    out, lse = pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=(G, nq, nk),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda g, qi, ki: (g, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d), lambda g, qi, ki: (g, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d), lambda g, qi, ki: (g, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, d), lambda g, qi, ki: (g, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, blk_q), lambda g, qi, ki: (g, qi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lqp, d), q.dtype),
            # 8 sublane-padded copies (Mosaic block-shape rule); row 0 used
            jax.ShapeDtypeStruct((G, nq, 8, blk_q), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_q, d), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * G * Lqp * Lkp * d,
            bytes_accessed=(G * (Lqp * nk + 2 * Lkp) * d) * q.dtype.itemsize,
            transcendentals=G * Lqp * Lkp,
        ),
    )(qf, kf, vf)
    return out[:, :Lq].reshape(B, H, Lq, d), lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref, dq_ref,
                   dq_acc, *, scale: float, kv_len: int, blk_k: int):
    """Grid (G, nq, nk), k innermost.  dq_i = scale * sum_j p_ij
    (do_i . v_j - D_i) k_j with p = exp(q.k*scale - lse)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, 0][:, None]  # [BQ, 1]
    dcap = dcap_ref[0, 0, 0][:, None]

    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if kv_len % blk_k:
        key_ids = ki * blk_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, blk_k), 1
        )
        s = jnp.where(key_ids < kv_len, s, _NEG_INF)
    p = jnp.exp(s - lse)  # [BQ, BK]
    dov = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    dp = p * (dov - dcap)
    dq_acc[...] += scale * jax.lax.dot_general(
        dp, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc,
                    *, scale: float, kv_len: int, blk_k: int):
    """Grid (G, nk, nq), q innermost.  dv_j = sum_i p_ij do_i;
    dk_j = scale * sum_i p_ij (do_i . v_j - D_i) q_i."""
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, 0][:, None]
    dcap = dcap_ref[0, 0, 0][:, None]

    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    ki_blk = pl.program_id(1)
    if kv_len % blk_k:
        key_ids = ki_blk * blk_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, blk_k), 1
        )
        s = jnp.where(key_ids < kv_len, s, _NEG_INF)
    p = jnp.exp(s - lse)
    dv_acc[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, d]
    dov = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = p * (dov - dcap)  # [BQ, BK]
    dk_acc[...] += scale * jax.lax.dot_general(
        dp, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, o, lse, do, scale, blk_q, blk_k):
    B, H, Lq, d = q.shape
    Lk = k.shape[2]
    blk_q = min(blk_q, max(16, 1 << (Lq - 1).bit_length()))
    blk_k = min(blk_k, max(16, 1 << (Lk - 1).bit_length()))
    Lqp, Lkp = Lq + (-Lq) % blk_q, Lk + (-Lk) % blk_k
    G = B * H
    nq, nk = Lqp // blk_q, Lkp // blk_k

    qf = _pad_to(q.reshape(G, Lq, d), Lqp)
    kf = _pad_to(k.reshape(G, Lk, d), Lkp)
    vf = _pad_to(v.reshape(G, Lk, d), Lkp)
    dof = _pad_to(do.reshape(G, Lq, d), Lqp)
    # D_i = rowsum(do * o): one fused elementwise pass
    dcap = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).reshape(G, Lq)
    dcap = _pad_to(dcap, Lqp, axis=1).reshape(G, nq, 1, blk_q)
    dcap = jnp.broadcast_to(dcap, (G, nq, 8, blk_q))

    spec_q = pl.BlockSpec((1, blk_q, d), lambda g, qi, ki: (g, qi, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, blk_k, d), lambda g, qi, ki: (g, ki, 0),
                          memory_space=pltpu.VMEM)
    spec_row = pl.BlockSpec((1, 1, 8, blk_q), lambda g, qi, ki: (g, qi, 0, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=Lk,
                          blk_k=blk_k),
        interpret=_interpret(),
        grid=(G, nq, nk),
        in_specs=[spec_q, spec_k, spec_k, spec_q, spec_row, spec_row],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((G, Lqp, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((blk_q, d), jnp.float32)],
    )(qf, kf, vf, dof, lse, dcap)

    # dk/dv grid: (G, nk, nq) with q innermost — index maps swap roles
    spec_q2 = pl.BlockSpec((1, blk_q, d), lambda g, ki, qi: (g, qi, 0),
                           memory_space=pltpu.VMEM)
    spec_k2 = pl.BlockSpec((1, blk_k, d), lambda g, ki, qi: (g, ki, 0),
                           memory_space=pltpu.VMEM)
    spec_row2 = pl.BlockSpec((1, 1, 8, blk_q), lambda g, ki, qi: (g, qi, 0, 0),
                             memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=Lk,
                          blk_k=blk_k),
        interpret=_interpret(),
        grid=(G, nk, nq),
        in_specs=[spec_q2, spec_k2, spec_k2, spec_q2, spec_row2, spec_row2],
        out_specs=(spec_k2, spec_k2),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lkp, d), k.dtype),
            jax.ShapeDtypeStruct((G, Lkp, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_k, d), jnp.float32),
            pltpu.VMEM((blk_k, d), jnp.float32),
        ],
    )(qf, kf, vf, dof, lse, dcap)

    return (
        dq[:, :Lq].reshape(B, H, Lq, d),
        dk[:, :Lk].reshape(B, H, Lk, d),
        dv[:, :Lk].reshape(B, H, Lk, d),
    )


# ---------------------------------------------------------------------------
# custom VJP + public entry
# ---------------------------------------------------------------------------


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
    out, _ = _flash_fwd_impl(q, k, v, scale, blk_q, blk_k)
    return out


def _flash_vjp_fwd(q, k, v, scale, blk_q, blk_k):
    out, lse = _flash_fwd_impl(q, k, v, scale, blk_q, blk_k)
    return out, (q, k, v, out, lse)


def _flash_vjp_bwd(scale, blk_q, blk_k, res, g):
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, g, scale, blk_q, blk_k)


_flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    blk_q: int = 256,
    blk_k: int = 256,
) -> jnp.ndarray:
    """softmax(q k^T * scale) v without materializing the score matrix,
    forward OR backward.

    q: [B, H, Lq, d]; k, v: [B, H, Lk, d]; returns [B, H, Lq, d] in q.dtype.
    VMEM residency is O(blk * d) — sequence lengths of 10^5+ are fine.
    """
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    return _flash_attention(q, k, v, scale, blk_q, blk_k)

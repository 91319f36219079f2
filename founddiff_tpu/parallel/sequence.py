"""Sequence-sharded selective scan over a device mesh axis.

TPU-native sequence parallelism for the SSM recurrence (the capability the
BASELINE config-5 asks for: mesh-sharded full-volume inference).  The
sequence axis L of the scan is sharded across devices; each shard runs its
local (Pallas/XLA) scan from a zero state, then the tiny per-shard summary
``(A_prod, h_end)`` — where ``A_prod = exp(A * sum(delta'))`` is the product
of all decay factors in the shard — is all-gathered over ICI and combined
into an exclusive prefix state.  The correction

    y += einsum(C_t, exp(A * cumsum(delta')_t) * h_prefix)

is exact (the recurrence is linear in the initial state), so no second scan
pass is needed.  Communication: one all-gather of ``[B,K,D,N]`` per call.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from founddiff_tpu.ops.selective_scan import selective_scan


def _local_with_prefix(u, delta, A, Bmat, Cmat, Dskip, delta_bias, impl,
                       axis_name):
    """Body run per shard under shard_map; L axis is the local chunk."""
    f32 = jnp.float32
    u = u.astype(f32)
    delta = delta.astype(f32)
    dl = jax.nn.softplus(delta + delta_bias[None, :, None, :].astype(f32))

    # local scan from zero state (delta transforms already applied), also
    # returning the state at the shard's last step
    y_local, h_end = selective_scan(
        u, dl, A, Bmat, Cmat, Dskip, delta_bias=None, delta_softplus=False,
        impl=impl, return_last_state=True,
    )

    # shard summary: total decay product over the shard
    sum_dl = jnp.sum(dl, axis=2)  # [B,K,D]
    A_prod = jnp.exp(sum_dl[..., None] * A[None])  # [B,K,D,N]
    cum_dl = jnp.cumsum(dl, axis=2)  # inclusive

    # exclusive prefix across shards
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    all_Ap = jax.lax.all_gather(A_prod, axis_name)  # [n, B,K,D,N]
    all_he = jax.lax.all_gather(h_end, axis_name)

    def combine(carry, x):
        ap, he = x
        return carry * ap + he, None

    def prefix_for(i):
        # state entering shard i = fold over shards [0, i)
        mask = (jnp.arange(n) < i).astype(f32).reshape(n, 1, 1, 1, 1)
        # masked fold: identity for masked-out shards (ap=1, he=0)
        ap = all_Ap * mask + (1.0 - mask)
        he = all_he * mask
        h, _ = jax.lax.scan(combine, jnp.zeros_like(h_end), (ap, he))
        return h

    h_prefix = prefix_for(idx)

    # correction: y_t += C_t . (exp(A * cumsum_t) * h_prefix)
    decay_from_start = jnp.exp(cum_dl[..., None] * A[None, :, None, :, :])
    corr_state = decay_from_start * h_prefix[:, :, None, :, :]
    y_corr = jnp.einsum("bkldn,bkln->bkld", corr_state, Cmat.astype(f32))
    return y_local + y_corr


def seq_sharded_selective_scan(
    u, delta, A, Bmat, Cmat, Dskip=None, delta_bias=None,
    *,
    mesh: Mesh,
    axis: str = "seq",
    batch_axis: Optional[str] = "data",
    impl: str = "auto",
):
    """Selective scan with L sharded over ``mesh`` axis ``axis`` and batch
    optionally sharded over ``batch_axis``.

    Shapes as :func:`founddiff_tpu.ops.selective_scan.selective_scan`:
    u, delta: [B,K,L,D]; A: [K,D,N]; B,C: [B,K,L,N]; D, bias: [K,D].
    """
    K, D = A.shape[0], A.shape[1]
    if Dskip is None:
        Dskip = jnp.zeros((K, D), jnp.float32)
    if delta_bias is None:
        delta_bias = jnp.zeros((K, D), jnp.float32)

    bspec = P(batch_axis, None, axis, None) if batch_axis else P(None, None, axis, None)
    rep = P()

    body = functools.partial(_local_with_prefix, impl=impl, axis_name=axis)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(bspec, bspec, rep, bspec, bspec, rep, rep),
        out_specs=bspec,
    )
    return fn(u, delta, A, Bmat, Cmat, Dskip, delta_bias)

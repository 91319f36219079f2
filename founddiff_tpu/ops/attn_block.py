"""Fully-fused MambaBlock attention half: one kernel per image.

TPU-native rebuild of the second half of the reference ``Mamba_block``
(src/DADiff.py:484-487) with its ``TransposedAttention`` (src/DADiff.py:
252-285):

    out = x + gate_mlp * project_out( blockdiag_softmax( (dw_q(x2 Wq))^T
                                       (dw_k(x2 Wk)) / norms * temp ) v )
    where x2 = LN(x) * (1 + scale_mlp) + shift_mlp,  v = dw_v(x2 Wv)

The XLA composition costs ~13 ms per 512^2 block at bs8 (r4 profile): the
LN-modulate kernel, two qkv projection einsums, two depthwise 3x3 convs, the
Gram matmul, the v@M matmul, the gated residual, and two ~1.3 ms relayout
copies at the conv/matmul layout boundaries — each a full pass over HBM.
Everything between reading x and writing the block output is either
pointwise, a per-image global reduction (the Gram matrix), or a tiny [C, C]
problem (softmax + projection fold), so the whole half fuses into ONE
Pallas kernel per batch image:

  - grid (B,): each cell manually DMAs its [H, W, C] image into a VMEM
    buffer with one zero pad row top+bottom (the 3x3 convs' SAME padding);
  - pass 1 (fori over row chunks): recompute x2 rows (LN+modulate), project
    to q|k on the MXU, depthwise-conv via 9 shifted fmas (rows are VMEM
    slices — no halo exchange), accumulate the [2C, 2C] Gram matrix;
  - mid: diagonal norms, per-head masked softmax, fold project_out into a
    single [C, C] matrix M (identical math to blocks.py:423-450);
  - pass 2: recompute x2 rows, project to v, depthwise-conv, out rows =
    x + gate * (v @ M), streamed back to HBM through a 2-slot DMA ring.

HBM traffic per block: read x twice + write out once (~3 image passes)
instead of ~13, and zero relayout copies (Pallas keeps row-major on both
ends).  The LN is computed twice (VPU time is cheap next to the passes).

Backward (training) remats through the XLA composition via custom VJP —
the same pattern as ops/ss2d_block.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_ch(H: int, W: int, C: int = 128) -> int:
    """Row-chunk length: bounds the f32 qk work array ((ch+2)*W*2C) to
    ~4 MB so chunk temporaries fit VMEM at every scale; divides H, >= 8."""
    cpad = max(C, 128)
    ch = max(8, (524288 // cpad) // max(W, 1))
    while ch > 8 and H % ch:
        ch //= 2
    if H % ch:
        ch = H  # tiny images: single chunk
    return min(ch, H)


def attn_block_route(H: int, W: int, C: int) -> bool:
    """Routing POLICY (distinct from the :func:`attn_block_ok` capability
    gate): should the fused kernel actually be used at this scale?

    r4 device-loop data (PROGRESS.md "in-model truth pass"): at C < 128 the
    image runs channel-padded to 128 inside the kernel — 2x lane work plus
    ~3.7 ms of pad ops — and is net ~equal to the XLA composition, so the
    default only routes C >= 128 scales where the kernel is a real win
    (standalone 34.6 vs 40.9 ms weighted over the 9 blocks).

    ``FOUNDDIFF_ATTN_BLOCK``: 'auto' (default, C >= 128) | 'on' (every
    scale the kernel handles) | 'off' (always the XLA composition)."""
    mode = os.environ.get("FOUNDDIFF_ATTN_BLOCK", "auto")
    if mode == "off":
        return False
    if not attn_block_ok(H, W, C):
        return False
    return mode == "on" or C >= 128


def attn_block_ok(H: int, W: int, C: int) -> bool:
    """Shapes the fused kernel handles: head structure C%32==0 (heads =
    C//32 as in MambaBlock), row chunking H%8==0, and the VMEM image buffer
    (lane-padded to 128 channels) within budget.

    C < 128 runs with the channel axis zero-padded to 128 OUTSIDE the
    kernel: Mosaic cannot DMA a sub-128-lane slice (the HBM memref is
    already physically padded to 128 lanes, so the pad moves no extra
    bytes), and the kernel corrects the LN stats / head mask with the real
    channel count."""
    if C % 32 or C < 32 or H % 8 or W % 8:
        return False
    ch = _pick_ch(H, W, C)
    if H % ch:
        return False
    # xbuf + out ring + ~8 fp32 chunk work arrays (2C wide), lanes >=128
    cpad = max(C, 128)
    xbuf = (H + 2) * W * cpad * 2
    obuf = 2 * ch * W * cpad * 2
    work = 8 * (ch + 2) * W * 2 * cpad * 4
    return xbuf + obuf + work < 116 * 1024 * 1024


def _attn_block_kernel(x_hbm, ms_ref, mt_ref, gate_ref, wqk_ref, wv_ref,
                       dqk_ref, dv_ref, temp_ref, proj_ref, o_hbm,
                       xbuf, obuf, gacc, mbuf, sem_x, sem_o, *,
                       H: int, W: int, C: int, CR: int, CH: int, heads: int,
                       eps: float):
    # C is the (possibly 128-padded) layout width; CR the real channel
    # count — LN statistics, the head mask, and temperature run on CR.
    b = pl.program_id(0)
    nch = H // CH
    io = xbuf.dtype

    @pl.when(b == 0)
    def _zero_pad_rows():
        xbuf[0] = jnp.zeros_like(xbuf[0])
        xbuf[H + 1] = jnp.zeros_like(xbuf[H + 1])

    cp = pltpu.make_async_copy(x_hbm.at[b], xbuf.at[pl.ds(1, H)], sem_x)
    cp.start()
    cp.wait()

    ms = ms_ref[0, 0].astype(jnp.float32)
    mt = mt_ref[0, 0].astype(jnp.float32)

    def x2_rows(r0):
        """x2 for padded rows [r0, r0+CH+2): LN (no affine, eps) + adaLN
        modulate (exactly norm_pallas._ln_mod_kernel), pad rows zeroed so
        the depthwise convs see SAME zero padding."""
        xs = xbuf[pl.ds(r0, CH + 2)].astype(jnp.float32)
        # pad lanes are zero, so plain sums / CR are the real-channel stats
        mean = jnp.sum(xs, axis=-1, keepdims=True) / CR
        var = jnp.sum(xs * xs, axis=-1, keepdims=True) / CR - mean * mean
        y = (xs - mean) * jax.lax.rsqrt(var + eps)
        y = y * (1.0 + ms) + mt
        ridx = jax.lax.broadcasted_iota(jnp.int32, (CH + 2, 1, 1), 0) + r0
        valid = (ridx >= 1) & (ridx <= H)
        return jnp.where(valid, y, 0.0).astype(io)

    def dwconv(u, dw_ref):
        """Depthwise 3x3 SAME over [CH+2, W, K] -> [CH, W, K] (io dtype);
        dw_ref [9, K] rows ordered (dr*3 + dc).  The two column shifts are
        built ONCE on the full padded chunk (2 concat passes) and the nine
        taps read row-offset views of them (free static slices + fma)."""
        K = u.shape[-1]
        zcol = jnp.zeros((CH + 2, 1, K), u.dtype)
        shifted = (
            jnp.concatenate([zcol, u[:, :-1]], axis=1),   # dc=0 tap
            u,                                            # dc=1
            jnp.concatenate([u[:, 1:], zcol], axis=1),    # dc=2
        )
        acc = jnp.zeros((CH, W, K), jnp.float32)
        for dr in range(3):
            for dc in range(3):
                acc += shifted[dc][dr : dr + CH].astype(
                    jnp.float32
                ) * dw_ref[3 * dr + dc].astype(jnp.float32)
        return acc.astype(io)

    def project(x2h, w_ref):
        K = w_ref.shape[-1]
        u = jax.lax.dot_general(
            x2h.reshape((CH + 2) * W, C), w_ref[...].astype(io),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(io)
        return u.reshape(CH + 2, W, K)

    # ---- pass 1: Gram accumulation over row chunks -------------------
    gacc[...] = jnp.zeros_like(gacc)

    def p1(i, _):
        r0 = pl.multiple_of(i * CH, CH)
        qk = dwconv(project(x2_rows(r0), wqk_ref), dqk_ref)
        q2 = qk.reshape(CH * W, 2 * C)
        gacc[...] += jax.lax.dot_general(
            q2, q2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, nch, p1, 0)

    # ---- mid: norms + per-head masked softmax + projection fold ------
    # (math identical to blocks.py TransposedAttention:423-450, with the
    # q/k halves kept in one [2C, 2C] problem to avoid sub-128 lane slices)
    G = gacc[...]  # [2C, 2C] f32
    C2 = 2 * C
    row = jax.lax.broadcasted_iota(jnp.int32, (C2, C2), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C2, C2), 1)
    eye = row == col
    # the diagonal as BOTH a column ([2C,1], axis-1 reduce) and a row
    # ([1,2C], axis-0 reduce) — same values, no in-kernel transpose
    diag_c = jnp.sum(jnp.where(eye, G, 0.0), axis=1, keepdims=True)
    diag_r = jnp.sum(jnp.where(eye, G, 0.0), axis=0, keepdims=True)
    inv_c = 1.0 / jnp.maximum(jnp.sqrt(diag_c), 1e-12)  # [2C, 1]
    inv_r = 1.0 / jnp.maximum(jnp.sqrt(diag_r), 1e-12)  # [1, 2C]
    ch_sz = CR // heads
    # temperature scales per q-ROW: build the [2C, 1] column from the tiny
    # heads vector with iota compares (static loop, heads <= C/32)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (C2, 1), 0)
    tcol = jnp.zeros((C2, 1), jnp.float32)
    for h in range(heads):
        tcol = tcol + jnp.where(
            row1 // ch_sz == h, temp_ref[0, h].astype(jnp.float32), 0.0
        )
    logits = G * (inv_c * tcol) * inv_r
    # real q rows x real k cols of the same head; pad rows softmax to all
    # zeros (fully masked) and contribute nothing to the fold
    mask = (
        (row < CR) & (col >= C) & (col - C < CR)
        & (row // ch_sz == (col - C) // ch_sz)
    )
    neg = jnp.float32(-1e30)
    rowmax = jnp.max(jnp.where(mask, logits, neg), axis=1, keepdims=True)
    e = jnp.where(mask, jnp.exp(logits - rowmax), 0.0)
    attn = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
    # fold project_out: T = attn^T @ [pk; 0]  ->  M = T[C:, :]  ([C, C])
    T = jax.lax.dot_general(
        attn, proj_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [2C, C]
    mbuf[...] = T[C:, :].astype(io)

    # ---- pass 2: v path + gated residual, streamed out ---------------
    gate = gate_ref[0, 0].astype(io)

    def p2(i, _):
        r0 = pl.multiple_of(i * CH, CH)
        slot = jax.lax.rem(i, 2)

        @pl.when(i >= 2)
        def _wait_prev():
            pltpu.make_async_copy(
                obuf.at[slot],
                o_hbm.at[b, pl.ds(pl.multiple_of((i - 2) * CH, CH), CH)],
                sem_o.at[slot],
            ).wait()

        v = dwconv(project(x2_rows(r0), wv_ref), dv_ref)
        o = jax.lax.dot_general(
            v.reshape(CH * W, C), mbuf[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(io)
        xrows = xbuf[pl.ds(r0 + 1, CH)].reshape(CH * W, C)
        out = xrows + gate * o
        obuf[slot] = out.reshape(CH, W, C)
        pltpu.make_async_copy(
            obuf.at[slot], o_hbm.at[b, pl.ds(r0, CH)], sem_o.at[slot]
        ).start()
        return 0

    jax.lax.fori_loop(0, nch, p2, 0)
    for tail in range(min(nch, 2)):
        i = nch - min(nch, 2) + tail
        slot = i % 2
        pltpu.make_async_copy(
            obuf.at[slot], o_hbm.at[b, pl.ds(i * CH, CH)], sem_o.at[slot]
        ).wait()


def _attn_block_fwd_only(x, mod_scale, mod_shift, gate, qkv_w, dw_w,
                         temperature, proj_w, heads, eps):
    B, H, W, CR = x.shape
    CH = _pick_ch(H, W, CR)
    io = x.dtype
    # Mosaic DMA legality: the image lane axis must be a multiple of 128 —
    # zero-pad the channel axis (the HBM tiles are physically 128-lane
    # padded anyway; the kernel corrects stats/mask with CR)
    C = max(CR, 128)
    wq = qkv_w[:, :CR].astype(io)
    wk = qkv_w[:, CR : 2 * CR].astype(io)
    wvr = qkv_w[:, 2 * CR :].astype(io)
    dflat = dw_w[:, :, 0, :].reshape(9, 3 * CR).astype(io)
    dq, dk, dvr = dflat[:, :CR], dflat[:, CR : 2 * CR], dflat[:, 2 * CR :]
    pcr = proj_w[0, 0].astype(jnp.float32)
    if C != CR:
        pad_r = lambda a: jnp.pad(a, ((0, C - CR), (0, 0)))
        pad_c = lambda a: jnp.pad(a, ((0, 0), (0, C - CR)))
        wq, wk, wvr = pad_c(pad_r(wq)), pad_c(pad_r(wk)), pad_c(pad_r(wvr))
        dq, dk, dvr = pad_c(dq), pad_c(dk), pad_c(dvr)
        pcr = pad_c(pad_r(pcr))
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, C - CR),))
        padv = lambda a: jnp.pad(a, ((0, 0), (0, C - CR)))
        mod_scale, mod_shift, gate = (
            padv(mod_scale), padv(mod_shift), padv(gate),
        )
    wqk = jnp.concatenate([wq, wk], axis=1)
    dqk = jnp.concatenate([dq, dk], axis=1)
    wv, dv = wvr, dvr
    temp = temperature.reshape(1, heads).astype(jnp.float32)
    # project_out kernel padded with a zero k-half so the fold runs on the
    # full [2C, .] problem (no sub-128-lane slicing in-kernel)
    pk2 = jnp.concatenate([pcr, jnp.zeros((C, C), jnp.float32)], axis=0)

    kernel = functools.partial(
        _attn_block_kernel, H=H, W=W, C=C, CR=CR, CH=CH, heads=heads,
        eps=eps,
    )
    vec = lambda r, c: pl.BlockSpec(
        (r, c), lambda b: (0, 0), memory_space=pltpu.VMEM
    )
    bvec = pl.BlockSpec(
        (1, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # x (HBM)
            bvec, bvec, bvec,                               # mod/gate
            vec(C, 2 * C), vec(C, C),                       # wqk, wv
            vec(9, 2 * C), vec(9, C),                       # dwconv taps
            vec(1, heads),                                  # temperature
            vec(2 * C, C),                                  # padded proj
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), io),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W, C), io),                  # padded image
            pltpu.VMEM((2, CH, W, C), io),                  # out ring
            pltpu.VMEM((2 * C, 2 * C), jnp.float32),        # Gram acc
            pltpu.VMEM((C, C), io),                         # folded M
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * B * H * W * C * (3 * C + 2 * C + C) * 2),
            bytes_accessed=int(3 * B * H * W * C * x.dtype.itemsize),
            transcendentals=B * H * W + B * 4 * C * C,
        ),
    )(
        x, mod_scale[:, None, :], mod_shift[:, None, :], gate[:, None, :],
        wqk, wv, dqk, dv, temp, pk2,
    )
    return out if C == CR else out[..., :CR]


def attn_block_xla(x, mod_scale, mod_shift, gate, qkv_w, dw_w, temperature,
                   proj_w, heads, eps):
    """Unfused reference composition (VJP remat path + parity tests):
    mirrors norm_pallas._xla_ln_mod + blocks.py TransposedAttention."""
    B, H, W, C = x.shape
    hd, ch = heads, C // heads
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = (xf * xf).mean(axis=-1, keepdims=True) - mean * mean
    x2 = (xf - mean) * jax.lax.rsqrt(var + eps)
    x2 = x2 * (1.0 + mod_scale[:, None, None, :].astype(jnp.float32)) + (
        mod_shift[:, None, None, :].astype(jnp.float32)
    )
    x2 = x2.astype(x.dtype)
    qkv_flat = qkv_w.astype(x.dtype)
    dn = ("NHWC", "HWIO", "NHWC")

    def pipe(lo, hi):
        u = jnp.einsum("bhwc,ce->bhwe", x2, qkv_flat[:, lo:hi])
        return jax.lax.conv_general_dilated(
            u, dw_w[..., lo:hi].astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=dn, feature_group_count=hi - lo,
        )

    qk = pipe(0, 2 * C).reshape(B, H * W, 2 * C)
    G = jnp.einsum("blc,bld->bcd", qk, qk, preferred_element_type=jnp.float32)
    diag = jnp.diagonal(G, axis1=1, axis2=2)
    qn = jnp.maximum(jnp.sqrt(diag[:, :C]), 1e-12).reshape(B, hd, ch)
    kn = jnp.maximum(jnp.sqrt(diag[:, C:]), 1e-12).reshape(B, hd, ch)
    qk_block = G[:, :C, C:]
    attn = jnp.stack(
        [
            qk_block[:, i * ch : (i + 1) * ch, i * ch : (i + 1) * ch]
            for i in range(hd)
        ],
        axis=1,
    )
    attn = attn / (qn[..., None] * kn[:, :, None, :])
    attn = jax.nn.softmax(attn * temperature, axis=-1)
    pk = proj_w[0, 0].reshape(hd, ch, C)
    M = jnp.einsum("hce,bhcd->bhde", pk.astype(jnp.float32), attn)
    M = M.reshape(B, C, C).astype(x.dtype)
    v = pipe(2 * C, 3 * C).reshape(B, H * W, C)
    out = jnp.einsum(
        "blf,bfe->ble", v, M, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    out = out.reshape(B, H, W, C)
    return x + gate[:, None, None, :].astype(x.dtype) * out


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _attn_block(x, mod_scale, mod_shift, gate, qkv_w, dw_w, temperature,
                proj_w, heads, eps):
    return _attn_block_fwd_only(
        x, mod_scale, mod_shift, gate, qkv_w, dw_w, temperature, proj_w,
        heads, eps,
    )


def _ab_fwd(x, mod_scale, mod_shift, gate, qkv_w, dw_w, temperature, proj_w,
            heads, eps):
    out = _attn_block_fwd_only(
        x, mod_scale, mod_shift, gate, qkv_w, dw_w, temperature, proj_w,
        heads, eps,
    )
    return out, (x, mod_scale, mod_shift, gate, qkv_w, dw_w, temperature,
                 proj_w)


def _ab_bwd(heads, eps, res, g):
    _, vjp = jax.vjp(
        lambda *a: attn_block_xla(*a, heads, eps), *res
    )
    return vjp(g)


_attn_block.defvjp(_ab_fwd, _ab_bwd)


def attn_block(x, mod_scale, mod_shift, gate, qkv_w, dw_w, temperature,
               proj_w, heads: int, eps: float = 1e-6):
    """Fused ``x + gate * TransposedAttention(modulate(LN(x)))``.

    x: [B, H, W, C]; mod_scale/mod_shift/gate: [B, C] adaLN chunks;
    qkv_w: [C, 3C] (the 1x1 qkv conv kernel, squeezed); dw_w: [3, 3, 1, 3C]
    depthwise taps; temperature: [heads, 1, 1]; proj_w: [1, 1, C, C].
    Requires :func:`attn_block_ok`.
    """
    return _attn_block(
        x, mod_scale, mod_shift, gate, qkv_w, dw_w,
        temperature.astype(jnp.float32), proj_w, heads, eps,
    )


__all__ = ["attn_block", "attn_block_ok", "attn_block_route",
           "attn_block_xla"]

"""Fully-fused SS2D block: scan + complete epilogue in the scan kernels.

TPU-native rebuild of the whole SS2D tail (reference src/emamba2.py:690-751
``forward_corev2`` + ``forward``) *and* the Mamba_block residual tail
(reference src/DADiff.py:484 ``x + gate * out``), fused into the two
image-direct scan kernels:

    out = x_raw + gate * out_proj( LN(scan(xs)) * silu(x1 @ W_z) + local )

Key observation: the EfficientMerge interleave (src/emamba2.py:236-263)
assigns each output PIXEL to exactly one scan direction — out[2i,2j]=dir0,
out[2i+1,2j]=dir1, out[2i,2j+1]=dir2, out[2i+1,2j+1]=dir3 — and every
epilogue op (out_norm LayerNorm, silu(z) gating, conditioning add, out_proj,
adaLN gating, residual add) is pointwise over pixels.  So the row-direction
scan kernel can produce the FINAL block output for the even rows and the
column-direction kernel for the odd rows, and the intermediate direction
sequences ``ys`` (the largest activation of the block), the separate
epilogue kernel, and the z half of ``in_proj``'s output never touch HBM.

Per 512^2 SS2D at batch 8 this removes ~2.7 GB of HBM traffic (ys write +
read, z write + read) plus the epilogue kernel launch and its Pallas-
boundary relayout copies.

The two kernels write disjoint row-parity planes of ONE output buffer: the
column call aliases the row call's output (``input_output_aliases``), so the
halves combine in place with no interleave copy.

Backward (training) remats through the XLA composition + the Pallas scan
backward via custom VJP, the same pattern as ``ops.ss2d_fused``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from founddiff_tpu.ops.scan_pallas import (
    _pick_tile,
    _resolve_tiles,
    _scan_image,
    _tile_scan,
)


def _scan_block_kernel(x_ref, x1_ref, xr_ref, wz_ref, wd_ref, wb_ref, wc_ref,
                       a_ref, d_ref, bias_ref, lng_ref, lnb_ref, loc_ref,
                       pw_ref, gate_ref, o_ref, h_ref, pair_s_ref, y_s_ref,
                       *, chunk: int,
                       subchunk: int, softplus: bool, col_major: bool,
                       D: int, C0: int, eps: float, has_local: bool,
                       silu_input: bool = False):
    """One grid cell: scan both pixel-parity directions of one orientation
    AND apply the full epilogue, writing final block-output pixels.

    Row variant blocks: x [1, s, 1, W, D] (pi=0 xs_conv plane),
      x1/xr/o [1, s, 1, W, C0].
    Col variant blocks: x [1, H2, 1, ws, D] (pi=1 plane),
      x1/xr/o [1, H2, 1, ws, C0].
    wz [1, C0, D] / pw [1, D, C0]: raw projections (the epilogue runs in
    flat pixel order, so no pair stacking); lng/lnb [1, D]; loc [1, 1, D]
    and gate [1, 1, C0] per batch.  Scratch h_ref: [B, 2, N, D].

    ``subchunk``: the [N, *, D] scan work arrays are materialized
    ``subchunk`` timesteps at a time so deep UNet scales (large N*D) stay
    within VMEM; the sub-chunks run as ONE ``fori_loop`` body (a static
    unroll keeps every iteration's work arrays live on the Mosaic stack —
    measured 127 MB at the mid scale) staged through the ``pair_s``/``y_s``
    VMEM scratch, and the state carry chains across sub-chunks exactly as
    across grid cells.
    """
    S = chunk
    SC = subchunk
    n_sub = S // SC
    b = pl.program_id(1)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[b] = jnp.zeros_like(h_ref[b])

    TILE = _pick_tile(SC, D)
    ntiles = SC // TILE
    local_idx = jax.lax.broadcasted_iota(jnp.int32, (1, SC, 1), 1) % TILE

    def seq(ref):
        """xs block -> [S, 2D] pair-lane scan sequence, entirely in VMEM.

        Blocks arrive as H-split-only views ([B, H2, 2, W, D] — a true
        bitcast of the NHWC image; lane-merged [.., W2, 2D] HBM views are
        PHYSICAL reshapes on TPU tiled layouts, ~1.5 ms/tensor at 512^2).
        The in-VMEM lane merge moves whole vregs (D >= 128 always for
        d_inner).  Rows: [s, W, D] -> [S, 2D] merges column pairs into
        lanes; cols additionally transpose to column-major order."""
        t = ref[0, :, 0, :, :]
        if col_major:
            t = t.reshape(t.shape[0], t.shape[1] // 2, 2, D)
            t = jnp.transpose(t, (1, 0, 2, 3))  # [ws2, H2, 2, D]
        return t.reshape(S, 2 * D)

    def flat(ref):
        """C0-channel block -> [2S, C0] in flat pixel order (a pure sublane
        relabel — C0 < 128 lane merges are unsupported shape casts)."""
        return ref[0, :, 0, :, :].reshape(2 * S, C0)

    pair = seq(x_ref)                 # xs_conv, io dtype
    if silu_input:
        # FOUNDDIFF_SILU=kernel: the kernel receives the RAW dwconv output
        # and applies silu here — removes the separate XLA silu HBM pass
        # (~1.7 ms/scale at 512^2, r5 trace) at the cost of one in-VMEM
        # sigmoid+mul over [S, 2D]
        pf = pair.astype(jnp.float32)
        pair = (pf * jax.nn.sigmoid(pf)).astype(pair.dtype)
    # z for ALL the block's pixels in one MXU matmul, flat pixel order;
    # rounded to io dtype so the gating matches the unfused path's bf16
    # in_proj output bit-for-bit
    zf = jax.lax.dot_general(
        flat(x1_ref), wz_ref[0].astype(x1_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(pair.dtype)              # [2S, D]
    xrf = flat(xr_ref).astype(jnp.float32)  # residual (raw x)

    lng = lng_ref[0].astype(jnp.float32)
    lnb = lnb_ref[0].astype(jnp.float32)

    def dir_step(x_io, j, carry):
        """Scan ``x_io`` [SC, D] (one direction, one sub-chunk) from state
        ``carry`` [N, D]; returns (y [SC, D] f32, new carry)."""
        u = x_io.astype(jnp.float32)
        dl_raw = (
            jax.lax.dot_general(
                x_io, wd_ref[0, j].astype(x_io.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bias_ref[0, j]
        )
        dl = jax.nn.softplus(dl_raw) if softplus else dl_raw
        bmat = jnp.swapaxes(
            jax.lax.dot_general(
                x_io, wb_ref[0, j].astype(x_io.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ), 0, 1,
        )[:, :, None]
        cmat = jnp.swapaxes(
            jax.lax.dot_general(
                x_io, wc_ref[0, j].astype(x_io.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ), 0, 1,
        )[:, :, None]
        a_g = a_ref[0, j]
        abar = jnp.exp(dl[None, :, :] * a_g[:, None, :])
        bbar = (dl * u)[None, :, :] * bmat
        if _hs_dtype() == "bf16":
            # experiment: run the in-tile Hillis-Steele passes on packed
            # bf16 (2 values/lane) — error bounded by TILE steps since the
            # cross-tile resolve stays f32
            a_sc, b_sc = _tile_scan(
                abar.astype(jnp.bfloat16), bbar.astype(jnp.bfloat16),
                TILE, local_idx,
            )
            a_sc = a_sc.astype(jnp.float32)
            b_sc = b_sc.astype(jnp.float32)
        else:
            a_sc, b_sc = _tile_scan(abar, bbar, TILE, local_idx)
        h_all, carry = _resolve_tiles(a_sc, b_sc, carry, TILE, ntiles)
        return jnp.sum(h_all * cmat, axis=0) + d_ref[0, j] * u, carry

    dir_ys = []
    if n_sub == 1:
        for j in (0, 1):
            y, carry = dir_step(pair[:, j * D : (j + 1) * D], j, h_ref[b, j])
            h_ref[b, j] = carry
            dir_ys.append(y)
    else:
        # sub-chunked: one fori body (work arrays reused) staged via scratch
        pair_s_ref[...] = pair
        for j in (0, 1):

            def body(q, h, j=j):
                off = pl.multiple_of(q * SC, SC)
                y_q, h = dir_step(
                    pair_s_ref[pl.ds(off, SC), j * D : (j + 1) * D], j, h
                )
                y_s_ref[j, pl.ds(off, SC), :] = y_q
                return h

            h_ref[b, j] = jax.lax.fori_loop(0, n_sub, body, h_ref[b, j])
        dir_ys = [y_s_ref[0], y_s_ref[1]]

    # interleave the two directions' outputs back to FLAT pixel order
    # (sublane relabels + one full-vreg transpose for cols), then run the
    # whole epilogue vectorized over all the block's pixels
    yp = jnp.stack(dir_ys, axis=1)  # [S, 2, D]
    if col_major:
        H2 = o_ref.shape[1]
        yp = jnp.transpose(yp.reshape(-1, H2, 2, D), (1, 0, 2, 3))
    yf = yp.reshape(2 * S, D)

    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(yf * yf, axis=-1, keepdims=True) - mean * mean
    yn = (yf - mean) * jax.lax.rsqrt(var + eps) * lng + lnb
    zf32 = zf.astype(jnp.float32)
    og = yn * (zf32 * jax.nn.sigmoid(zf32))
    if has_local:
        og = og + loc_ref[0].astype(jnp.float32)  # [1, D] broadcast
    # out_proj on the MXU + adaLN gate + residual add
    fp = jax.lax.dot_general(
        og.astype(pair.dtype), pw_ref[0].astype(pair.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [2S, C0]
    fin = xrf + gate_ref[0].astype(jnp.float32) * fp
    o_ref[0, :, 0, :, :] = fin.reshape(o_ref.shape[1], -1, C0).astype(
        o_ref.dtype
    )


def _hs_dtype() -> str:
    """'f32' (default) | 'bf16': dtype of the in-tile Hillis-Steele passes.

    Read at call (trace) time so toggling FOUNDDIFF_HS_DTYPE between jit
    compiles takes effect (ADVICE r4).  CAUTION: in bf16 mode the forward
    runs bf16 HS while the custom-VJP backward remats an f32 XLA
    composition — gradients then correspond to different forward math, so
    keep bf16 mode out of training runs (serving/bench only)."""
    return os.environ.get("FOUNDDIFF_HS_DTYPE", "f32")

_WORK_BUDGET = 16 * 1024 * 1024  # [N, SC, D] fp32 work arrays (~4 live)
_SINGLE_BUDGET = 40 * 1024 * 1024


def _pick_block_geom(major, minor, D, N, B, col_major):
    """(s, SC): column-block width and interior sub-chunk length.

    Prefers the legacy single-pass geometry (``_pick_image_s``); deep UNet
    scales (large N*D) fall back to s=8 (Mosaic-legal) with the scan
    sub-chunked ``SC`` steps at a time inside the kernel."""
    if major % 8 == 0:
        s = 8  # Mosaic-legal at every scale; grid C = major/8 pipelines DMA
    elif col_major:
        s = major  # 'full dim' is always Mosaic-legal
    else:
        s = major if major < 8 else 8
        while s > 1 and major % s:
            s //= 2
    S = s * minor
    per = 4 * N * D * 4
    sc = min(S, max(8, _WORK_BUDGET // per))
    while sc > 1 and (S % sc or (sc % 8 and sc != S)):
        sc -= 1
    return s, max(sc, 1)


def block_scan_ok(H: int, W: int, d_inner: int, d_state: int) -> bool:
    """Whether the fully-fused block kernels handle this shape: even H/W
    (step-2 decimation) and a Mosaic-legal geometry whose largest live
    VMEM residents fit the budget at every orientation."""
    if H % 2 or W % 2 or H < 4 or W < 4:
        return False
    H2, W2 = H // 2, W // 2
    for col in (False, True):
        minor = H2 if col else W2
        major = W2 if col else H2
        s, sc = _pick_block_geom(major, minor, d_inner, d_state, 1, col)
        if s <= 0 or (major % s) or ((s * minor) % sc):
            return False
        if 4 * d_state * sc * d_inner * 4 > _SINGLE_BUDGET:
            return False
        # full-sequence [S, 2D]-class residents (pair/zp/y/op, ~6 fp32-ish)
        if 6 * (s * minor) * 2 * d_inner * 4 > 48 * 1024 * 1024:
            return False
    return True


def _block_call(x5, x1v, xrv, wz2, w_delta, w_b, w_c, a_k, d_k, bias_k,
                lng, lnb, locp, pw2, gatep, *, col_major: bool,
                softplus: bool, eps: float, has_local: bool,
                silu_input: bool = False, out_alias=None):
    """One orientation of the fused block.  x5: [B, H2, 2, W, D];
    x1v/xrv: [B, H2, 2, W, C0] — H-split-only views (true bitcasts of the
    NHWC images; the pair merge happens in VMEM, see ``seq``); weights
    pre-stacked per orientation.  Writes the orientation's row-parity plane
    of a [B, H2, 2, W, C0] output; ``out_alias`` (the other orientation's
    output) is donated so the planes combine in place."""
    B, H2, _, W, D = x5.shape
    W2 = W // 2
    C0 = x1v.shape[-1]
    N = a_k.shape[1]
    minor = H2 if col_major else W2
    major = W2 if col_major else H2
    s, SC = _pick_block_geom(major, minor, D, N, B, col_major)
    assert s > 0 and major % s == 0, "caller must gate on block_scan_ok"
    S = s * minor
    C = major // s

    if col_major:
        ws = 2 * s  # block width in image columns (both pair parities)
        x_spec = pl.BlockSpec(
            (1, H2, 1, ws, D), lambda c, b: (b, 0, 1, c, 0),
            memory_space=pltpu.VMEM,
        )
        img_spec = pl.BlockSpec(
            (1, H2, 1, ws, C0), lambda c, b: (b, 0, 1, c, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        x_spec = pl.BlockSpec(
            (1, s, 1, W, D), lambda c, b: (b, c, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        img_spec = pl.BlockSpec(
            (1, s, 1, W, C0), lambda c, b: (b, c, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    per_k = lambda *dims: pl.BlockSpec(
        (1, 2) + dims, lambda c, b: (0, 0) + (0,) * len(dims),
        memory_space=pltpu.VMEM,
    )
    full2 = lambda d0, d1: pl.BlockSpec(
        (1, d0, d1), lambda c, b: (0, 0, 0), memory_space=pltpu.VMEM
    )
    vec = lambda d: pl.BlockSpec(
        (1, d), lambda c, b: (0, 0), memory_space=pltpu.VMEM
    )
    # per-batch vectors carry a dummy middle dim so the block's last two
    # dims equal the array dims (Mosaic block-shape rule)
    bvec = lambda d: pl.BlockSpec(
        (1, 1, d), lambda c, b: (b, 0, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _scan_block_kernel, chunk=S, subchunk=SC, softplus=softplus,
        col_major=col_major, D=D, C0=C0, eps=eps, has_local=has_local,
        silu_input=silu_input,
    )
    inputs = [
        x5, x1v, xrv, wz2[None], w_delta[None], w_b[None], w_c[None],
        a_k[None], d_k[None], bias_k[None], lng.reshape(1, D),
        lnb.reshape(1, D), locp, pw2[None], gatep,
    ]
    in_specs = [
        x_spec, img_spec, img_spec,
        full2(C0, D),                               # wz (z half of in_proj)
        per_k(D, D), per_k(D, N), per_k(D, N),      # scan projections
        per_k(N, D), per_k(1, D), per_k(1, D),      # A, Dskip, bias
        vec(D), vec(D),                             # out_norm affine
        bvec(D),                                    # local [B, 1, D]
        full2(D, C0),                               # out_proj
        bvec(C0),                                   # adaLN gate [B, 1, C0]
    ]
    kwargs = {}
    if out_alias is not None:
        # donate the other orientation's output: this call fills the
        # complementary row-parity plane in place
        inputs.append(out_alias)
        in_specs.append(
            # minimal Mosaic-legal block (8-row sliver); the ref is unused —
            # the alias only donates the buffer
            pl.BlockSpec(
                (1, 1, 1, 8, C0), lambda c, b: (0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        kwargs["input_output_aliases"] = {len(inputs) - 1: 0}
    out = pl.pallas_call(
        # with an aliased extra input, drop its (unused) ref before the
        # kernel body: refs = 15 real inputs [+ alias] + out + scratch
        (kernel if out_alias is None else
         (lambda *refs: kernel(*refs[:15], *refs[16:]))),
        interpret=jax.default_backend() != "tpu",
        grid=(C, B),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, s, 1, W, C0) if not col_major else (1, H2, 1, ws, C0),
            (lambda c, b: (b, c, 0, 0, 0)) if not col_major
            else (lambda c, b: (b, 0, 1, c, 0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H2, 2, W, C0), xrv.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, 2, N, D), jnp.float32),   # carried scan states
            pltpu.VMEM((S, 2 * D), x5.dtype),        # staged pair sequence
            pltpu.VMEM((2, S, D), jnp.float32),      # per-direction y
        ],
        compiler_params=pltpu.CompilerParams(
            # deep scales carry double-buffered [D, D]-class weights plus
            # the sub-chunked work arrays; v5e has 128M VMEM/core
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(
                60 * B * H2 * W2 * 2 * N * D
                + 4 * B * H2 * W2 * 2 * D * (D + 2 * N + 4 * C0)
            ),
            bytes_accessed=int(
                B * H2 * W2 * 2 * (2 * D + 3 * 2 * C0) * x5.dtype.itemsize
            ),
            transcendentals=2 * B * H2 * W2 * 2 * N * D,
        ),
        **kwargs,
    )(*inputs)
    return out


def _derive_weights(x_proj_weight, dt_projs_weight, dt_rank, d_state):
    R, N = dt_rank, d_state
    wx = x_proj_weight
    w_delta = jnp.einsum("krd,ker->kde", wx[:, :R, :], dt_projs_weight)
    w_b = jnp.transpose(wx[:, R : R + N, :], (0, 2, 1))
    w_c = jnp.transpose(wx[:, R + N : R + 2 * N, :], (0, 2, 1))
    return w_delta, w_b, w_c


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18))
def _ss2d_image_block(x1, xs_conv, x_raw, w_z, w_delta, w_b, w_c, A, Dskip,
                      delta_bias, ln_g, ln_b, local, proj_w, gate,
                      delta_softplus, has_local, eps, silu_input):
    return _ss2d_image_block_fwd_only(
        x1, xs_conv, x_raw, w_z, w_delta, w_b, w_c, A, Dskip, delta_bias,
        ln_g, ln_b, local, proj_w, gate, delta_softplus, has_local, eps,
        silu_input,
    )


def _ss2d_image_block_fwd_only(x1, xs_conv, x_raw, w_z, w_delta, w_b, w_c, A,
                               Dskip, delta_bias, ln_g, ln_b, local, proj_w,
                               gate, delta_softplus, has_local, eps,
                               silu_input=False):
    B, H, W, D = xs_conv.shape
    C0 = x_raw.shape[-1]
    # H-split-only views: true bitcasts of the NHWC images whatever the
    # channel count (lane-merged [.., W2, 2ch] views are physical reshapes
    # on TPU tiled layouts); the pair merge happens inside the kernels
    x5 = xs_conv.reshape(B, H // 2, 2, W, D)
    x1v = x1.reshape(B, H // 2, 2, W, C0)
    xrv = x_raw.reshape(B, H // 2, 2, W, C0)

    a_k = jnp.transpose(A.astype(jnp.float32), (0, 2, 1))  # [K, N, D]
    d_k = Dskip.astype(jnp.float32)[:, None, :]
    bias_k = delta_bias.astype(jnp.float32)[:, None, :]
    io = xs_conv.dtype
    wz2 = w_z.astype(io)
    pw2 = proj_w.astype(io)
    locp = local[:, None, :]           # [B, 1, D]
    gatep = gate[:, None, :].astype(io)  # [B, 1, C0]

    rows_idx = jnp.asarray([0, 2])  # (pi=0): row-major dirs
    cols_idx = jnp.asarray([1, 3])  # (pi=1): column-major dirs
    pick = lambda w, idx: w[idx]
    common = dict(softplus=delta_softplus, eps=eps, has_local=has_local,
                  silu_input=silu_input)
    out_rows = _block_call(
        x5, x1v, xrv, wz2, pick(w_delta, rows_idx), pick(w_b, rows_idx),
        pick(w_c, rows_idx), pick(a_k, rows_idx), pick(d_k, rows_idx),
        pick(bias_k, rows_idx), ln_g, ln_b, locp, pw2, gatep,
        col_major=False, **common,
    )
    out = _block_call(
        x5, x1v, xrv, wz2, pick(w_delta, cols_idx), pick(w_b, cols_idx),
        pick(w_c, cols_idx), pick(a_k, cols_idx), pick(d_k, cols_idx),
        pick(bias_k, cols_idx), ln_g, ln_b, locp, pw2, gatep,
        col_major=True, out_alias=out_rows, **common,
    )
    return out.reshape(B, H, W, C0)


def _xla_compose(x1, xs_conv, x_raw, w_z, w_delta, w_b, w_c, A, Dskip,
                 delta_bias, ln_g, ln_b, local, proj_w, gate,
                 delta_softplus, has_local, eps, silu_input=False):
    """Unfused reference composition (the VJP remat path); the scan itself
    still uses the Pallas image kernels + Pallas backward, falling back to
    the decimated [B, K, L, D] kernel at deep scales where the image
    kernels' single-pass chunk would blow VMEM (same gate as the model's
    unfused path, models/ss2d.py)."""
    from founddiff_tpu.ops.scan_pallas import image_scan_vmem_ok
    from founddiff_tpu.ops.ss2d_fused import _merge_ln_gate_xla

    B, H, W, D = xs_conv.shape
    N = A.shape[-1]
    if silu_input:
        xs_conv = xs_conv * jax.nn.sigmoid(xs_conv)
    if image_scan_vmem_ok(H, W, D, N):
        ys_rows, ys_cols = _scan_image(
            xs_conv, w_delta, w_b, w_c, A, Dskip, delta_bias, delta_softplus
        )
        ys = jnp.stack(
            [ys_rows[:, 0], ys_cols[:, 0], ys_rows[:, 1], ys_cols[:, 1]],
            axis=1,
        )
    else:
        from founddiff_tpu.ops.selective_scan import (
            efficient_scan,
            selective_scan,
        )

        xs = efficient_scan(xs_conv, 2)  # [B, K, L, D]
        dts = jnp.einsum("bkld,kde->bkle", xs, w_delta.astype(xs.dtype))
        Bs = jnp.einsum("bkld,kdn->bkln", xs, w_b.astype(xs.dtype))
        Cs = jnp.einsum("bkld,kdn->bkln", xs, w_c.astype(xs.dtype))
        ys = selective_scan(
            xs, dts, A, Bs, Cs, Dskip, delta_bias=delta_bias,
            delta_softplus=delta_softplus,
        ).astype(xs_conv.dtype)
    z = jnp.einsum("bhwc,cd->bhwd", x1, w_z.astype(x1.dtype))
    return _merge_ln_gate_xla(
        ys, z, ln_g, ln_b, local if has_local else None, H, W, eps,
        gate_silu=True, proj_w=proj_w, gate=gate, rx=x_raw,
    )


def _sib_fwd(x1, xs_conv, x_raw, w_z, w_delta, w_b, w_c, A, Dskip,
             delta_bias, ln_g, ln_b, local, proj_w, gate, delta_softplus,
             has_local, eps, silu_input):
    out = _ss2d_image_block_fwd_only(
        x1, xs_conv, x_raw, w_z, w_delta, w_b, w_c, A, Dskip, delta_bias,
        ln_g, ln_b, local, proj_w, gate, delta_softplus, has_local, eps,
        silu_input,
    )
    return out, (x1, xs_conv, x_raw, w_z, w_delta, w_b, w_c, A, Dskip,
                 delta_bias, ln_g, ln_b, local, proj_w, gate)


def _sib_bwd(delta_softplus, has_local, eps, silu_input, res, g):
    args = res
    _, vjp = jax.vjp(
        lambda *a: _xla_compose(*a, delta_softplus, has_local, eps,
                                silu_input), *args
    )
    return vjp(g)


_ss2d_image_block.defvjp(_sib_fwd, _sib_bwd)


def ss2d_image_block(
    x1, xs_conv, x_raw,
    w_z, x_proj_weight, dt_projs_weight, A, Dskip, delta_bias,
    ln_g, ln_b, local, proj_w, gate,
    dt_rank: int, d_state: int, delta_softplus: bool = True,
    eps: float = 1e-5, silu_input: bool = False,
):
    """The complete fused SS2D + MambaBlock-tail:

        x_raw + gate * out_proj( LN(scan(xs_conv)) * silu(x1 @ w_z) + local )

    x1: [B,H,W,C0] modulated block input; xs_conv: [B,H,W,D] post-dwconv
    scan input (pre-silu when ``silu_input`` — the silu then runs inside
    the kernels); x_raw: [B,H,W,C0] residual; w_z: [C0,D] (z half of in_proj);
    proj_w: [D,C0]; gate: [B,C0]; local: [B,D] or None; ln_g/ln_b: [D].
    Requires even H/W, step_size=2 and ``image_scan_vmem_ok``.
    """
    w_delta, w_b, w_c = _derive_weights(
        x_proj_weight, dt_projs_weight, dt_rank, d_state
    )
    has_local = local is not None
    if local is None:
        local = jnp.zeros((x1.shape[0], xs_conv.shape[-1]), xs_conv.dtype)
    io = xs_conv.dtype
    return _ss2d_image_block(
        x1, xs_conv, x_raw, w_z.astype(io), w_delta.astype(io),
        w_b.astype(io), w_c.astype(io), A, Dskip, delta_bias, ln_g, ln_b,
        local, proj_w, gate, delta_softplus, has_local, eps, silu_input,
    )


# ---------------------------------------------------------------------------
# Unified whole-MambaBlock-first-half kernel (r4): LN+adaLN-modulate,
# in_proj (both halves), depthwise 3x3 conv, silu, the four decimated scans
# AND the complete epilogue in the two orientation kernels.  The kernels
# read ONLY the raw block input x (plus weights) and write the final
# ``x + gate * out_proj(...)`` — x1, the z half, and the conv'd scan input
# xs never touch HBM.  Replaces ~15 ms of XLA-side pre-scan work per UNet
# forward (in_proj einsum + dwconv fusion + silu + the Pallas-boundary
# relayout copies) and the separate LN-mod kernels (r4 profile).
#
# Halo handling (the 3x3 conv needs neighbors):
#   * row kernel (even image rows): the taps at even row 2k read odd rows
#     2k-1 / 2k+1 = pair rows k-1 / k of the SAME block, except k-1 at the
#     block's first pair — kept as a one-row scratch carried from the
#     previous grid cell (grid iterates row-chunks sequentially per image).
#   * column kernel (odd image rows): row taps live in-block (both pixel
#     parities are loaded); the RIGHT halo column belongs to the NEXT
#     strip, so the kernel runs one strip DELAYED: cell c computes x1 of
#     strip c, then processes strip c-1 with scratches from cells c-1/c-2
#     (grid has one extra trailing cell; revisited output blocks are
#     rewritten, last write wins).
# ---------------------------------------------------------------------------




__all__ = ["ss2d_image_block", "block_scan_ok"]

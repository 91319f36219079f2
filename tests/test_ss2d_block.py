"""Tests for the fully-fused SS2D block kernel (ops/ss2d_block.py).

The fused path must match the unfused XLA composition bit-for-fp32 across
shallow (single-pass), deep (sub-chunked), non-square, and tiny shapes, and
the SS2D/MambaBlock modules must produce identical param trees and outputs
whichever path executes (reference semantics: src/emamba2.py:690-751 +
src/DADiff.py:453-488).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from founddiff_tpu.ops.ss2d_block import (
    _derive_weights,
    _pick_block_geom,
    _xla_compose,
    block_scan_ok,
    ss2d_image_block,
)


def _inputs(B, H, W, C0, D, N, R, seed):
    rs = np.random.RandomState(seed)
    return dict(
        x1=jnp.asarray(rs.randn(B, H, W, C0), jnp.float32) * 0.5,
        xs=jnp.asarray(rs.randn(B, H, W, D), jnp.float32) * 0.5,
        xr=jnp.asarray(rs.randn(B, H, W, C0), jnp.float32),
        wz=jnp.asarray(rs.randn(C0, D), jnp.float32) * 0.05,
        xw=jnp.asarray(rs.randn(4, R + 2 * N, D), jnp.float32) * 0.05,
        dtw=jnp.asarray(rs.randn(4, D, R), jnp.float32) * 0.1,
        A=-jnp.abs(jnp.asarray(rs.randn(4, D, N), jnp.float32)),
        Ds=jnp.asarray(rs.randn(4, D), jnp.float32),
        bias=jnp.asarray(rs.randn(4, D) * 0.1, jnp.float32),
        lng=jnp.asarray(rs.randn(D), jnp.float32) * 0.1 + 1,
        lnb=jnp.asarray(rs.randn(D), jnp.float32) * 0.1,
        loc=jnp.asarray(rs.randn(B, D), jnp.float32) * 0.2,
        pw=jnp.asarray(rs.randn(D, C0), jnp.float32) * 0.05,
        gate=jnp.asarray(rs.randn(B, C0), jnp.float32) * 0.3,
    )


def _run_both(i, R, N, local=True):
    out = ss2d_image_block(
        i["x1"], i["xs"], i["xr"], w_z=i["wz"], x_proj_weight=i["xw"],
        dt_projs_weight=i["dtw"], A=i["A"], Dskip=i["Ds"],
        delta_bias=i["bias"], ln_g=i["lng"], ln_b=i["lnb"],
        local=i["loc"] if local else None, proj_w=i["pw"], gate=i["gate"],
        dt_rank=R, d_state=N,
    )
    wd, wb, wc = _derive_weights(i["xw"], i["dtw"], R, N)
    ref = _xla_compose(
        i["x1"], i["xs"], i["xr"], i["wz"], wd, wb, wc, i["A"], i["Ds"],
        i["bias"], i["lng"], i["lnb"], i["loc"], i["pw"], i["gate"],
        True, local, 1e-5,
    )
    return out, ref


@pytest.mark.parametrize(
    "B,H,W,C0,D,N,R",
    [
        (2, 32, 32, 64, 128, 4, 8),     # shallow, single-pass
        (1, 64, 64, 256, 512, 32, 16),  # deep: sub-chunked interior
        (1, 16, 24, 32, 128, 8, 8),     # non-square, W2 % 8 != 0
        (1, 8, 8, 32, 128, 4, 8),       # tiny
    ],
)
def test_fused_block_matches_xla(B, H, W, C0, D, N, R):
    assert block_scan_ok(H, W, D, N)
    i = _inputs(B, H, W, C0, D, N, R, seed=B + H + W)
    out, ref = _run_both(i, R, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_block_no_local():
    i = _inputs(1, 16, 16, 32, 64, 4, 8, seed=7)
    out, ref = _run_both(i, 8, 4, local=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_deep_geometry_subchunks():
    s, sc = _pick_block_geom(32, 32, 512, 32, 1, col_major=True)
    assert s == 8 and (s * 32) % sc == 0 and sc < s * 32
    # work arrays bounded
    assert 4 * 32 * sc * 512 * 4 <= 24 * 1024 * 1024


def test_fused_block_grads_match():
    R, N = 8, 4
    i = _inputs(1, 16, 16, 32, 64, N, R, seed=11)

    def loss_fused(x1, xs, wz, pw):
        o = ss2d_image_block(
            x1, xs, i["xr"], w_z=wz, x_proj_weight=i["xw"],
            dt_projs_weight=i["dtw"], A=i["A"], Dskip=i["Ds"],
            delta_bias=i["bias"], ln_g=i["lng"], ln_b=i["lnb"],
            local=i["loc"], proj_w=pw, gate=i["gate"], dt_rank=R, d_state=N,
        )
        return jnp.sum(o * o)

    def loss_ref(x1, xs, wz, pw):
        wd, wb, wc = _derive_weights(i["xw"], i["dtw"], R, N)
        o = _xla_compose(x1, xs, i["xr"], wz, wd, wb, wc, i["A"], i["Ds"],
                         i["bias"], i["lng"], i["lnb"], i["loc"], pw,
                         i["gate"], True, True, 1e-5)
        return jnp.sum(o * o)

    args = (i["x1"], i["xs"], i["wz"], i["pw"])
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_ss2d_module_fused_equals_chunked():
    from founddiff_tpu.models.ss2d import SS2D

    rs = np.random.RandomState(1)
    B, H, W, C = 2, 16, 16, 64
    x = jnp.asarray(rs.randn(B, H, W, C), jnp.float32) * 0.5
    c = jnp.asarray(rs.randn(B, 1, 256), jnp.float32)
    gate = jnp.asarray(rs.randn(B, C), jnp.float32) * 0.3
    res = jnp.asarray(rs.randn(B, H, W, C), jnp.float32)
    m_f = SS2D(d_model=C, d_state=4, scan_impl="pallas_fused")
    m_u = SS2D(d_model=C, d_state=4, scan_impl="chunked")
    p = m_u.init(jax.random.PRNGKey(0), x, c, gate=gate, residual=res)
    p2 = m_f.init(jax.random.PRNGKey(0), x, c, gate=gate, residual=res)
    # identical param trees whichever path traces
    f1 = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(p)}
    f2 = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(p2)}
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_allclose(np.asarray(f1[k]), np.asarray(f2[k]),
                                   err_msg=k)
    o_u = m_u.apply(p, x, c, gate=gate, residual=res)
    o_f = m_f.apply(p, x, c, gate=gate, residual=res)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_u),
                               rtol=2e-5, atol=2e-5)


def test_mamba_block_fused_equals_chunked():
    from founddiff_tpu.models.ss2d import MambaBlock

    rs = np.random.RandomState(3)
    B, H, W, C = 2, 16, 16, 64
    x = jnp.asarray(rs.randn(B, H, W, C), jnp.float32) * 0.5
    c = jnp.asarray(rs.randn(B, 1, 256), jnp.float32)
    t = jnp.asarray(rs.randn(B, 256), jnp.float32)
    mb_f = MambaBlock(hidden_size=C, d_state=4, scan_impl="pallas_fused")
    mb_u = MambaBlock(hidden_size=C, d_state=4, scan_impl="chunked")
    pm = mb_u.init(jax.random.PRNGKey(2), x, c, t)
    ob_u = mb_u.apply(pm, x, c, t)
    ob_f = mb_f.apply(pm, x, c, t)
    np.testing.assert_allclose(np.asarray(ob_f), np.asarray(ob_u),
                               rtol=2e-5, atol=2e-5)

    def loss(fn, p_):
        return jnp.sum(fn.apply(p_, x, c, t) ** 2)

    gf = jax.grad(lambda p_: loss(mb_f, p_))(pm)
    gu = jax.grad(lambda p_: loss(mb_u, p_))(pm)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gf)}
    flat_u = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gu)}
    for k in flat_u:
        np.testing.assert_allclose(np.asarray(flat_f[k]),
                                   np.asarray(flat_u[k]),
                                   rtol=5e-4, atol=1e-5, err_msg=k)


# ---------------------------------------------------------------------------
# Unified whole-first-half kernel (ss2d_mamba_block): LN-mod + in_proj +
# dwconv + silu fused in-kernel.
# ---------------------------------------------------------------------------


def _mb_inputs(B, H, W, C0, D, N, R, seed):
    rs = np.random.RandomState(seed)
    f = lambda *s: jnp.asarray(rs.randn(*s) * 0.1, jnp.float32)
    return dict(
        x=jnp.asarray(rs.randn(B, H, W, C0), jnp.float32) * 0.5,
        lns=f(C0) + 1.0, lnbb=f(C0),
        ms=f(B, C0), mt=f(B, C0),
        inw=f(C0, 2 * D), dwk=f(3, 3, 1, D), dwb=f(D),
        xw=f(4, R + 2 * N, D), dtw=f(4, D, R),
        A=-jnp.abs(f(4, D, N)) - 0.5, Ds=f(4, D), bias=f(4, D),
        lng=f(D) + 1.0, lnb=f(D),
        loc=f(B, D), pw=f(D, C0), gate=f(B, C0),
    )


def _mb_run_both(i, D, R, N, local=True, dw_bias=True):
    from founddiff_tpu.ops.experimental_unified import (
        _mamba_xla_compose,
        ss2d_mamba_block,
    )

    out = ss2d_mamba_block(
        i["x"], i["lns"], i["lnbb"], i["ms"], i["mt"],
        in_proj_w=i["inw"], dw_kernel=i["dwk"],
        dw_bias=i["dwb"] if dw_bias else None,
        x_proj_weight=i["xw"], dt_projs_weight=i["dtw"], A=i["A"],
        Dskip=i["Ds"], delta_bias=i["bias"], out_ln_g=i["lng"],
        out_ln_b=i["lnb"], local=i["loc"] if local else None,
        proj_w=i["pw"], gate=i["gate"], d_inner=D, dt_rank=R, d_state=N,
    )
    wd, wb, wc = _derive_weights(i["xw"], i["dtw"], R, N)
    geff = i["lns"][None] * (1.0 + i["ms"])
    beff = i["lnbb"][None] * (1.0 + i["ms"]) + i["mt"]
    ref = _mamba_xla_compose(
        i["x"], geff, beff, i["inw"][:, :D], i["inw"][:, D:],
        i["dwk"][:, :, 0, :].reshape(9, D), i["dwb"].reshape(1, D),
        wd, wb, wc, i["A"], i["Ds"], i["bias"], i["lng"], i["lnb"],
        i["loc"], i["pw"], i["gate"], True, local, dw_bias, 1e-5, 1e-5,
    )
    return out, ref


@pytest.mark.parametrize(
    "B,H,W,C0,D,N",
    [
        (2, 16, 16, 64, 128, 4),     # shallow, single-pass
        (1, 32, 48, 64, 128, 4),     # non-square (W-major strips differ)
        (2, 16, 16, 32, 64, 16),     # deep-ish state, small dims
    ],
)
def test_mamba_block_op_matches_compose(B, H, W, C0, D, N):
    R = max(1, -(-C0 // 16))
    i = _mb_inputs(B, H, W, C0, D, N, R, seed=7)
    out, ref = _mb_run_both(i, D, R, N)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_mamba_block_op_no_local_no_dwbias():
    B, H, W, C0, D, N = 1, 16, 16, 64, 128, 4
    R = 4
    i = _mb_inputs(B, H, W, C0, D, N, R, seed=9)
    out, ref = _mb_run_both(i, D, R, N, local=False, dw_bias=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_mamba_block_op_grads_match_compose():
    from founddiff_tpu.ops.experimental_unified import (
        _mamba_xla_compose,
        ss2d_mamba_block,
    )

    B, H, W, C0, D, N = 1, 16, 16, 64, 128, 4
    R = 4
    i = _mb_inputs(B, H, W, C0, D, N, R, seed=11)
    wd, wb, wc = _derive_weights(i["xw"], i["dtw"], R, N)

    def loss_fused(x, inw, dwk, pw):
        o = ss2d_mamba_block(
            x, i["lns"], i["lnbb"], i["ms"], i["mt"], in_proj_w=inw,
            dw_kernel=dwk, dw_bias=i["dwb"], x_proj_weight=i["xw"],
            dt_projs_weight=i["dtw"], A=i["A"], Dskip=i["Ds"],
            delta_bias=i["bias"], out_ln_g=i["lng"], out_ln_b=i["lnb"],
            local=i["loc"], proj_w=pw, gate=i["gate"], d_inner=D,
            dt_rank=R, d_state=N,
        )
        return jnp.sum(o * o)

    def loss_ref(x, inw, dwk, pw):
        geff = i["lns"][None] * (1.0 + i["ms"])
        beff = i["lnbb"][None] * (1.0 + i["ms"]) + i["mt"]
        o = _mamba_xla_compose(
            x, geff, beff, inw[:, :D], inw[:, D:],
            dwk[:, :, 0, :].reshape(9, D), i["dwb"].reshape(1, D),
            wd, wb, wc, i["A"], i["Ds"], i["bias"], i["lng"], i["lnb"],
            i["loc"], pw, i["gate"], True, True, True, 1e-5, 1e-5,
        )
        return jnp.sum(o * o)

    args = (i["x"], i["inw"], i["dwk"], i["pw"])
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_image_block_silu_input_matches_external_silu():
    """FOUNDDIFF_SILU=kernel path: the kernel applies silu to xs_conv
    itself; on fp32 inputs this must match applying silu outside (both
    compute silu in f32)."""
    import jax.nn as jnn

    R, N = 8, 4
    i = _inputs(1, 16, 16, 64, 128, N, R, seed=21)
    kw = dict(
        w_z=i["wz"], x_proj_weight=i["xw"], dt_projs_weight=i["dtw"],
        A=i["A"], Dskip=i["Ds"], delta_bias=i["bias"], ln_g=i["lng"],
        ln_b=i["lnb"], local=i["loc"], proj_w=i["pw"], gate=i["gate"],
        dt_rank=R, d_state=N,
    )
    ref = ss2d_image_block(i["x1"], jnn.silu(i["xs"]), i["xr"], **kw)
    out = ss2d_image_block(i["x1"], i["xs"], i["xr"], silu_input=True, **kw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

    # gradients flow through the in-kernel silu via the remat VJP
    loss_f = lambda xs: jnp.sum(
        ss2d_image_block(i["x1"], xs, i["xr"], silu_input=True, **kw) ** 2
    )
    loss_r = lambda xs: jnp.sum(
        ss2d_image_block(i["x1"], jnn.silu(xs), i["xr"], **kw) ** 2
    )
    g = jax.grad(loss_f)(i["xs"])
    gr = jax.grad(loss_r)(i["xs"])
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(gr), rtol=2e-4, atol=2e-4
    )

"""Fused attention-half kernel (ops/attn_block.py) vs the XLA composition
and vs the live module path (layer_norm_modulated + TransposedAttention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from founddiff_tpu.ops.attn_block import (
    attn_block,
    attn_block_ok,
    attn_block_xla,
)


def _args(B, H, W, C, dtype=jnp.float32, seed=0):
    rs = np.random.RandomState(seed)
    heads = max(1, C // 32)
    f = lambda *s: jnp.asarray(rs.randn(*s) * 0.2, jnp.float32)
    return dict(
        x=jnp.asarray(rs.randn(B, H, W, C) * 0.5, dtype),
        mod_scale=f(B, C),
        mod_shift=f(B, C),
        gate=f(B, C),
        qkv_w=f(C, 3 * C),
        dw_w=f(3, 3, 1, 3 * C),
        temperature=jnp.abs(f(heads, 1, 1)) + 0.5,
        proj_w=f(1, 1, C, C),
    ), heads


@pytest.mark.parametrize(
    "shape",
    [(2, 16, 16, 64), (1, 8, 24, 96), (2, 32, 8, 64), (1, 16, 16, 128)],
)
def test_fused_matches_xla(shape):
    B, H, W, C = shape
    assert attn_block_ok(H, W, C)
    kw, heads = _args(B, H, W, C)
    out = attn_block(**kw, heads=heads)
    ref = attn_block_xla(**kw, heads=heads, eps=1e-6)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_fused_matches_module_path():
    """The XLA compose itself must equal the live module ops it replaces."""
    from founddiff_tpu.models.blocks import TransposedAttention
    from founddiff_tpu.ops.norm_pallas import layer_norm_modulated

    B, H, W, C = 2, 16, 16, 64
    kw, heads = _args(B, H, W, C, seed=3)
    x2 = layer_norm_modulated(
        kw["x"], None, None, kw["mod_scale"], kw["mod_shift"], eps=1e-6
    )
    mod = TransposedAttention(dim=C, heads=heads)
    params = {
        "temperature": kw["temperature"],
        "qkv": {"kernel": kw["qkv_w"].reshape(1, 1, C, 3 * C)},
        "qkv_dwconv": {"kernel": kw["dw_w"]},
        "project_out": {"kernel": kw["proj_w"]},
    }
    attn_out = mod.apply({"params": params}, x2)
    ref = kw["x"] + kw["gate"][:, None, None, :] * attn_out
    out = attn_block(**kw, heads=heads)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_bf16_close():
    B, H, W, C = 1, 16, 16, 64
    kw, heads = _args(B, H, W, C, dtype=jnp.bfloat16, seed=1)
    out = np.asarray(attn_block(**kw, heads=heads), np.float32)
    ref = np.asarray(attn_block_xla(**kw, heads=heads, eps=1e-6), np.float32)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_grad_flows_via_remat():
    B, H, W, C = 1, 8, 8, 64
    kw, heads = _args(B, H, W, C, seed=2)

    def loss(x, qkv_w):
        k = dict(kw, x=x, qkv_w=qkv_w)
        return jnp.sum(attn_block(**k, heads=heads) ** 2)

    g_x, g_w = jax.grad(loss, argnums=(0, 1))(kw["x"], kw["qkv_w"])

    def loss_ref(x, qkv_w):
        k = dict(kw, x=x, qkv_w=qkv_w)
        return jnp.sum(attn_block_xla(**k, heads=heads, eps=1e-6) ** 2)

    r_x, r_w = jax.grad(loss_ref, argnums=(0, 1))(kw["x"], kw["qkv_w"])
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(r_x), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(r_w), rtol=1e-3,
                               atol=1e-4)


def test_route_policy(monkeypatch):
    """Routing POLICY (r5): default only C >= 128 scales take the fused
    kernel (C < 128 runs channel-padded and was measured net-neutral plus
    pad ops — PROGRESS.md r4); FOUNDDIFF_ATTN_BLOCK on/off overrides."""
    from founddiff_tpu.ops.attn_block import attn_block_route

    monkeypatch.delenv("FOUNDDIFF_ATTN_BLOCK", raising=False)
    assert attn_block_ok(128, 128, 64)
    assert not attn_block_route(128, 128, 64)      # capable but not routed
    assert attn_block_route(64, 64, 128)
    monkeypatch.setenv("FOUNDDIFF_ATTN_BLOCK", "on")
    assert attn_block_route(128, 128, 64)
    assert not attn_block_route(128, 128, 60)      # still gated by _ok
    monkeypatch.setenv("FOUNDDIFF_ATTN_BLOCK", "off")
    assert not attn_block_route(64, 64, 128)

"""Golden tests of the attention family against direct torch implementations
of the reference blocks (src/DADiff.py:232-392)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from founddiff_tpu.models import (
    Attention,
    ChannelAttention,
    CrossAttention,
    LinearAttention,
)


def _conv1x1(x_nchw, kernel_hwio):
    w = torch.tensor(np.transpose(np.asarray(kernel_hwio), (3, 2, 0, 1)))
    return F.conv2d(x_nchw, w)


def test_linear_attention_matches_torch():
    """reference src/DADiff.py:287-317."""
    rng = np.random.RandomState(0)
    dim, heads, dh = 16, 4, 32
    x = rng.randn(1, 6, 6, dim).astype(np.float32)
    m = LinearAttention(dim=dim, heads=heads, dim_head=dh)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(params, jnp.asarray(x)))

    p = params["params"]
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    qkv = _conv1x1(xt, p["to_qkv"]["kernel"])
    q, k, v = qkv.chunk(3, dim=1)
    B, _, H, W = q.shape

    def heads_t(u):
        return u.reshape(B, heads, dh, H * W)

    q, k, v = map(heads_t, (q, k, v))
    q = q.softmax(dim=-2) * dh**-0.5
    k = k.softmax(dim=-1)
    v = v / (H * W)
    context = torch.einsum("bhdn,bhen->bhde", k, v)
    out = torch.einsum("bhde,bhdn->bhen", context, q)
    out = out.reshape(B, heads * dh, H, W)
    out = _conv1x1(out, p["to_out"]["kernel"]) + torch.tensor(
        np.asarray(p["to_out"]["bias"])
    ).view(1, -1, 1, 1)
    # ChanLayerNorm
    g = torch.tensor(np.asarray(p["to_out_norm"]["g"]))
    var = out.var(dim=1, unbiased=False, keepdim=True)
    mean = out.mean(dim=1, keepdim=True)
    golden = (out - mean) * (var + 1e-5).rsqrt() * g.view(1, -1, 1, 1)
    np.testing.assert_allclose(
        y, golden.detach().numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_cross_attention_matches_torch():
    """reference src/DADiff.py:319-366 (context = 1 token, as shipped)."""
    rng = np.random.RandomState(1)
    dim, heads, dh, ctx_dim = 32, 4, 32, 256
    x = rng.randn(2, 4, 4, dim).astype(np.float32)
    ctx = rng.randn(2, 1, ctx_dim).astype(np.float32)
    m = CrossAttention(query_dim=dim, context_dim=ctx_dim, heads=heads, dim_head=dh)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx))
    y = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(ctx)))

    p = params["params"]
    xt = torch.tensor(x.reshape(2, 16, dim))
    q = xt @ torch.tensor(np.asarray(p["to_q"]["kernel"]))
    kk = torch.tensor(ctx) @ torch.tensor(np.asarray(p["to_k"]["kernel"]))
    vv = torch.tensor(ctx) @ torch.tensor(np.asarray(p["to_v"]["kernel"]))

    def to_h(u):
        b, n, _ = u.shape
        return u.reshape(b, n, heads, dh).permute(0, 2, 1, 3).reshape(
            b * heads, n, dh
        )

    q, kk, vv = map(to_h, (q, kk, vv))
    sim = torch.einsum("bid,bjd->bij", q, kk) * dh**-0.5
    attn = sim.softmax(dim=-1)
    out = torch.einsum("bij,bjd->bid", attn, vv)
    out = out.reshape(2, heads, 16, dh).permute(0, 2, 1, 3).reshape(2, 16, -1)
    out = out @ torch.tensor(np.asarray(p["to_out"]["kernel"])) + torch.tensor(
        np.asarray(p["to_out"]["bias"])
    )
    golden = out.reshape(2, 4, 4, dim).detach().numpy()
    np.testing.assert_allclose(y, golden, rtol=1e-4, atol=1e-5)


def test_full_attention_softmax_property():
    m = Attention(dim=16, heads=2, dim_head=8)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 16), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == x.shape and np.all(np.isfinite(np.asarray(y)))


def test_channel_attention_gate():
    m = ChannelAttention(num_feat=32, squeeze_factor=16)
    x = jnp.ones((1, 4, 4, 32))
    p = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply(p, x))
    # sigmoid gate keeps magnitudes within (0, 1) x input
    assert np.all(np.abs(y) <= np.abs(np.asarray(x)) + 1e-6)

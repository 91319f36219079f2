"""Structure/behavior tests of the Dose-CLIP tower."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from founddiff_tpu.models.clip import (
    CLIP,
    CLIPIQA,
    AttentionPool2d,
    FrozenBatchNorm,
    ModifiedResNet,
    quick_gelu,
)


def test_frozen_batchnorm_matches_torch_eval():
    import torch

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 4, 8).astype(np.float32)
    m = FrozenBatchNorm(8)
    params = {
        "scale": jnp.asarray(rng.rand(8), jnp.float32),
        "bias": jnp.asarray(rng.rand(8), jnp.float32),
        "mean": jnp.asarray(rng.randn(8), jnp.float32),
        "var": jnp.asarray(rng.rand(8) + 0.5, jnp.float32),
    }
    y = m.apply({"params": params}, jnp.asarray(x))

    bn = torch.nn.BatchNorm2d(8).eval()
    bn.weight.data = torch.tensor(np.asarray(params["scale"]))
    bn.bias.data = torch.tensor(np.asarray(params["bias"]))
    bn.running_mean.data = torch.tensor(np.asarray(params["mean"]))
    bn.running_var.data = torch.tensor(np.asarray(params["var"]))
    with torch.no_grad():
        golden = bn(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        np.asarray(y), golden.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_quick_gelu_matches_torch_clip():
    import torch

    x = np.linspace(-3, 3, 13).astype(np.float32)
    golden = (torch.tensor(x) * torch.sigmoid(1.702 * torch.tensor(x))).numpy()
    np.testing.assert_allclose(np.asarray(quick_gelu(jnp.asarray(x))), golden,
                               rtol=1e-5)


def test_attention_pool_single_query_equals_full():
    """Our mean-token-only query must equal full QKV attention row 0."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    B, H, W, C = 1, 3, 3, 16
    heads, out_dim = 4, 8
    x = rng.randn(B, H, W, C).astype(np.float32)

    m = AttentionPool2d(spacial_dim=3, embed_dim=C, num_heads=heads,
                        output_dim=out_dim)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(params, jnp.asarray(x))

    p = params["params"]
    # torch full multi-head attention with separate projections, take token 0
    xt = torch.tensor(x.reshape(B, H * W, C).transpose(1, 0, 2))  # (HW, B, C)
    xt = torch.cat([xt.mean(dim=0, keepdim=True), xt], dim=0)
    qw = torch.tensor(np.asarray(p["q_proj"]["kernel"]).T)
    kw = torch.tensor(np.asarray(p["k_proj"]["kernel"]).T)
    vw = torch.tensor(np.asarray(p["v_proj"]["kernel"]).T)
    qb = torch.tensor(np.asarray(p["q_proj"]["bias"]))
    kb = torch.tensor(np.asarray(p["k_proj"]["bias"]))
    vb = torch.tensor(np.asarray(p["v_proj"]["bias"]))
    cw = torch.tensor(np.asarray(p["c_proj"]["kernel"]).T)
    cb = torch.tensor(np.asarray(p["c_proj"]["bias"]))
    out, _ = F.multi_head_attention_forward(
        query=xt, key=xt, value=xt,
        embed_dim_to_check=C, num_heads=heads,
        q_proj_weight=qw, k_proj_weight=kw, v_proj_weight=vw,
        in_proj_weight=None,
        in_proj_bias=torch.cat([qb, kb, vb]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
        out_proj_weight=cw, out_proj_bias=cb,
        use_separate_proj_weight=True, training=False, need_weights=False,
    )
    golden = out[0].detach().numpy()
    np.testing.assert_allclose(np.asarray(y), golden, rtol=1e-3, atol=1e-4)


def test_modified_resnet_shapes():
    m = ModifiedResNet(layers=(1, 1, 1, 1), output_dim=32, heads=4,
                       input_resolution=64, width=16)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 32)
    feats = m.apply(params, x, return_features=True)
    assert feats.shape == (1, 2, 2, 16 * 32)


def test_clipiqa_outputs():
    m = CLIPIQA()
    x = jnp.zeros((2, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    dose_prob, dose_emb, content = m.apply(params, x)
    assert dose_prob.shape == (2, 1)
    assert dose_emb.shape == (2, 1024)
    assert content.shape == (2, 256)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(dose_emb), axis=-1), 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(content), axis=-1), 1.0, rtol=1e-5
    )
    assert np.all(np.asarray(dose_prob) >= 0) and np.all(np.asarray(dose_prob) <= 1)


def test_clip_text_encode():
    m = CLIP(embed_dim=64, vision_layers=(1, 1, 1, 1), vision_width=16,
             transformer_width=32, transformer_heads=4, transformer_layers=2,
             vocab_size=100, context_length=12)
    ids = jnp.asarray([[1, 5, 7, 9, 2, 0, 0, 0, 0, 0, 0, 0]])
    img = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), img, ids)
    logits, feats = m.apply(params, img, ids)
    assert logits.shape == (1, 1)
    assert feats.shape == (1, 64)

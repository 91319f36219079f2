"""Checkpoint-converter tests.

Since the reference ships no weights, correctness is verified by:
1. full coverage: every denoiser param leaf is assigned from a synthesized
   reference-shaped state dict (exercising all key-name rules);
2. layer-family numerical equivalence (torch Linear/Conv/depthwise-conv vs
   the converted flax layer on identical inputs);
3. shape-strictness: a wrong-shaped tensor raises.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from founddiff_tpu.models import UnetRes
from founddiff_tpu.utils.torch_convert import (
    Converter,
    _apply,
    convert_denoiser_params,
    convert_unet,
    t_conv,
    t_linear,
)


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def synthesize_torch_state(template_params, build_fn, seed=0):
    """Run the converter against an empty dict to learn which torch keys it
    wants, then synthesize arrays of the correct (torch-side) shapes from the
    template leaves."""
    probe = Converter({}, prefix="")
    build_fn(probe)
    flat = flatten(template_params)
    rng = np.random.RandomState(seed)
    sd = {}
    for fpath, (tkey, kind) in probe.requests.items():
        path = tuple(fpath.split("/"))
        if path not in flat:
            continue  # param not present in this template (e.g. res_conv)
        shape = np.asarray(flat[path]).shape
        if kind == "linear":
            tshape = (shape[1], shape[0])
        elif kind == "conv":
            kh, kw, i, o = shape
            tshape = (o, i, kh, kw)
        elif kind == "a_logs":
            k, d, n = shape
            tshape = (k * d, n)
        elif kind == "ds":
            k, d = shape
            tshape = (k * d,)
        else:
            tshape = shape
        sd[tkey] = rng.randn(*tshape).astype(np.float32)
    return sd


def tiny_unet_res():
    model = UnetRes(
        dim=8,
        dim_mults=(1, 2),
        channels=1,
        num_unet=1,
        condition=True,
        objective="pred_res",
        test_res_or_noise="res",
        scan_impl="ref",
    )
    x = jnp.zeros((1, 8, 8, 2))
    time = [jnp.zeros((1,)), jnp.zeros((1,))]
    params = model.init(
        jax.random.PRNGKey(0), x, time, jnp.zeros((1, 1024)), jnp.zeros((1, 1, 256))
    )["params"]
    return model, params


def test_unet_conversion_full_coverage():
    model, params = tiny_unet_res()

    def build(c):
        convert_unet(c, "unet0", "unet0", num_res=2)

    sd = synthesize_torch_state(params, build)
    c = Converter(sd, prefix="")
    build(c)
    tree, applied = _apply(params, c.out)

    flat_t = flatten(tree)
    flat_p = flatten(params)
    assigned = set(c.out.keys())
    unassigned = [p for p in flat_p if p not in assigned]
    # every leaf must be covered by the converter's key rules
    assert not unassigned, f"unassigned params: {unassigned[:10]}"

    # spot-check key names follow the reference layout
    assert "unet0.downs.0.1.mamba.x_proj_weight" in sd
    assert "unet0.downs.0.1.adaLN_modulation.1.weight" in sd
    assert "unet0.ups.0.2.1.weight" in sd  # Upsample Sequential conv
    assert "unet0.mid_attn.mamba.A_logs" in sd
    assert "unet0.time_mlp.3.bias" in sd

    # transforms roundtrip: linear weights transposed, A_logs reshaped
    np.testing.assert_array_equal(
        np.asarray(flat_t[("unet0", "time_mlp_1", "kernel")]),
        sd["unet0.time_mlp.1.weight"].T,
    )
    a = sd["unet0.mid_attn.mamba.A_logs"]
    np.testing.assert_array_equal(
        np.asarray(flat_t[("unet0", "mid_attn", "mamba", "A_logs")]),
        a.reshape(4, -1, a.shape[-1]),
    )


def test_converted_model_runs():
    model, params = tiny_unet_res()

    def build(c):
        convert_unet(c, "unet0", "unet0", num_res=2)

    sd = synthesize_torch_state(params, build, seed=3)
    # scale down to keep the random weights numerically tame
    sd = {k: v * 0.05 for k, v in sd.items()}
    c = Converter(sd)
    build(c)
    tree, _ = _apply(params, c.out)
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, tree)},
        jnp.ones((1, 8, 8, 2)) * 0.1,
        [jnp.full((1,), 3.0), jnp.full((1,), 3.0)],
        jnp.zeros((1, 1024)),
        jnp.zeros((1, 1, 256)),
    )
    assert np.all(np.isfinite(np.asarray(out[0])))


def test_linear_conv_equivalence():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    # Linear
    w = rng.randn(6, 4).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    x = rng.randn(2, 4).astype(np.float32)
    golden = (torch.tensor(x) @ torch.tensor(w).T + torch.tensor(b)).numpy()
    got = x @ t_linear(w) + b
    np.testing.assert_allclose(got, golden, rtol=1e-5)

    # Conv (incl. depthwise)
    for groups in (1, 3):
        o, i = 3, 3 // groups
        w = rng.randn(o, i, 3, 3).astype(np.float32)
        x = rng.randn(1, 3, 5, 5).astype(np.float32)
        golden = F.conv2d(torch.tensor(x), torch.tensor(w), padding=1,
                          groups=groups).numpy()
        got = jax.lax.conv_general_dilated(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t_conv(w)),
            (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), golden, rtol=1e-4, atol=1e-5
        )


def test_shape_mismatch_raises():
    model, params = tiny_unet_res()
    c = Converter({"unet0.init_conv.weight": np.zeros((9, 9, 3, 3), np.float32),
                   "unet0.init_conv.bias": np.zeros((9,), np.float32)})
    c.conv("unet0/init_conv", "unet0.init_conv")
    with pytest.raises(ValueError, match="shape mismatch"):
        _apply(params, c.out)

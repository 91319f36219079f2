"""Full-size reference-checkpoint round trip (VERDICT r2 #3).

Real ``model-400.pt`` / ``Dose-CLIP.pth`` weights don't exist in this
environment, so this test synthesizes a COMPLETE reference-shaped trainer
checkpoint at the REAL shipped dimensions — dim-64 UNet x (1,2,4,8) with
d_state 4/8/16/32 (reference train.py:98-99, src/DADiff.py:618-649), frozen
CLIP RN50 (vision width 64, layers (3,4,6,3)) and the 12-layer text tower
(src/DACLIP.py:584-648) — saves it with ``torch.save`` in the trainer's
layout (``{'step','model','ema',...}``, src/DADiff.py:1626-1646), and runs
it through ``load_reference_checkpoint``:

- zero missing keys (every tensor the converter wants is found),
- zero unconsumed model keys (every tensor in the state dict is mapped),
- every flax param leaf assigned,
- and a finite 2-step DDIM sample at 128^2 through the loaded EMA params.

This exercises the exact key/shape rules the micro-tower parity tests
cannot (RN50 width 64, 12 text layers, the x4 downsample chain).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from founddiff_tpu.config import Config
from founddiff_tpu.utils.torch_convert import (
    Converter,
    convert_clipiqa,
    convert_unet,
)

from tests.test_torch_convert import flatten


def _probe_requests():
    """The torch keys convert_denoiser_params asks for at full size
    (prefixless; mirrors torch_convert.convert_denoiser_params)."""
    c = Converter({}, prefix="")
    convert_unet(c, "model/unet0", "unet0", num_res=4)
    convert_clipiqa(c, "dose_encoder", "unet0.dose_encoder")
    return c.requests


def _synthesize_fullsize_state(template_params, seed=0):
    requests = _probe_requests()
    flat = flatten(template_params)
    rng = np.random.RandomState(seed)
    sd = {}
    for fpath, (tkey, kind) in requests.items():
        path = tuple(fpath.split("/"))
        if path not in flat:
            continue  # e.g. res_conv identity where dims match
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
        v = np.asarray(rng.randn(*tshape) * 0.05, np.float32)
        if tkey.endswith(".running_var"):
            v = np.abs(v) + 1.0
        elif tkey.endswith(".A_logs"):
            v = np.abs(v) + 0.5  # A = -exp(A_logs) must stay negative/sane
        elif tkey.endswith("logit_scale"):
            v = np.asarray(np.log(1 / 0.07), np.float32)
        sd[tkey] = v
    return sd, requests


@pytest.mark.slow
def test_fullsize_checkpoint_roundtrip(tmp_path):
    import torch

    from founddiff_tpu.diffusion import ResidualDiffusion
    from founddiff_tpu.models.founddiff import FoundDiffDenoiser
    from founddiff_tpu.pipeline import make_hoisted_sampler
    from founddiff_tpu.train.state import TrainState, make_optimizer

    cfg = Config()  # shipped defaults: dim 64, (1,2,4,8), RN50, num_unet 1
    assert cfg.model.dim == 64 and tuple(cfg.model.dim_mults) == (1, 2, 4, 8)

    model = FoundDiffDenoiser(
        dim=cfg.model.dim,
        dim_mults=tuple(cfg.model.dim_mults),
        channels=1,
        num_unet=1,
        condition=True,
        objective="pred_res",
        test_res_or_noise="res",
        scan_impl="chunked",
    )
    # params are spatial-size independent; init on a small grid for speed
    x0 = jnp.zeros((1, 32, 32, 2), jnp.float32)
    t0 = [jnp.zeros((1,)), jnp.zeros((1,))]
    params = model.init(jax.random.PRNGKey(0), x0, t0)["params"]

    # --- synthesize the full-size reference checkpoint -----------------
    sd, requests = _synthesize_fullsize_state(params)
    requested_keys = {tkey for tkey, _ in requests.values()}
    assert set(sd) <= requested_keys

    ckpt = {
        "step": 400000,
        "model": {"model." + k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        "ema": {
            "ema_model.model." + k: torch.from_numpy(np.asarray(v))
            for k, v in sd.items()
        },
        "scaler": None,
    }
    path = os.path.join(str(tmp_path), "model-400.pt")
    torch.save(ckpt, path)

    # --- convert -------------------------------------------------------
    from founddiff_tpu.utils.torch_convert import load_reference_checkpoint

    state = TrainState.create(params, make_optimizer(num_unet=1))
    cfg.model.num_unet = 1
    cfg.model.use_dose_encoder = True
    new_state = load_reference_checkpoint(path, state, cfg)
    assert int(new_state.step) == 400000

    # explicit bookkeeping: re-run the converter to inspect coverage
    from founddiff_tpu.utils.torch_convert import convert_denoiser_params

    tree, applied, missing = convert_denoiser_params(
        {k: v.numpy() for k, v in ckpt["model"].items()}, params,
        num_unet=1, with_dose_encoder=True, torch_prefix="model.",
    )
    # zero missing torch keys
    assert not missing, f"converter missing {len(missing)}: {missing[:5]}"
    # zero unconsumed model keys
    consumed = {"model." + k for k in requested_keys}
    unconsumed = [k for k in ckpt["model"] if k not in consumed]
    assert not unconsumed, f"unconsumed: {unconsumed[:5]}"
    # every flax leaf assigned
    flat_p = flatten(params)
    flat_t = flatten(tree)
    for p in flat_p:
        assert p in flat_t
    changed = sum(
        not np.array_equal(np.asarray(flat_p[p]), np.asarray(flat_t[p]))
        for p in flat_p
    )
    assert changed >= len(flat_p) - 8, (changed, len(flat_p))

    # a converted value spot check at full RN50 width: visual stem conv1
    np.testing.assert_array_equal(
        np.asarray(flat_t[("dose_encoder", "clip_model", "visual", "conv1",
                           "kernel")]),
        np.transpose(sd["unet0.dose_encoder.clip_model.visual.conv1.weight"],
                     (2, 3, 1, 0)),
    )

    # --- finite 2-step DDIM at 128^2 through the loaded EMA params -----
    size = 128
    diffusion = ResidualDiffusion(
        lambda p, x_in, time, x_self_cond=None: model.apply(
            {"params": p}, x_in, time, x_self_cond=x_self_cond
        ),
        image_size=size,
        channels=1,
        timesteps=1000,
        sampling_timesteps=2,
        objective="pred_res",
        loss_type="l2",
        condition=True,
        sum_scale=0.01,
        test_res_or_noise="res",
    )
    sampler = make_hoisted_sampler(model, diffusion, use_test_schedule=True)
    x_input = jnp.full((1, size, size, 1), 0.5, jnp.float32)
    out = jax.jit(sampler)(new_state.ema.params, jax.random.PRNGKey(1), x_input)
    assert out.shape == (1, size, size, 1)
    assert np.isfinite(np.asarray(out)).all()

"""Model/diffusion construction from a Config.

Mirrors the construction block of the reference entry point
(train.py:85-119): either the FoundDiff residual path (UnetRes +
ResidualDiffusion) or the vanilla lucidrains path (Unet + GaussianDiffusion,
``original_ddim_ddpm=True``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from founddiff_tpu.config import Config
from founddiff_tpu.diffusion import GaussianDiffusion, ResidualDiffusion
from founddiff_tpu.models import UnetRes, VanillaUnet


def build_denoiser(config: Config):
    m = config.model
    if m.original_ddim_ddpm:
        return VanillaUnet(
            dim=m.dim,
            dim_mults=tuple(m.dim_mults),
            channels=m.channels,
            self_condition=m.self_condition,
            resnet_block_groups=m.resnet_block_groups,
            learned_variance=m.learned_variance,
        )
    if m.use_dose_encoder:
        from founddiff_tpu.models.founddiff import FoundDiffDenoiser

        return FoundDiffDenoiser(
            dim=m.dim,
            dim_mults=tuple(m.dim_mults),
            channels=m.channels,
            num_unet=m.num_unet,
            condition=m.condition,
            input_condition=m.input_condition,
            self_condition=m.self_condition,
            objective=m.objective,
            test_res_or_noise=m.test_res_or_noise,
            scan_impl=m.scan_impl,
            clip_backbone=m.clip_backbone,
        )
    return UnetRes(
        dim=m.dim,
        dim_mults=tuple(m.dim_mults),
        channels=m.channels,
        self_condition=m.self_condition,
        resnet_block_groups=m.resnet_block_groups,
        learned_variance=m.learned_variance,
        num_unet=m.num_unet,
        condition=m.condition,
        input_condition=m.input_condition,
        objective=m.objective,
        test_res_or_noise=m.test_res_or_noise,
        scan_impl=m.scan_impl,
    )


def make_model_fn(model, original_ddim_ddpm: bool = False) -> Callable:
    """Bind a Flax module into the diffusion-process calling convention."""
    if original_ddim_ddpm:

        def model_fn(params, x, t, x_self_cond=None):
            return model.apply({"params": params}, x, t, x_self_cond=x_self_cond)

        return model_fn

    # keyword-only: UnetRes' third positional is dose_embedding, not
    # x_self_cond (founddiff_tpu/models/unet.py:240-247)
    def model_fn(params, x_in, time, x_self_cond=None):
        return model.apply({"params": params}, x_in, time, x_self_cond=x_self_cond)

    return model_fn


def build(config: Config, rng: Optional[jax.Array] = None, init: bool = True):
    """Returns ``(diffusion, model, params)``; ``params`` is None unless
    ``init``."""
    m, d = config.model, config.diffusion
    model = build_denoiser(config)
    model_fn = make_model_fn(model, m.original_ddim_ddpm)

    if m.original_ddim_ddpm:
        diffusion = GaussianDiffusion(
            model_fn,
            image_size=d.image_size,
            channels=m.channels,
            timesteps=d.timesteps,
            sampling_timesteps=min(250, d.timesteps),
            loss_type="l1",
            objective="pred_noise",
            beta_schedule="cosine",
        )
    else:
        diffusion = ResidualDiffusion(
            model_fn,
            image_size=d.image_size,
            channels=m.channels,
            timesteps=d.timesteps,
            sampling_timesteps=d.sampling_timesteps,
            objective=m.objective,
            loss_type=d.loss_type,
            condition=m.condition,
            sum_scale=d.sum_scale,
            input_condition=m.input_condition,
            input_condition_mask=m.input_condition_mask,
            test_res_or_noise=m.test_res_or_noise,
            self_condition=m.self_condition,
            ddim_sampling_eta=d.ddim_sampling_eta,
            ddim_update=d.ddim_update,
            convert_to_ddim=d.convert_to_ddim,
            clip_denoised=d.clip_denoised,
        )

    params = None
    if init:
        rng = rng if rng is not None else jax.random.PRNGKey(config.train.seed)
        # init shapes don't affect conv/dense param shapes; the RN50 stem
        # needs >= 32 px to reach its attention pool
        s = 32 if (m.use_dose_encoder and not m.original_ddim_ddpm) else 16
        in_ch = m.channels * (
            1
            + (1 if m.condition and not m.original_ddim_ddpm else 0)
            + (1 if m.input_condition else 0)
        )
        x = jnp.zeros((1, s, s, in_ch))
        if m.original_ddim_ddpm:
            variables = model.init(rng, x, jnp.zeros((1,)))
        else:
            time = [jnp.zeros((1,)), jnp.zeros((1,))]
            variables = model.init(rng, x, time)
        params = variables["params"]
    return diffusion, model, params

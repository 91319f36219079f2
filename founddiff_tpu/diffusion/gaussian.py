"""Vanilla DDPM/DDIM gaussian diffusion in functional JAX.

Capability-parity port of the lucidrains stack the reference bundles as its
baseline path (reference src/denoising_diffusion_pytorch.py:437-731, selected
by ``original_ddim_ddpm=True`` in train.py:59-95): objectives
``pred_noise | pred_x0 | pred_v``, p2 loss weighting, DDPM ancestral and DDIM
samplers — all as ``lax.scan`` loops.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from founddiff_tpu.diffusion.schedules import (
    GaussianSchedule,
    extract,
    make_gaussian_schedule,
)

ModelFn = Callable[..., jnp.ndarray]


class ModelPrediction(NamedTuple):
    pred_noise: jnp.ndarray
    pred_x_start: jnp.ndarray


def normalize_to_neg_one_to_one(x):
    return x * 2.0 - 1.0


def unnormalize_to_zero_to_one(x):
    return (x + 1.0) * 0.5


class GaussianDiffusion:
    """Functional DDPM process.

    ``model_fn(params, x, t, x_self_cond)`` returns the raw UNet output.
    """

    def __init__(
        self,
        model_fn: ModelFn,
        *,
        image_size: int,
        channels: int = 3,
        timesteps: int = 1000,
        sampling_timesteps: Optional[int] = None,
        loss_type: str = "l1",
        objective: str = "pred_noise",
        beta_schedule: str = "cosine",
        p2_loss_weight_gamma: float = 0.0,
        p2_loss_weight_k: float = 1.0,
        ddim_sampling_eta: float = 1.0,
        self_condition: bool = False,
        clip_denoised: bool = True,
    ):
        assert objective in {"pred_noise", "pred_x0", "pred_v"}
        self.model_fn = model_fn
        self.image_size = image_size
        self.channels = channels
        self.objective = objective
        self.loss_type = loss_type
        self.self_condition = self_condition
        self.clip_denoised = clip_denoised

        self.schedule: GaussianSchedule = make_gaussian_schedule(
            timesteps,
            beta_schedule=beta_schedule,
            p2_loss_weight_gamma=p2_loss_weight_gamma,
            p2_loss_weight_k=p2_loss_weight_k,
        )
        self.num_timesteps = timesteps
        self.sampling_timesteps = (
            sampling_timesteps if sampling_timesteps is not None else timesteps
        )
        assert self.sampling_timesteps <= timesteps
        self.is_ddim_sampling = self.sampling_timesteps < timesteps
        self.ddim_sampling_eta = ddim_sampling_eta

    # -- closed forms ---------------------------------------------------

    def predict_start_from_noise(self, x_t, t, noise):
        s, nd = self.schedule, x_t.ndim
        return (
            extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - extract(s.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )

    def predict_noise_from_start(self, x_t, t, x0):
        s, nd = self.schedule, x_t.ndim
        return (
            extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
        ) / extract(s.sqrt_recipm1_alphas_cumprod, t, nd)

    def predict_v(self, x_start, t, noise):
        s, nd = self.schedule, x_start.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * noise
            - extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
        )

    def predict_start_from_v(self, x_t, t, v):
        s, nd = self.schedule, x_t.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * x_t
            - extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * v
        )

    def q_posterior(self, x_start, x_t, t):
        s, nd = self.schedule, x_t.ndim
        posterior_mean = (
            extract(s.posterior_mean_coef1, t, nd) * x_start
            + extract(s.posterior_mean_coef2, t, nd) * x_t
        )
        return (
            posterior_mean,
            extract(s.posterior_variance, t, nd),
            extract(s.posterior_log_variance_clipped, t, nd),
        )

    def q_sample(self, x_start, t, noise):
        s, nd = self.schedule, x_start.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * x_start
            + extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    # -- model wrapper ---------------------------------------------------

    def model_predictions(
        self, params, x, t, x_self_cond=None, clip_x_start: bool = False
    ) -> ModelPrediction:
        model_output = self.model_fn(params, x, t, x_self_cond)
        maybe_clip = (
            (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)
        )
        if self.objective == "pred_noise":
            pred_noise = model_output
            x_start = maybe_clip(self.predict_start_from_noise(x, t, pred_noise))
        elif self.objective == "pred_x0":
            x_start = maybe_clip(model_output)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        else:  # pred_v
            x_start = maybe_clip(self.predict_start_from_v(x, t, model_output))
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        return ModelPrediction(pred_noise, x_start)

    def p_mean_variance(self, params, x, t, x_self_cond=None):
        preds = self.model_predictions(params, x, t, x_self_cond)
        x_start = preds.pred_x_start
        if self.clip_denoised:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        mean, var, log_var = self.q_posterior(x_start, x, t)
        return mean, var, log_var, x_start

    # -- samplers ---------------------------------------------------------

    def p_sample_loop(self, params, rng, shape):
        rng, init_rng = jax.random.split(rng)
        img = jax.random.normal(init_rng, shape)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1, dtype=jnp.int32)

        def step(carry, t):
            img, rng = carry
            rng, noise_rng = jax.random.split(rng)
            bt = jnp.full((shape[0],), t, dtype=jnp.int32)
            mean, _, log_var, _ = self.p_mean_variance(params, img, bt)
            noise = jnp.where(
                t > 0, jax.random.normal(noise_rng, shape, dtype=img.dtype), 0.0
            )
            return (mean + jnp.exp(0.5 * log_var) * noise, rng), None

        (img, _), _ = jax.lax.scan(step, (img, rng), ts)
        return unnormalize_to_zero_to_one(img)

    def ddim_sample(self, params, rng, shape):
        s = self.schedule
        eta = self.ddim_sampling_eta
        times = np.linspace(-1, self.num_timesteps - 1, self.sampling_timesteps + 1)
        times = list(reversed(times.astype(int).tolist()))
        pairs = list(zip(times[:-1], times[1:]))
        t_cur = jnp.asarray([p[0] for p in pairs], dtype=jnp.int32)
        t_next = jnp.asarray([p[1] for p in pairs], dtype=jnp.int32)

        rng, init_rng = jax.random.split(rng)
        img = jax.random.normal(init_rng, shape)

        def step(carry, tpair):
            img, rng = carry
            time, time_next = tpair
            rng, noise_rng = jax.random.split(rng)
            bt = jnp.full((shape[0],), time, dtype=jnp.int32)
            pred_noise, x_start = self.model_predictions(
                params, img, bt, clip_x_start=self.clip_denoised
            )
            tn = jnp.maximum(time_next, 0)
            alpha = s.alphas_cumprod[time]
            alpha_next = s.alphas_cumprod[tn]
            sigma = eta * jnp.sqrt(
                (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
            )
            c = jnp.sqrt(1 - alpha_next - sigma**2)
            noise = jax.random.normal(noise_rng, shape, dtype=img.dtype)
            img_next = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
            img_next = jnp.where(time_next < 0, x_start, img_next)
            return (img_next, rng), None

        (img, _), _ = jax.lax.scan(step, (img, rng), (t_cur, t_next))
        return unnormalize_to_zero_to_one(img)

    def sample(self, params, rng, batch_size: int = 16):
        shape = (batch_size, self.image_size, self.image_size, self.channels)
        fn = self.ddim_sample if self.is_ddim_sampling else self.p_sample_loop
        return fn(params, rng, shape)

    # -- loss ---------------------------------------------------------------

    def p_losses(self, params, rng, x_start, t):
        rng, noise_rng, sc_rng = jax.random.split(rng, 3)
        noise = jax.random.normal(noise_rng, x_start.shape, dtype=x_start.dtype)
        x = self.q_sample(x_start, t, noise)

        x_self_cond = None
        if self.self_condition:
            pred = jax.lax.stop_gradient(
                self.model_predictions(params, x, t).pred_x_start
            )
            use = jax.random.bernoulli(sc_rng)
            x_self_cond = jnp.where(use, pred, jnp.zeros_like(pred))

        model_out = self.model_fn(params, x, t, x_self_cond)

        if self.objective == "pred_noise":
            target = noise
        elif self.objective == "pred_x0":
            target = x_start
        else:
            target = self.predict_v(x_start, t, noise)

        if self.loss_type == "l1":
            err = jnp.abs(model_out - target)
        elif self.loss_type == "l2":
            err = jnp.square(model_out - target)
        else:
            raise ValueError(f"invalid loss type {self.loss_type!r}")
        err = err.reshape(err.shape[0], -1).mean(axis=1)
        err = err * self.schedule.p2_loss_weight[t]
        return err.mean()

    def loss(self, params, rng, img):
        b = img.shape[0]
        rng, t_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (b,), 0, self.num_timesteps)
        img = normalize_to_neg_one_to_one(img)
        return self.p_losses(params, rng, img, t)

"""Residual diffusion (RDDM-style) process in functional JAX.

Re-implements the semantics of the reference ``ResidualDiffusion``
(src/DADiff.py:908-1498) TPU-first:

- The forward process diffuses the LDCT->NDCT *residual*:
  ``q_sample(x0, res, t) = x0 + acs_t * res + bcs_t * eps``
  (reference src/DADiff.py:1382-1388).
- Samplers are single ``lax.scan`` loops over static time pairs instead of
  Python loops, so a full DDIM run compiles to one XLA program.
- Train/test schedules are both precomputed (the reference re-derives the
  test schedule in ``init()``, src/DADiff.py:1033-1118).
- All methods are pure: parameters, RNG keys, and inputs in; arrays out.

Layout note: images are NHWC (TPU-native), so channel concatenation for
conditioning happens on the last axis (the reference concatenates on dim=1 in
NCHW, src/DADiff.py:1157-1161).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from founddiff_tpu.diffusion import schedules as sched_lib
from founddiff_tpu.diffusion.schedules import (
    ResidualSchedule,
    ddim_time_pairs,
    extract,
    make_residual_schedule,
)

ModelFn = Callable[..., Sequence[jnp.ndarray]]


class ModelResPrediction(NamedTuple):
    pred_res: jnp.ndarray
    pred_noise: jnp.ndarray
    pred_x_start: jnp.ndarray


def normalize_to_neg_one_to_one(x):
    return x * 2.0 - 1.0


def unnormalize_to_zero_to_one(x):
    return (x + 1.0) * 0.5


class ResidualDiffusion:
    """Functional residual-diffusion process.

    Args:
      model_fn: ``model_fn(params, x_in, time_pair, x_self_cond, rngs=None)``
        returning a sequence of predictions (one per unet; reference
        ``UnetRes.forward`` src/DADiff.py:817-836).  ``time_pair`` is the
        two-element list ``[acs[t]*T, bcs[t]*T]``.
      objective: one of ``pred_res | pred_noise | pred_res_noise |
        pred_x0_noise`` (reference src/DADiff.py:1168-1207).
      condition: conditional denoising (CT path) — sampling starts from
        ``x_input + sqrt(sum_scale) * eps`` (reference src/DADiff.py:1242-1245).
    """

    def __init__(
        self,
        model_fn: ModelFn,
        *,
        image_size: int,
        channels: int = 1,
        timesteps: int = 1000,
        sampling_timesteps: Optional[int] = None,
        loss_type: str = "l1",
        objective: str = "pred_res_noise",
        ddim_sampling_eta: float = 0.0,
        condition: bool = False,
        sum_scale: Optional[float] = None,
        input_condition: bool = False,
        input_condition_mask: bool = False,
        test_res_or_noise: str = "None",
        self_condition: bool = False,
        clip_denoised: bool = True,
        ddim_update: str = "use_pred_noise",
        convert_to_ddim: bool = True,
        aux_grad_loss_weight: float = 0.0,
        aux_wavelet_loss_weight: float = 0.0,
    ):
        self.model_fn = model_fn
        self.image_size = image_size
        self.channels = channels
        self.objective = objective
        self.condition = condition
        self.input_condition = input_condition
        self.input_condition_mask = input_condition_mask
        self.test_res_or_noise = test_res_or_noise
        self.self_condition = self_condition
        self.clip_denoised = clip_denoised
        # DDIM update rule: 'use_pred_noise' (shipped; despite the name it
        # steps with pred_res) or 'use_x_start' (reference src/DADiff.py:
        # 1343-1349, selected by a local constant there).
        assert ddim_update in ("use_pred_noise", "use_x_start"), ddim_update
        self.ddim_update = ddim_update
        self.loss_type = loss_type
        # optional auxiliary losses (the reference carries Sobel/wavelet loss
        # utilities, src/util.py:343-530, and a commented perceptual term,
        # src/DADiff.py:1480; exposed here as weights, default off)
        self.aux_grad_loss_weight = aux_grad_loss_weight
        self.aux_wavelet_loss_weight = aux_wavelet_loss_weight

        if condition:
            self.sum_scale = sum_scale if sum_scale is not None else 0.01
            ddim_sampling_eta = 0.0
        else:
            self.sum_scale = sum_scale if sum_scale is not None else 1.0

        self.num_timesteps = timesteps
        self.sampling_timesteps = (
            sampling_timesteps if sampling_timesteps is not None else timesteps
        )
        assert self.sampling_timesteps <= timesteps
        self.is_ddim_sampling = self.sampling_timesteps < timesteps
        self.ddim_sampling_eta = ddim_sampling_eta

        common = dict(
            convert_to_ddim=convert_to_ddim,
            sum_scale=self.sum_scale,
        )
        self.train_schedule = make_residual_schedule(timesteps, test=False, **common)
        # ``init()`` variant used by Trainer.test (reference src/DADiff.py:1818).
        self.test_schedule = make_residual_schedule(timesteps, test=True, **common)

    # ------------------------------------------------------------------
    # Closed-form predictions (reference src/DADiff.py:1121-1151).
    # ------------------------------------------------------------------

    def q_sample(self, sch: ResidualSchedule, x_start, x_res, t, noise):
        nd = x_start.ndim
        return (
            x_start
            + extract(sch.alphas_cumsum, t, nd) * x_res
            + extract(sch.betas_cumsum, t, nd) * noise
        )

    def predict_noise_from_res(self, sch, x_t, t, x_input, pred_res):
        nd = x_t.ndim
        return (
            x_t - x_input - (extract(sch.alphas_cumsum, t, nd) - 1.0) * pred_res
        ) / extract(sch.betas_cumsum, t, nd)

    def predict_start_from_xinput_noise(self, sch, x_t, t, x_input, noise):
        nd = x_t.ndim
        return (
            x_t
            - extract(sch.alphas_cumsum, t, nd) * x_input
            - extract(sch.betas_cumsum, t, nd) * noise
        ) / extract(sch.one_minus_alphas_cumsum, t, nd)

    def predict_start_from_res_noise(self, sch, x_t, t, x_res, noise):
        nd = x_t.ndim
        return (
            x_t
            - extract(sch.alphas_cumsum, t, nd) * x_res
            - extract(sch.betas_cumsum, t, nd) * noise
        )

    def q_posterior_from_res_noise(self, sch, x_res, noise, x_t, t):
        nd = x_t.ndim
        return (
            x_t
            - extract(sch.alphas, t, nd) * x_res
            - (extract(sch.betas2, t, nd) / extract(sch.betas_cumsum, t, nd)) * noise
        )

    def q_posterior(self, sch, pred_res, x_start, x_t, t):
        nd = x_t.ndim
        posterior_mean = (
            extract(sch.posterior_mean_coef1, t, nd) * x_t
            + extract(sch.posterior_mean_coef2, t, nd) * pred_res
            + extract(sch.posterior_mean_coef3, t, nd) * x_start
        )
        posterior_variance = extract(sch.posterior_variance, t, nd)
        posterior_log_variance = extract(sch.posterior_log_variance_clipped, t, nd)
        return posterior_mean, posterior_variance, posterior_log_variance

    # ------------------------------------------------------------------
    # Model wrapper (reference src/DADiff.py:1153-1209).
    # ------------------------------------------------------------------

    def _model_input(self, x, x_input, x_input_condition):
        if not self.condition:
            return x
        if self.input_condition:
            return jnp.concatenate((x, x_input, x_input_condition), axis=-1)
        return jnp.concatenate((x, x_input), axis=-1)

    def model_predictions(
        self,
        params,
        sch: ResidualSchedule,
        x_input,
        x,
        t,
        x_input_condition=None,
        x_self_cond=None,
        clip_denoised: Optional[bool] = None,
    ) -> ModelResPrediction:
        clip_denoised = (
            self.clip_denoised if clip_denoised is None else clip_denoised
        )
        x_in = self._model_input(x, x_input, x_input_condition)
        time_pair = [
            sch.alphas_cumsum[t] * self.num_timesteps,
            sch.betas_cumsum[t] * self.num_timesteps,
        ]
        model_output = self.model_fn(params, x_in, time_pair, x_self_cond)

        maybe_clip = (
            (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_denoised else (lambda v: v)
        )

        if self.objective == "pred_res_noise":
            if self.test_res_or_noise == "res_noise":
                pred_res = maybe_clip(model_output[0])
                pred_noise = model_output[1]
                x_start = maybe_clip(
                    self.predict_start_from_res_noise(sch, x, t, pred_res, pred_noise)
                )
            elif self.test_res_or_noise == "res":
                pred_res = maybe_clip(model_output[0])
                pred_noise = self.predict_noise_from_res(sch, x, t, x_input, pred_res)
                x_start = maybe_clip(x_input - pred_res)
            elif self.test_res_or_noise == "noise":
                pred_noise = model_output[1]
                x_start = maybe_clip(
                    self.predict_start_from_xinput_noise(
                        sch, x, t, x_input, pred_noise
                    )
                )
                pred_res = maybe_clip(x_input - x_start)
            else:
                raise ValueError(
                    f"unknown test_res_or_noise {self.test_res_or_noise!r}"
                )
        elif self.objective == "pred_x0_noise":
            pred_res = maybe_clip(x_input - model_output[0])
            pred_noise = model_output[1]
            x_start = maybe_clip(model_output[0])
        elif self.objective == "pred_noise":
            pred_noise = model_output[0]
            x_start = maybe_clip(
                self.predict_start_from_xinput_noise(sch, x, t, x_input, pred_noise)
            )
            pred_res = maybe_clip(x_input - x_start)
        elif self.objective == "pred_res":
            pred_res = maybe_clip(model_output[0])
            pred_noise = self.predict_noise_from_res(sch, x, t, x_input, pred_res)
            x_start = maybe_clip(x_input - pred_res)
        else:
            raise ValueError(f"unknown objective {self.objective!r}")

        return ModelResPrediction(pred_res, pred_noise, x_start)

    # ------------------------------------------------------------------
    # DDPM ancestral sampler (reference src/DADiff.py:1211-1273).
    # ------------------------------------------------------------------

    def p_mean_variance(self, params, sch, x_input, x, t, x_input_condition=None,
                        x_self_cond=None):
        preds = self.model_predictions(
            params, sch, x_input, x, t, x_input_condition, x_self_cond
        )
        model_mean, posterior_variance, posterior_log_variance = self.q_posterior(
            sch, preds.pred_res, preds.pred_x_start, x, t
        )
        return model_mean, posterior_variance, posterior_log_variance, preds.pred_x_start

    def p_sample_loop(
        self,
        params,
        rng: jax.Array,
        x_input,
        shape,
        *,
        sch: Optional[ResidualSchedule] = None,
        last: bool = True,
    ):
        """Full-T ancestral sampling as one ``lax.scan``."""
        sch = self.train_schedule if sch is None else sch
        x_input, x_input_condition = self._split_input(x_input)

        rng, init_rng = jax.random.split(rng)
        if self.condition:
            img = x_input + math.sqrt(self.sum_scale) * jax.random.normal(
                init_rng, shape, dtype=x_input.dtype
            )
            input_add_noise = img
        else:
            img = jax.random.normal(init_rng, shape)
            input_add_noise = None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1, dtype=jnp.int32)

        def step(carry, t):
            img, x_start_prev, rng = carry
            rng, noise_rng = jax.random.split(rng)
            bt = jnp.full((shape[0],), t, dtype=jnp.int32)
            # previous step's x_start estimate feeds the next model call
            # (reference src/DADiff.py:1249,1255-1257; first step uses the
            # zeros the reference's None-default expands to).
            self_cond = x_start_prev if self.self_condition else None
            model_mean, _, model_log_var, x_start = self.p_mean_variance(
                params, sch, x_input, img, bt, x_input_condition, self_cond
            )
            noise = jax.random.normal(noise_rng, shape, dtype=img.dtype)
            noise = jnp.where(t > 0, noise, 0.0)  # no noise at t == 0
            pred_img = model_mean + jnp.exp(0.5 * model_log_var) * noise
            carry_sc = x_start if self.self_condition else x_start_prev
            return (pred_img, carry_sc, rng), (pred_img if not last else None)

        # scalar dummy when self-conditioning is off (keeps the carry small)
        x_start0 = (
            jnp.zeros(shape, dtype=img.dtype)
            if self.self_condition
            else jnp.zeros((), dtype=img.dtype)
        )
        (img, _, _), imgs = jax.lax.scan(step, (img, x_start0, rng), ts)
        return self._package_samples(img, imgs, input_add_noise, last)

    # ------------------------------------------------------------------
    # DDIM sampler (reference src/DADiff.py:1275-1365).
    # ------------------------------------------------------------------

    def ddim_sample(
        self,
        params,
        rng: jax.Array,
        x_input,
        shape,
        *,
        sch: Optional[ResidualSchedule] = None,
        last: bool = True,
    ):
        sch = self.train_schedule if sch is None else sch
        x_input, x_input_condition = self._split_input(x_input)
        eta = self.ddim_sampling_eta

        t_cur, t_next = ddim_time_pairs(self.num_timesteps, self.sampling_timesteps)
        t_cur = jnp.asarray(t_cur)
        t_next = jnp.asarray(t_next)

        rng, init_rng = jax.random.split(rng)
        if self.condition:
            img = x_input + math.sqrt(self.sum_scale) * jax.random.normal(
                init_rng, shape, dtype=x_input.dtype
            )
            input_add_noise = img
        else:
            img = jax.random.normal(init_rng, shape)
            input_add_noise = None

        def step(carry, tpair):
            img, x_start_prev, rng = carry
            time, time_next = tpair
            rng, noise_rng = jax.random.split(rng)
            bt = jnp.full((shape[0],), time, dtype=jnp.int32)
            # previous step's x_start estimate feeds the next model call
            # (reference src/DADiff.py:1298,1309-1311).
            self_cond = x_start_prev if self.self_condition else None
            preds = self.model_predictions(
                params, sch, x_input, img, bt, x_input_condition, self_cond
            )
            pred_res, x_start = preds.pred_res, preds.pred_x_start

            tn = jnp.maximum(time_next, 0)
            alpha_cumsum = sch.alphas_cumsum[time]
            alpha_cumsum_next = sch.alphas_cumsum[tn]
            alpha = alpha_cumsum - alpha_cumsum_next

            betas2_cumsum = sch.betas2_cumsum[time]
            betas2_cumsum_next = sch.betas2_cumsum[tn]
            betas2 = betas2_cumsum - betas2_cumsum_next
            sigma2 = eta * (betas2 * betas2_cumsum_next / betas2_cumsum)

            if eta == 0.0:
                noise_term = 0.0
            else:
                noise_term = jnp.sqrt(sigma2) * jax.random.normal(
                    noise_rng, shape, dtype=img.dtype
                )
            if self.ddim_update == "use_x_start":
                # reference src/DADiff.py:1345-1349
                coef = jnp.sqrt(betas2_cumsum_next - sigma2) / sch.betas_cumsum[time]
                img_next = (
                    coef * img
                    + (1.0 - coef) * x_start
                    + (alpha_cumsum_next - alpha_cumsum * coef) * pred_res
                    + noise_term
                )
            else:
                # "use_pred_noise" update (reference src/DADiff.py:1343-1344).
                img_next = img - alpha * pred_res + noise_term
            # Final step: return x_start (reference src/DADiff.py:1320-1324).
            img_next = jnp.where(time_next < 0, x_start, img_next)
            carry_sc = x_start if self.self_condition else x_start_prev
            return (img_next, carry_sc, rng), (img_next if not last else None)

        # scalar dummy when self-conditioning is off (keeps the carry small)
        x_start0 = (
            jnp.zeros(shape, dtype=img.dtype)
            if self.self_condition
            else jnp.zeros((), dtype=img.dtype)
        )
        (img, _, _), imgs = jax.lax.scan(
            step, (img, x_start0, rng), (t_cur, t_next)
        )
        return self._package_samples(img, imgs, input_add_noise, last)

    # ------------------------------------------------------------------

    def _split_input(self, x_input):
        if self.input_condition:
            return x_input[0], x_input[1]
        if isinstance(x_input, (list, tuple)):
            return x_input[0], None
        if x_input is None:
            return 0.0, None  # unconditional generation
        return x_input, None

    def _package_samples(self, img, imgs, input_add_noise, last):
        if self.condition:
            if last:
                out = [input_add_noise, img]
            else:
                out = [input_add_noise] + list(imgs)
        else:
            out = [img] if last else list(imgs)
        return [unnormalize_to_zero_to_one(o) for o in out]

    def sample(
        self,
        params,
        rng: jax.Array,
        x_input=None,
        batch_size: int = 16,
        last: bool = True,
        use_test_schedule: bool = False,
    ):
        """Public sampling entry (reference src/DADiff.py:1367-1380).

        ``x_input`` is expected in [0, 1]; it is normalized to [-1, 1] here.
        """
        sch = self.test_schedule if use_test_schedule else self.train_schedule
        sample_fn = self.ddim_sample if self.is_ddim_sampling else self.p_sample_loop
        if self.condition:
            if self.input_condition and self.input_condition_mask:
                x_input = [normalize_to_neg_one_to_one(x_input[0])] + list(x_input[1:])
            else:
                x_input = jax.tree_util.tree_map(
                    normalize_to_neg_one_to_one, x_input
                )
            first = x_input[0] if isinstance(x_input, (list, tuple)) else x_input
            size = first.shape
        else:
            size = (batch_size, self.image_size, self.image_size, self.channels)
        return sample_fn(params, rng, x_input, size, sch=sch, last=last)

    # ------------------------------------------------------------------
    # Training loss (reference src/DADiff.py:1382-1498).
    # ------------------------------------------------------------------

    def _loss(self, pred, target):
        if self.loss_type == "l1":
            err = jnp.abs(pred - target)
        elif self.loss_type == "l2":
            err = jnp.square(pred - target)
        else:
            raise ValueError(f"invalid loss type {self.loss_type!r}")
        # reduce 'b ... -> b (...)' mean, then mean over batch
        return jnp.mean(err)

    def p_losses(self, params, rng: jax.Array, imgs, t, model_rngs=None):
        sch = self.train_schedule
        if isinstance(imgs, (list, tuple)):
            x_input_condition = imgs[2] if self.input_condition else None
            x_input = imgs[1]
            x_start = imgs[0]  # gt = imgs[0], input = imgs[1]
        else:
            x_input = 0.0
            x_start = imgs
            x_input_condition = None

        rng, noise_rng, sc_rng, scflag_rng = jax.random.split(rng, 4)
        noise = jax.random.normal(noise_rng, x_start.shape, dtype=x_start.dtype)
        x_res = x_input - x_start

        x = self.q_sample(sch, x_start, x_res, t, noise)

        x_self_cond = None
        if self.self_condition:
            # 50% of the time condition on a detached x_start estimate
            # (reference src/DADiff.py:1423-1432).
            pred = self.model_predictions(
                params, sch, x_input, x, t, x_input_condition
            ).pred_x_start
            pred = jax.lax.stop_gradient(pred)
            use = jax.random.bernoulli(scflag_rng)
            x_self_cond = jnp.where(use, pred, jnp.zeros_like(pred))

        x_in = self._model_input(x, x_input, x_input_condition)
        time_pair = [
            sch.alphas_cumsum[t] * self.num_timesteps,
            sch.betas_cumsum[t] * self.num_timesteps,
        ]
        model_out = self.model_fn(params, x_in, time_pair, x_self_cond)

        target = []
        if self.objective == "pred_res_noise":
            target = [x_res, noise]
        elif self.objective == "pred_x0_noise":
            target = [x_start, noise]
        elif self.objective == "pred_noise":
            target = [noise]
        elif self.objective == "pred_res":
            target = [x_res]
        else:
            raise ValueError(f"unknown objective {self.objective!r}")

        losses = [
            self._loss(model_out[i], target[i]) for i in range(len(model_out))
        ]
        if self.aux_grad_loss_weight > 0.0:
            from founddiff_tpu.ops.losses import grad_loss

            losses[0] = losses[0] + self.aux_grad_loss_weight * grad_loss(
                model_out[0], target[0]
            )
        if self.aux_wavelet_loss_weight > 0.0:
            from founddiff_tpu.ops.losses import wt_decomp

            # compare high-frequency bands (NHWC: decompose the channel dim
            # batch-wise on the spatial axes)
            _, hi_pred = wt_decomp(
                jnp.moveaxis(model_out[0], -1, 1), level=3
            )
            _, hi_tgt = wt_decomp(jnp.moveaxis(target[0], -1, 1), level=3)
            losses[0] = losses[0] + self.aux_wavelet_loss_weight * jnp.mean(
                jnp.abs(hi_pred - hi_tgt)
            )
        return losses

    def loss(self, params, rng: jax.Array, imgs):
        """Sample t, normalize inputs, return the per-unet loss list
        (reference ``ResidualDiffusion.forward`` src/DADiff.py:1484-1498)."""
        first = imgs[0] if isinstance(imgs, (list, tuple)) else imgs
        b = first.shape[0]
        rng, t_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (b,), 0, self.num_timesteps)

        if self.input_condition and self.input_condition_mask:
            imgs = [
                normalize_to_neg_one_to_one(imgs[0]),
                normalize_to_neg_one_to_one(imgs[1]),
            ] + list(imgs[2:])
        else:
            imgs = jax.tree_util.tree_map(normalize_to_neg_one_to_one, imgs)

        return self.p_losses(params, rng, imgs, t)

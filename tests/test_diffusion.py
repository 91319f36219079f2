"""Behavioral tests of the residual and gaussian diffusion processes using a
tiny linear model (no UNet), checking closed-form identities and sampler
semantics against the reference equations (src/DADiff.py:1121-1365)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from founddiff_tpu.diffusion import GaussianDiffusion, ResidualDiffusion


def make_process(objective="pred_res", test_res_or_noise="res", **kw):
    # model that predicts the residual exactly: in the conditional setup the
    # input is cat(x_noisy, x_input); a model returning a constant lets us
    # verify the sampler algebra in closed form.
    def model_fn(params, x_in, time_pair, x_self_cond):
        del time_pair, x_self_cond
        return [jnp.full_like(x_in[..., :1], params["res"])]

    return ResidualDiffusion(
        model_fn,
        image_size=8,
        channels=1,
        timesteps=100,
        sampling_timesteps=kw.pop("sampling_timesteps", 5),
        objective=objective,
        loss_type="l2",
        condition=True,
        sum_scale=0.01,
        test_res_or_noise=test_res_or_noise,
        **kw,
    )


def test_q_sample_identity():
    proc = make_process()
    sch = proc.train_schedule
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 8, 8, 1))
    res = jnp.ones_like(x0) * 0.5
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0, 50])
    xt = proc.q_sample(sch, x0, res, t, noise)
    expected = (
        x0
        + np.asarray(sch.alphas_cumsum)[np.asarray(t)][:, None, None, None] * res
        + np.asarray(sch.betas_cumsum)[np.asarray(t)][:, None, None, None]
        * np.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(xt), expected, rtol=1e-5, atol=1e-6)


def test_pred_res_roundtrip():
    """predict_noise_from_res and predict_start follow from q_sample."""
    proc = make_process()
    sch = proc.train_schedule
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (2, 8, 8, 1))
    x_input = x0 + 0.3
    res = x_input - x0
    noise = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    t = jnp.array([10, 70])
    xt = proc.q_sample(sch, x0, res, t, noise)

    # given true res, recovered noise must match
    rec_noise = proc.predict_noise_from_res(sch, xt, t, x_input, res)
    np.testing.assert_allclose(
        np.asarray(rec_noise), np.asarray(noise), rtol=2e-3, atol=2e-3
    )
    # given true res+noise, recovered x0 must match
    rec_x0 = proc.predict_start_from_res_noise(sch, xt, t, res, noise)
    np.testing.assert_allclose(np.asarray(rec_x0), np.asarray(x0), rtol=1e-4, atol=1e-4)


def test_ddim_sample_perfect_model_recovers_clean():
    """With a model that predicts the exact (constant) residual, conditional
    DDIM must return x_input - res at the end (x_start), up to the initial
    noise path: the last step returns x_start exactly
    (reference src/DADiff.py:1320-1324)."""
    proc = make_process(sampling_timesteps=2)
    params = {"res": 0.2}
    rng = jax.random.PRNGKey(42)
    x_input01 = jnp.full((1, 8, 8, 1), 0.7)  # in [0,1]
    out = proc.sample(params, rng, x_input01, last=True, use_test_schedule=True)
    assert len(out) == 2  # [input_add_noise, img]
    final = np.asarray(out[1])
    # x_input normalized = 0.4; x_start = 0.4 - 0.2 = 0.2 -> unnormalized 0.6
    np.testing.assert_allclose(final, 0.6, rtol=1e-4, atol=1e-4)


def test_loss_zero_for_perfect_model():
    proc = make_process()
    # gt and input differ by exactly the constant residual the model outputs
    gt = jnp.full((2, 8, 8, 1), 0.5)
    inp = gt + 0.1  # residual (normalized) = 0.2
    losses = proc.loss({"res": 0.2}, jax.random.PRNGKey(0), [gt, inp])
    assert len(losses) == 1
    assert float(losses[0]) < 1e-10


def test_loss_positive_for_wrong_model():
    proc = make_process()
    gt = jnp.full((2, 8, 8, 1), 0.5)
    inp = gt + 0.1
    losses = proc.loss({"res": -0.3}, jax.random.PRNGKey(0), [gt, inp])
    assert float(losses[0]) > 1e-3


def test_ddpm_sampler_runs():
    proc = make_process(sampling_timesteps=100)  # == timesteps -> ancestral
    assert not proc.is_ddim_sampling
    out = proc.sample(
        {"res": 0.2}, jax.random.PRNGKey(0), jnp.full((1, 8, 8, 1), 0.7)
    )
    assert np.asarray(out[1]).shape == (1, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(out[1])))


def test_jit_ddim_sampler():
    proc = make_process(sampling_timesteps=2)

    @jax.jit
    def run(params, rng, x):
        return proc.sample(params, rng, x)[1]

    out = run({"res": 0.2}, jax.random.PRNGKey(0), jnp.full((1, 8, 8, 1), 0.7))
    assert out.shape == (1, 8, 8, 1)


@pytest.mark.parametrize("objective", ["pred_noise", "pred_x0", "pred_v"])
def test_gaussian_diffusion(objective):
    def model_fn(params, x, t, x_self_cond):
        return x * params["w"]

    proc = GaussianDiffusion(
        model_fn,
        image_size=8,
        channels=1,
        timesteps=50,
        sampling_timesteps=5,
        objective=objective,
        loss_type="l2",
        beta_schedule="cosine",
    )
    rng = jax.random.PRNGKey(0)
    loss = proc.loss({"w": 0.5}, rng, jax.random.uniform(rng, (2, 8, 8, 1)))
    assert np.isfinite(float(loss))
    img = proc.sample({"w": 0.5}, rng, batch_size=1)
    assert img.shape == (1, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(img)))


def test_gaussian_q_sample_snr():
    def model_fn(params, x, t, xsc):
        return x

    proc = GaussianDiffusion(
        model_fn, image_size=8, channels=1, timesteps=100, beta_schedule="linear"
    )
    x0 = jnp.ones((1, 8, 8, 1))
    noise = jnp.zeros_like(x0)
    xt = proc.q_sample(x0, jnp.array([99]), noise)
    # at the last step, signal is heavily attenuated
    assert float(jnp.abs(xt).mean()) < 0.92


def make_selfcond_process(self_condition, **kw):
    # model whose output depends on x_self_cond so the sampler's threading of
    # the previous x_start is observable (reference src/DADiff.py:1309-1311)
    def model_fn(params, x_in, time_pair, x_self_cond):
        del time_pair
        base = jnp.full_like(x_in[..., :1], params["res"])
        if x_self_cond is not None:
            base = base + 0.3 * x_self_cond
        return [base]

    return ResidualDiffusion(
        model_fn,
        image_size=8,
        channels=1,
        timesteps=100,
        sampling_timesteps=kw.pop("sampling_timesteps", 4),
        objective="pred_res",
        loss_type="l2",
        condition=True,
        sum_scale=0.01,
        test_res_or_noise="res",
        self_condition=self_condition,
        **kw,
    )


def test_ddim_self_conditioning_changes_samples():
    """With self_condition=True the sampler must feed the previous step's
    x_start into the model (reference src/DADiff.py:1298,1309-1311), so a
    model that reads x_self_cond samples differently from the unconditioned
    path after the first step."""
    rng = jax.random.PRNGKey(7)
    x_input = jnp.full((1, 8, 8, 1), 0.7)
    out_sc = make_selfcond_process(True).sample(
        {"res": 0.2}, rng, x_input, last=True
    )[1]
    out_no = make_selfcond_process(False).sample(
        {"res": 0.2}, rng, x_input, last=True
    )[1]
    assert not np.allclose(np.asarray(out_sc), np.asarray(out_no), atol=1e-6)


def test_ddim_self_conditioning_first_step_zeros():
    """The first model call sees zeros (the reference's None default expands
    to zeros, src/DADiff.py:687-688), so a single-step DDIM run matches the
    unconditioned path exactly."""
    rng = jax.random.PRNGKey(7)
    x_input = jnp.full((1, 8, 8, 1), 0.7)
    one_sc = make_selfcond_process(True, sampling_timesteps=1).sample(
        {"res": 0.2}, rng, x_input, last=True
    )[1]
    one_no = make_selfcond_process(False, sampling_timesteps=1).sample(
        {"res": 0.2}, rng, x_input, last=True
    )[1]
    np.testing.assert_allclose(np.asarray(one_sc), np.asarray(one_no), atol=1e-6)


def test_ddpm_self_conditioning_changes_samples():
    rng = jax.random.PRNGKey(3)
    x_input = jnp.full((1, 8, 8, 1), 0.7)
    out_sc = make_selfcond_process(True, sampling_timesteps=100).sample(
        {"res": 0.2}, rng, x_input, last=True
    )[1]
    out_no = make_selfcond_process(False, sampling_timesteps=100).sample(
        {"res": 0.2}, rng, x_input, last=True
    )[1]
    assert np.all(np.isfinite(np.asarray(out_sc)))
    assert not np.allclose(np.asarray(out_sc), np.asarray(out_no), atol=1e-6)


def test_self_conditioned_training_loss():
    """p_losses runs the extra stop-gradient prediction pass 50% of the time
    (reference src/DADiff.py:1422-1432) and stays finite/consistent."""
    proc = make_selfcond_process(True)
    gt = jnp.full((4, 8, 8, 1), 0.5)
    inp = gt + 0.1
    losses = proc.loss({"res": 0.2}, jax.random.PRNGKey(0), [gt, inp])
    assert len(losses) == 1 and np.isfinite(float(losses[0]))
    # gradients flow (through the main call, not the detached estimate)
    g = jax.grad(lambda p: proc.loss(p, jax.random.PRNGKey(0), [gt, inp])[0])(
        {"res": 0.2}
    )
    assert np.isfinite(float(g["res"]))


def test_ddim_use_x_start_variant_matches_reference_formula():
    """'use_x_start' update (reference src/DADiff.py:1345-1349):
    img' = c*img + (1-c)*x0 + (acs_next - acs*c)*res, c = sqrt(b2cs_next)/bcs.
    Verified in closed form with a constant-residual model."""
    proc = make_process(sampling_timesteps=2, ddim_update="use_x_start")
    params = {"res": 0.2}
    rng = jax.random.PRNGKey(5)
    x_input01 = jnp.full((1, 8, 8, 1), 0.7)
    outs = proc.sample(params, rng, x_input01, last=False)
    # outs = [input_add_noise, img1, img2] (all unnormalized to [0,1])
    img0 = np.asarray(outs[0]) * 2 - 1
    img1 = np.asarray(outs[1]) * 2 - 1

    sch = proc.train_schedule
    t, tn = 99, 49  # ddim_time_pairs(100, 2) -> [(99, 49), (49, -1)]
    x_input = np.full_like(img0, 0.4)  # normalized
    pred_res = 0.2
    x_start = np.clip(x_input - pred_res, -1, 1)
    acs = float(sch.alphas_cumsum[t])
    acs_n = float(sch.alphas_cumsum[tn])
    b2cs_n = float(sch.betas2_cumsum[tn])
    bcs = float(sch.betas_cumsum[t])
    c = np.sqrt(b2cs_n) / bcs  # eta = 0 -> sigma2 = 0
    expected = c * img0 + (1 - c) * x_start + (acs_n - acs * c) * pred_res
    np.testing.assert_allclose(img1, expected, rtol=1e-4, atol=1e-5)

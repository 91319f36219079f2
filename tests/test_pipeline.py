"""Hoisted-sampler pipeline and conditioning-variant tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from founddiff_tpu.diffusion import ResidualDiffusion
from founddiff_tpu.models.founddiff import FoundDiffDenoiser
from founddiff_tpu.pipeline import make_hoisted_sampler

_MICRO_CLIP = (
    ("vision_layers", (1, 1, 1, 1)),
    ("vision_width", 8),
    ("embed_dim", 64),
    ("transformer_width", 32),
    ("transformer_layers", 2),
    ("transformer_heads", 4),
    ("backbone_resolution", 64),
)


@pytest.fixture(scope="module")
def founddiff_setup():
    model = FoundDiffDenoiser(
        dim=8,
        dim_mults=(1, 2),
        channels=1,
        num_unet=1,
        condition=True,
        objective="pred_res",
        test_res_or_noise="res",
        scan_impl="ref",
        clip_overrides=_MICRO_CLIP,
    )

    def model_fn(params, x_in, time, x_self_cond=None):
        return model.apply({"params": params}, x_in, time, x_self_cond)

    diffusion = ResidualDiffusion(
        model_fn,
        image_size=32,
        channels=1,
        timesteps=20,
        sampling_timesteps=2,
        objective="pred_res",
        loss_type="l2",
        condition=True,
        sum_scale=0.01,
        test_res_or_noise="res",
    )
    x0 = jnp.zeros((1, 32, 32, 2))
    time0 = [jnp.zeros((1,)), jnp.zeros((1,))]
    params = model.init(jax.random.PRNGKey(0), x0, time0)["params"]
    return model, diffusion, params


def test_hoisted_sampler_matches_inline(founddiff_setup):
    """Hoisting the tower out of the loop must be bit-equivalent to the
    reference behavior of recomputing it every step (same fixed input)."""
    model, diffusion, params = founddiff_setup
    rng = jax.random.PRNGKey(3)
    x01 = jnp.asarray(
        np.random.RandomState(0).rand(1, 32, 32, 1), jnp.float32
    )

    inline = diffusion.sample(params, rng, x01, use_test_schedule=True)[-1]
    hoisted = make_hoisted_sampler(model, diffusion, use_test_schedule=True)(
        params, rng, x01
    )
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(inline), rtol=1e-5, atol=1e-5
    )


def test_founddiff_loss_and_grads(founddiff_setup):
    """Gradients flow through the UNet but NOT into the frozen tower."""
    model, diffusion, params = founddiff_setup
    gt = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 1), jnp.float32)
    ld = jnp.clip(gt + 0.1, 0, 1)

    def loss(p):
        return sum(diffusion.loss(p, jax.random.PRNGKey(0), [gt, ld]))

    g = jax.grad(loss)(params)
    tower_norm = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), g["dose_encoder"], 0.0
    )
    unet_norm = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), g["model"], 0.0
    )
    assert tower_norm == 0.0  # stop_gradient on embeddings
    assert unet_norm > 0.0


def test_self_condition_path():
    from founddiff_tpu.models import UnetRes

    model = UnetRes(
        dim=8, dim_mults=(1, 2), channels=1, num_unet=1, condition=True,
        self_condition=True, objective="pred_res", test_res_or_noise="res",
        scan_impl="ref",
    )
    x = jnp.zeros((1, 8, 8, 2))
    time = [jnp.zeros((1,)), jnp.zeros((1,))]
    params = model.init(jax.random.PRNGKey(0), x, time)
    out = model.apply(params, x, time)  # x_self_cond defaults to zeros
    assert out[0].shape == (1, 8, 8, 1)
    out2 = model.apply(params, x, time, x_self_cond=jnp.ones((1, 8, 8, 1)))
    assert not np.allclose(np.asarray(out[0]), np.asarray(out2[0]))


def test_input_condition_path():
    """input_condition adds a third channel group (reference
    src/DADiff.py:553-556, 1157-1161)."""
    def model_fn(params, x_in, time, x_self_cond=None):
        assert x_in.shape[-1] == 3
        return [x_in[..., :1] * params["w"]]

    diffusion = ResidualDiffusion(
        model_fn,
        image_size=8,
        channels=1,
        timesteps=10,
        sampling_timesteps=2,
        objective="pred_res",
        loss_type="l2",
        condition=True,
        input_condition=True,
        sum_scale=0.01,
        test_res_or_noise="res",
    )
    gt = jnp.full((1, 8, 8, 1), 0.5)
    ld = gt + 0.1
    mask = jnp.ones_like(gt)
    losses = diffusion.loss({"w": 0.3}, jax.random.PRNGKey(0), [gt, ld, mask])
    assert np.isfinite(float(losses[0]))
    out = diffusion.sample(
        {"w": 0.3}, jax.random.PRNGKey(1), [ld, mask], use_test_schedule=True
    )
    assert np.asarray(out[-1]).shape == (1, 8, 8, 1)

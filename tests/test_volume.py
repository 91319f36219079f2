"""Mesh-sharded volume inference (BASELINE config 5) on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from founddiff_tpu.diffusion import ResidualDiffusion
from founddiff_tpu.parallel import make_mesh
from founddiff_tpu.pipeline import make_volume_denoiser


class _FakeModel:
    """Minimal FoundDiffDenoiser-compatible stub: constant residual."""

    def apply(self, variables, x, time=None, x_self_cond=None, method=None,
              dose_embedding=None, content_embedding=None):
        params = variables["params"]
        if method == "encode":
            B = x.shape[0]
            return jnp.zeros((B, 1024)), jnp.zeros((B, 1, 256))
        return [jnp.full_like(x[..., :1], params["res"])]


def test_volume_denoiser_sharded():
    mesh = make_mesh(data=4, seq=2)
    model = _FakeModel()

    def model_fn(params, x_in, time, x_self_cond=None):
        return model.apply({"params": params}, x_in, time, x_self_cond)

    diffusion = ResidualDiffusion(
        model_fn,
        image_size=16,
        channels=1,
        timesteps=10,
        sampling_timesteps=2,
        objective="pred_res",
        loss_type="l2",
        condition=True,
        sum_scale=0.01,
        test_res_or_noise="res",
    )
    denoise = make_volume_denoiser(model, diffusion, mesh, batch_per_device=1)
    # 10 slices -> padded to 12 (wave of 4), 3 waves
    volume = jnp.full((10, 16, 16, 1), 0.7)
    out = denoise({"res": 0.2}, jax.random.PRNGKey(0), volume)
    assert out.shape == (10, 16, 16, 1)
    # perfect model: x_start = norm(0.7) - 0.2 -> unnormalized 0.6
    np.testing.assert_allclose(np.asarray(out), 0.6, rtol=1e-4, atol=1e-4)

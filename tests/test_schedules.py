"""Golden tests for diffusion schedules.

The expected values are computed with an *independent* torch implementation of
the reference's schedule math (reference src/DADiff.py:946-1118), so any
divergence in the JAX build shows up as a mismatch here.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from founddiff_tpu.diffusion import (
    ddim_time_pairs,
    gen_coefficients,
    make_gaussian_schedule,
    make_residual_schedule,
)


def torch_residual_schedule(timesteps=1000, test=False):
    """Reference math (src/DADiff.py:946-1027 train, :1033-1118 test) in torch."""
    betas = torch.linspace(0.0001, 0.02, timesteps, dtype=torch.float32)
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
    alphas_cumsum = 1 - alphas_cumprod**0.5
    betas2_cumsum = 1 - alphas_cumprod
    alphas_cumsum_prev = F.pad(alphas_cumsum[:-1], (1, 0), value=1.0)
    betas2_cumsum_prev = F.pad(betas2_cumsum[:-1], (1, 0), value=1.0)
    alphas = alphas_cumsum - alphas_cumsum_prev
    betas2 = betas2_cumsum - betas2_cumsum_prev
    if test:
        alphas[0] = alphas[1]
        betas2[0] = betas2[1]
    else:
        alphas[0] = 0
        betas2[0] = 0

    betas_cumsum = torch.sqrt(betas2_cumsum)
    posterior_variance = betas2 * betas2_cumsum_prev / betas2_cumsum
    posterior_variance[0] = 0

    out = dict(
        alphas=alphas,
        alphas_cumsum=alphas_cumsum,
        one_minus_alphas_cumsum=1 - alphas_cumsum,
        betas2=betas2,
        betas=torch.sqrt(betas2),
        betas2_cumsum=betas2_cumsum,
        betas_cumsum=betas_cumsum,
        posterior_mean_coef1=betas2_cumsum_prev / betas2_cumsum,
        posterior_mean_coef2=(
            betas2 * alphas_cumsum_prev - betas2_cumsum_prev * alphas
        )
        / betas2_cumsum,
        posterior_mean_coef3=betas2 / betas2_cumsum,
        posterior_variance=posterior_variance,
        posterior_log_variance_clipped=torch.log(
            posterior_variance.clamp(min=1e-20)
        ),
    )
    out["posterior_mean_coef1"][0] = 0
    out["posterior_mean_coef2"][0] = 0
    out["posterior_mean_coef3"][0] = 1
    out["one_minus_alphas_cumsum"][-1] = 1e-6
    return {k: v.numpy() for k, v in out.items()}


@pytest.mark.parametrize("test_variant", [False, True])
def test_residual_schedule_matches_torch(test_variant):
    ours = make_residual_schedule(1000, test=test_variant)
    golden = torch_residual_schedule(1000, test=test_variant)
    assert ours.num_timesteps == 1000
    for name, expected in golden.items():
        got = np.asarray(getattr(ours, name))
        # torch's fp32 linspace/cumprod differ from numpy's in the last ulp;
        # sqrt- and ratio-derived arrays amplify that where the numerator is
        # a near-cancellation (early timesteps).  Direct arrays must match to
        # fp32 precision; derived ones to 1e-3 relative.
        derived = (
            "betas",
            "betas_cumsum",
            "posterior_mean_coef1",
            "posterior_mean_coef2",
            "posterior_mean_coef3",
            "posterior_variance",
            "posterior_log_variance_clipped",
        )
        rtol = 1e-3 if name in derived else 2e-6
        np.testing.assert_allclose(
            got, expected, rtol=rtol, atol=2e-7, err_msg=name
        )


def test_train_vs_test_schedule_t0_handling():
    train = make_residual_schedule(100, test=False)
    test = make_residual_schedule(100, test=True)
    assert float(train.alphas[0]) == 0.0
    assert float(train.betas2[0]) == 0.0
    assert float(test.alphas[0]) == float(test.alphas[1])
    assert float(test.betas2[0]) == float(test.betas2[1])
    # shared overrides
    for s in (train, test):
        assert float(s.posterior_mean_coef1[0]) == 0.0
        assert float(s.posterior_mean_coef2[0]) == 0.0
        assert float(s.posterior_mean_coef3[0]) == 1.0
        assert float(s.one_minus_alphas_cumsum[-1]) == pytest.approx(1e-6)


def test_gen_coefficients_sums():
    for schedule in ["increased", "decreased", "average", "normal"]:
        c = gen_coefficients(1000, schedule=schedule, sum_scale=0.01)
        assert c.shape == (1000,)
        np.testing.assert_allclose(c.sum(), 0.01, rtol=1e-5)
    dec = gen_coefficients(10, schedule="decreased")
    assert dec[0] > dec[-1]
    inc = gen_coefficients(10, schedule="increased")
    assert inc[0] < inc[-1]


def test_non_ddim_residual_schedule():
    s = make_residual_schedule(100, convert_to_ddim=False, sum_scale=0.01)
    np.testing.assert_allclose(float(s.alphas_cumsum[-1]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(s.betas2_cumsum[-1]), 0.01, rtol=1e-4)


def test_ddim_time_pairs():
    t_cur, t_next = ddim_time_pairs(1000, 2)
    # reference: linspace(-1, 999, 3) -> [-1, 499, 999] reversed
    np.testing.assert_array_equal(t_cur, [999, 499])
    np.testing.assert_array_equal(t_next, [499, -1])
    t_cur, t_next = ddim_time_pairs(1000, 1000)
    assert t_cur[0] == 999 and t_next[-1] == -1
    assert len(t_cur) == 1000


def test_gaussian_schedule_linear_matches_torch():
    betas = torch.linspace(0.0001, 0.02, 1000, dtype=torch.float64)
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
    s = make_gaussian_schedule(1000, beta_schedule="linear")
    np.testing.assert_allclose(
        np.asarray(s.alphas_cumprod),
        alphas_cumprod.numpy().astype(np.float32),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(s.sqrt_alphas_cumprod) ** 2
        + np.asarray(s.sqrt_one_minus_alphas_cumprod) ** 2,
        np.ones(1000),
        rtol=1e-5,
    )

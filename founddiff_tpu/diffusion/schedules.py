"""Diffusion noise schedules as immutable JAX pytrees.

The PyTorch reference registers its schedule coefficients as fp32 module
buffers (reference: src/DADiff.py:1005-1027).  Here they are precomputed fp32
arrays bundled in a frozen dataclass so that every diffusion function is pure
and the whole sampler can live under one ``jax.jit``.

Two variants of the residual (RDDM-style) schedule exist, mirroring the
reference's deliberate train/test asymmetry:

- the *train* schedule zeroes the t=0 increments
  (``alphas[0]=0, betas2[0]=0``; reference src/DADiff.py:974-977), while
- the *test* schedule produced by ``ResidualDiffusion.init()`` copies them from
  t=1 (``alphas[0]=alphas[1]``; reference src/DADiff.py:1064-1067).

Both then apply the same posterior-coefficient overrides at t=0 and the
``one_minus_alphas_cumsum[-1] = 1e-6`` guard (reference src/DADiff.py:1024-1027).
PSNR parity at 2-step DDIM is sensitive to these edges, so they are replicated
bit-for-bit (in fp32) and golden-tested against independent torch math.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

Array = np.ndarray


def gen_coefficients(
    timesteps: int,
    schedule: str = "increased",
    sum_scale: float = 1.0,
    ratio: float = 1.0,
) -> Array:
    """Power-law / gaussian per-step coefficient generator.

    Mirrors reference src/DADiff.py:846-874: returns per-step increments that
    sum to ``sum_scale``.
    """
    if schedule == "increased":
        x = np.linspace(0, 1, timesteps, dtype=np.float32)
        y = x**ratio
        alphas = y / y.sum()
    elif schedule == "decreased":
        x = np.linspace(0, 1, timesteps, dtype=np.float32)
        y = (x**ratio)[::-1].copy()
        alphas = y / y.sum()
    elif schedule == "average":
        alphas = np.full([timesteps], 1.0 / timesteps, dtype=np.float32)
    elif schedule == "normal":
        sigma, mu = 1.0, 0.0
        x = np.linspace(-3 + mu, 3 + mu, timesteps, dtype=np.float32)
        y = np.e ** (-((x - mu) ** 2) / (2 * sigma**2)) / (
            np.sqrt(2 * np.pi) * sigma**2
        )
        alphas = y / y.sum()
    else:
        alphas = np.full([timesteps], 1.0 / timesteps, dtype=np.float32)
    assert abs(alphas.sum() - 1.0) < 1e-6
    return (alphas * sum_scale).astype(np.float32)


def betas_for_alpha_bar(num_diffusion_timesteps: int, max_beta: float = 0.999) -> Array:
    """Glide/squaredcos_cap_v2 cosine beta schedule (reference src/DADiff.py:878-906)."""

    def alpha_bar(time_step: float) -> float:
        return math.cos((time_step + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.asarray(betas, dtype=np.float32)


def make_beta_schedule(
    timesteps: int,
    beta_schedule: str = "linear",
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
) -> Array:
    """Base beta schedule used by the DDIM-converted residual schedule
    (reference src/DADiff.py:952-970) and the vanilla gaussian process."""
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, timesteps, dtype=np.float32)
    if beta_schedule == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, timesteps, dtype=np.float32)
            ** 2
        )
    if beta_schedule == "squaredcos_cap_v2":
        return betas_for_alpha_bar(timesteps)
    raise NotImplementedError(f"unknown beta schedule {beta_schedule!r}")


@dataclasses.dataclass(frozen=True)
class ResidualSchedule:
    """Precomputed coefficients of the residual diffusion process.

    All arrays are fp32 of shape ``[timesteps]``, matching the reference's
    registered buffers (src/DADiff.py:1008-1027).
    """

    alphas: jnp.ndarray
    alphas_cumsum: jnp.ndarray
    one_minus_alphas_cumsum: jnp.ndarray
    betas2: jnp.ndarray
    betas: jnp.ndarray
    betas2_cumsum: jnp.ndarray
    betas_cumsum: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    posterior_mean_coef3: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    num_timesteps: int = dataclasses.field(metadata={"static": True})

    def tree_flatten(self):  # pragma: no cover - registered below
        children = tuple(
            getattr(self, f.name)
            for f in dataclasses.fields(self)
            if f.name != "num_timesteps"
        )
        return children, self.num_timesteps

    @classmethod
    def tree_unflatten(cls, aux, children):  # pragma: no cover
        names = [f.name for f in dataclasses.fields(cls) if f.name != "num_timesteps"]
        return cls(**dict(zip(names, children)), num_timesteps=aux)


import jax.tree_util as _tree_util  # noqa: E402

_tree_util.register_pytree_node(
    ResidualSchedule,
    ResidualSchedule.tree_flatten,
    ResidualSchedule.tree_unflatten,
)


def _residual_schedule_from_increments(
    alphas: Array,
    betas2: Array,
    alphas_cumsum: Array,
    betas2_cumsum: Array,
    alphas_cumsum_prev: Array,
    betas2_cumsum_prev: Array,
) -> ResidualSchedule:
    """Assemble posterior coefficients and apply the shared t=0 overrides."""
    betas_cumsum = np.sqrt(betas2_cumsum)
    # t=0 entries can be 0/0 here; they are overridden below exactly as the
    # reference does after registration (src/DADiff.py:1024-1026).
    with np.errstate(divide="ignore", invalid="ignore"):
        posterior_variance = betas2 * betas2_cumsum_prev / betas2_cumsum
        posterior_variance[0] = 0.0
        posterior_mean_coef1 = betas2_cumsum_prev / betas2_cumsum
        posterior_mean_coef2 = (
            betas2 * alphas_cumsum_prev - betas2_cumsum_prev * alphas
        ) / betas2_cumsum
        posterior_mean_coef3 = betas2 / betas2_cumsum
    posterior_log_variance_clipped = np.log(np.clip(posterior_variance, 1e-20, None))

    one_minus_alphas_cumsum = 1.0 - alphas_cumsum

    # Post-registration overrides (reference src/DADiff.py:1024-1027).
    posterior_mean_coef1[0] = 0.0
    posterior_mean_coef2[0] = 0.0
    posterior_mean_coef3[0] = 1.0
    one_minus_alphas_cumsum[-1] = 1e-6

    as_f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return ResidualSchedule(
        alphas=as_f32(alphas),
        alphas_cumsum=as_f32(alphas_cumsum),
        one_minus_alphas_cumsum=as_f32(one_minus_alphas_cumsum),
        betas2=as_f32(betas2),
        betas=as_f32(np.sqrt(betas2)),
        betas2_cumsum=as_f32(betas2_cumsum),
        betas_cumsum=as_f32(betas_cumsum),
        posterior_mean_coef1=as_f32(posterior_mean_coef1),
        posterior_mean_coef2=as_f32(posterior_mean_coef2),
        posterior_mean_coef3=as_f32(posterior_mean_coef3),
        posterior_variance=as_f32(posterior_variance),
        posterior_log_variance_clipped=as_f32(posterior_log_variance_clipped),
        num_timesteps=int(alphas.shape[0]),
    )


def _pad_prev(x: Array, value: float) -> Array:
    return np.concatenate([np.asarray([value], dtype=x.dtype), x[:-1]])


def make_residual_schedule(
    timesteps: int = 1000,
    *,
    test: bool = False,
    convert_to_ddim: bool = True,
    beta_schedule: str = "linear",
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
    sum_scale: float = 1.0,
) -> ResidualSchedule:
    """Build the residual-diffusion schedule.

    ``test=False`` reproduces the reference ctor (src/DADiff.py:946-1027);
    ``test=True`` reproduces ``ResidualDiffusion.init()``
    (src/DADiff.py:1033-1118), which differs only in the t=0 increment
    handling and in the ``_prev`` pad value of the non-DDIM branch.
    """
    alphas = betas2 = None
    if convert_to_ddim:
        betas = make_beta_schedule(timesteps, beta_schedule, beta_start, beta_end)
        # fp32 cumprod to match torch.cumprod on fp32 buffers
        # (reference src/DADiff.py:971-972).
        alphas_cumprod = np.cumprod((1.0 - betas).astype(np.float32))
        alphas_cumsum = 1.0 - alphas_cumprod**0.5
        betas2_cumsum = 1.0 - alphas_cumprod

        alphas_cumsum_prev = _pad_prev(alphas_cumsum, 1.0)
        betas2_cumsum_prev = _pad_prev(betas2_cumsum, 1.0)
        alphas = alphas_cumsum - alphas_cumsum_prev
        betas2 = betas2_cumsum - betas2_cumsum_prev
        if test:
            alphas[0] = alphas[1]
            betas2[0] = betas2[1]
        else:
            alphas[0] = 0.0
            betas2[0] = 0.0
    else:
        if test:
            alphas = gen_coefficients(timesteps, schedule="average", ratio=1)
            betas2 = gen_coefficients(
                timesteps, schedule="increased", sum_scale=sum_scale, ratio=3
            )
        else:
            alphas = gen_coefficients(timesteps, schedule="decreased")
            betas2 = gen_coefficients(
                timesteps, schedule="increased", sum_scale=sum_scale
            )
        alphas_cumsum = np.clip(np.cumsum(alphas), 0, 1)
        betas2_cumsum = np.clip(np.cumsum(betas2), 0, 1)
        if test:
            alphas_cumsum_prev = _pad_prev(alphas_cumsum, float(alphas_cumsum[1]))
            betas2_cumsum_prev = _pad_prev(betas2_cumsum, float(betas2_cumsum[1]))
        else:
            alphas_cumsum_prev = _pad_prev(alphas_cumsum, 1.0)
            betas2_cumsum_prev = _pad_prev(betas2_cumsum, 1.0)

    return _residual_schedule_from_increments(
        alphas,
        betas2,
        alphas_cumsum,
        betas2_cumsum,
        alphas_cumsum_prev,
        betas2_cumsum_prev,
    )


@dataclasses.dataclass(frozen=True)
class GaussianSchedule:
    """Coefficients of the vanilla DDPM process
    (reference src/denoising_diffusion_pytorch.py:437-537)."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    p2_loss_weight: jnp.ndarray
    num_timesteps: int

    def tree_flatten(self):  # pragma: no cover
        children = tuple(
            getattr(self, f.name)
            for f in dataclasses.fields(self)
            if f.name != "num_timesteps"
        )
        return children, self.num_timesteps

    @classmethod
    def tree_unflatten(cls, aux, children):  # pragma: no cover
        names = [f.name for f in dataclasses.fields(cls) if f.name != "num_timesteps"]
        return cls(**dict(zip(names, children)), num_timesteps=aux)


_tree_util.register_pytree_node(
    GaussianSchedule,
    GaussianSchedule.tree_flatten,
    GaussianSchedule.tree_unflatten,
)


def linear_beta_schedule(timesteps: int) -> Array:
    """lucidrains linear schedule scaled for the 1000-step regime
    (reference src/denoising_diffusion_pytorch.py:419-424)."""
    scale = 1000 / timesteps
    return np.linspace(
        scale * 0.0001, scale * 0.02, timesteps, dtype=np.float64
    ).astype(np.float32)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> Array:
    """Nichol & Dhariwal cosine schedule
    (reference src/denoising_diffusion_pytorch.py:427-435)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999).astype(np.float32)


def make_gaussian_schedule(
    timesteps: int = 1000,
    *,
    beta_schedule: str = "linear",
    p2_loss_weight_gamma: float = 0.0,
    p2_loss_weight_k: float = 1.0,
) -> GaussianSchedule:
    if beta_schedule == "linear":
        betas = linear_beta_schedule(timesteps)
    elif beta_schedule == "cosine":
        betas = cosine_beta_schedule(timesteps)
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule!r}")

    betas64 = betas.astype(np.float64)
    alphas = 1.0 - betas64
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas64 * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    as_f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return GaussianSchedule(
        betas=as_f32(betas64),
        alphas_cumprod=as_f32(alphas_cumprod),
        alphas_cumprod_prev=as_f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=as_f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=as_f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=as_f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=as_f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=as_f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=as_f32(posterior_variance),
        posterior_log_variance_clipped=as_f32(
            np.log(np.clip(posterior_variance, 1e-20, None))
        ),
        posterior_mean_coef1=as_f32(
            betas64 * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=as_f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        p2_loss_weight=as_f32(
            (p2_loss_weight_k + alphas_cumprod / (1 - alphas_cumprod))
            ** -p2_loss_weight_gamma
        ),
        num_timesteps=int(timesteps),
    )


def ddim_time_pairs(num_timesteps: int, sampling_timesteps: int) -> Tuple[Array, Array]:
    """Static DDIM time pairs ``[(T-1, ...), ..., (t1, -1)]``.

    Matches reference src/DADiff.py:1288-1292: ``times = linspace(-1, T-1,
    steps+1)`` truncated to ints and reversed.
    """
    times = np.linspace(-1, num_timesteps - 1, sampling_timesteps + 1)
    times = list(reversed(times.astype(int).tolist()))
    pairs = list(zip(times[:-1], times[1:]))
    t_cur = np.asarray([p[0] for p in pairs], dtype=np.int32)
    t_next = np.asarray([p[1] for p in pairs], dtype=np.int32)
    return t_cur, t_next


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-example coefficients and broadcast to an image shape.

    Equivalent of reference src/DADiff.py:840-843 for NHWC tensors: ``a[t]``
    reshaped to ``[B, 1, ..., 1]`` with ``ndim`` total dims.
    """
    out = a[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))

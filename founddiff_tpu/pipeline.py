"""Inference pipelines.

The headline serving path: conditional DDIM denoising of CT slices with the
frozen Dose-CLIP tower *hoisted* out of the timestep loop.  The reference
recomputes the full RN50 + prompt tower inside every UNet call
(src/DADiff.py:692, src/DACLIP.py:1200); since both are functions of the
fixed conditioning image only, they are computed once per slice here and the
bound embeddings ride the ``lax.scan`` — with 2-step DDIM that alone removes
~2/3 of the tower FLOPs, with DDIM-50 ~98%.
"""

from __future__ import annotations

import copy
from typing import Callable

import jax
import jax.numpy as jnp

from founddiff_tpu.diffusion.residual import (
    ResidualDiffusion,
    normalize_to_neg_one_to_one,
)


def make_hoisted_sampler(
    model,
    diffusion: ResidualDiffusion,
    use_test_schedule: bool = True,
    last: bool = True,
    compute_dtype=None,
) -> Callable:
    """Returns ``sample(params, rng, x_input01) -> denoised [B,H,W,C]`` for a
    FoundDiffDenoiser-based ResidualDiffusion.  Jit the returned callable.

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) runs the denoiser trunk in that
    dtype (cast at the model boundary; the sampler's schedule math stays
    fp32).  Pass bf16 *params* for the full effect.
    """

    def sample(params, rng, x_input01):
        x_norm = normalize_to_neg_one_to_one(x_input01)
        dose, content = model.apply({"params": params}, x_norm, method="encode")

        def bound_fn(p, x_in, time, x_self_cond=None):
            if compute_dtype is not None:
                x_in = x_in.astype(compute_dtype)
            out = model.apply(
                {"params": p},
                x_in,
                time,
                x_self_cond=x_self_cond,
                dose_embedding=dose,
                content_embedding=content,
            )
            if compute_dtype is not None:
                out = [o.astype(jnp.float32) for o in out]
            return out

        d = copy.copy(diffusion)
        d.model_fn = bound_fn
        sch = d.test_schedule if use_test_schedule else d.train_schedule
        sample_fn = d.ddim_sample if d.is_ddim_sampling else d.p_sample_loop
        out = sample_fn(params, rng, x_norm, x_norm.shape, sch=sch, last=last)
        return out[-1]

    return sample


def make_volume_denoiser(
    model,
    diffusion: ResidualDiffusion,
    mesh,
    batch_per_device: int = 1,
    compute_dtype=None,
    use_test_schedule: bool = True,
) -> Callable:
    """Mesh-sharded full-volume CT denoising (BASELINE config 5).

    Slices of a [Z, H, W, 1] volume are sharded over the mesh 'data' axis
    (parameters replicated; XLA keeps everything on ICI), processed in
    device-batched waves through the hoisted DDIM sampler.  When the mesh
    also carries a >1 'seq' axis, the model is cloned with it so every SS2D
    selective scan runs sequence-sharded over that axis
    (:mod:`founddiff_tpu.parallel.sequence`) — both mesh axes are live.

    Returns ``denoise(params, rng, volume01) -> denoised [Z, H, W, 1]``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_data = mesh.shape["data"]
    if (
        "seq" in mesh.axis_names
        and int(mesh.shape["seq"]) > 1
        and hasattr(model, "mesh")
        and getattr(model, "mesh", None) is not mesh
    ):
        model = model.clone(mesh=mesh)
    wave = n_data * batch_per_device
    sampler = make_hoisted_sampler(
        model, diffusion, use_test_schedule=use_test_schedule,
        compute_dtype=compute_dtype,
    )
    batch_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    jitted = jax.jit(
        sampler,
        in_shardings=(rep, rep, batch_sh),
        out_shardings=batch_sh,
    )

    def denoise(params, rng, volume01):
        z = volume01.shape[0]
        pad = (-z) % wave
        if pad:
            volume01 = jnp.concatenate(
                [volume01, jnp.repeat(volume01[-1:], pad, axis=0)], axis=0
            )
        outs = []
        for start in range(0, z + pad, wave):
            rng, srng = jax.random.split(rng)
            outs.append(jitted(params, srng, volume01[start : start + wave]))
        return jnp.concatenate(outs, axis=0)[:z]

    return denoise

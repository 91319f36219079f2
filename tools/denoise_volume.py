"""Mesh-sharded full-volume CT denoising CLI (BASELINE config 5).

Loads a checkpoint (Orbax or reference torch ``model-<n>.pt``), builds a
('data', 'seq') mesh over all visible chips, and denoises a [Z, H, W] .npy
volume with slices sharded over 'data' and every SS2D selective scan
sharded over 'seq' (founddiff_tpu/parallel/sequence.py).

Usage:
  python tools/denoise_volume.py volume.npy out.npy \
      --checkpoint checkpoints/FoundDiff/sample/model-400 [--torch] \
      [--seq 2] [--batch_per_device 1] [--steps 2] [--bf16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("volume", help="[Z, H, W] or [Z, H, W, 1] .npy in [0, 1]")
    p.add_argument("output")
    p.add_argument("--checkpoint", required=True,
                   help="Orbax dir (or torch .pt with --torch)")
    p.add_argument("--torch", action="store_true",
                   help="checkpoint is a reference model-<n>.pt")
    p.add_argument("--seq", type=int, default=1,
                   help="sequence-parallel mesh axis size")
    p.add_argument("--batch_per_device", type=int, default=1)
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from founddiff_tpu.config import Config
    from founddiff_tpu.factory import build
    from founddiff_tpu.parallel import init_distributed, make_mesh
    from founddiff_tpu.pipeline import make_volume_denoiser
    from founddiff_tpu.train import Trainer
    from founddiff_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    init_distributed()

    vol = np.load(args.volume).astype(np.float32)
    if vol.ndim == 3:
        vol = vol[..., None]
    assert vol.ndim == 4 and vol.shape[-1] == 1, vol.shape

    cfg = Config()
    cfg.diffusion.image_size = vol.shape[1]
    cfg.diffusion.sampling_timesteps = args.steps
    diffusion, model, params = build(cfg)
    trainer = Trainer(diffusion, params, cfg, model=model)
    if args.torch:
        trainer.load_torch(args.checkpoint)
    else:
        import orbax.checkpoint as ocp

        trainer.state = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.checkpoint), item=trainer.state
        )
    ema_params = trainer.state.ema.params

    mesh = make_mesh(seq=args.seq)
    denoise = make_volume_denoiser(
        model, diffusion, mesh,
        batch_per_device=args.batch_per_device,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    if args.bf16:
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, t,
        )
        if "model" in ema_params:
            ema_params = dict(ema_params, model=cast(ema_params["model"]))

    t0 = time.perf_counter()
    out = denoise(ema_params, jax.random.PRNGKey(0), jnp.asarray(vol))
    out = np.asarray(out)
    dt = time.perf_counter() - t0
    np.save(args.output, out[..., 0])
    print(
        f"denoised {vol.shape[0]} slices @ {vol.shape[1]}^2 in {dt:.1f}s "
        f"({vol.shape[0] / dt:.3f} slices/s) over mesh "
        f"{dict(zip(mesh.axis_names, mesh.devices.shape))} -> {args.output}"
    )


if __name__ == "__main__":
    main()

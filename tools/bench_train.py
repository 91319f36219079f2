"""Training-step throughput benchmark (the reference's training regime:
512^2, bs 2, grad-accum x2, fp32; reference README.md:32, train.py:137-141).

Usage: python tools/bench_train.py [--size 512] [--batch 2] [--accum 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--accum", type=int, default=2)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--scan_impl", default="auto")
    p.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"],
                   help="bf16 = bf16 compute / fp32 master weights")
    p.add_argument("--tower", action="store_true",
                   help="include the frozen Dose-CLIP tower in the step")
    args = p.parse_args()

    from founddiff_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from founddiff_tpu.config import Config
    from founddiff_tpu.factory import build
    from founddiff_tpu.train import Trainer

    cfg = Config()
    cfg.model.use_dose_encoder = args.tower
    cfg.model.scan_impl = args.scan_impl
    cfg.diffusion.image_size = args.size
    cfg.train.train_batch_size = args.batch
    cfg.train.gradient_accumulate_every = args.accum
    cfg.train.mixed_precision = "bf16" if args.dtype == "bf16" else "no"
    cfg.train.checkpoint_folder = "/tmp/bench_train"
    diffusion, model, params = build(cfg)
    trainer = Trainer(diffusion, params, cfg, model=model)

    rng = np.random.RandomState(0)
    total = args.batch * args.accum
    gt = jnp.asarray(rng.rand(total, args.size, args.size, 1), jnp.float32)
    ld = jnp.clip(gt + 0.1, 0, 1)

    t0 = time.perf_counter()
    trainer.state, metrics = trainer._train_step(
        trainer.state, (gt, ld), trainer.rng
    )
    jax.block_until_ready(metrics["loss_unet0"])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    ts = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        trainer.state, metrics = trainer._train_step(
            trainer.state, (gt, ld), trainer.rng
        )
        _ = float(metrics["loss_unet0"])
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(
        f"train step {args.size}^2 bs{args.batch}x{args.accum}: "
        f"{dt*1e3:.1f} ms/step ({total/dt:.3f} samples/sec) "
        f"loss={float(metrics['loss_unet0']):.5f}"
    )


if __name__ == "__main__":
    main()

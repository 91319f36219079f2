"""On-device numerics gate: fused Pallas serving path vs chunked XLA path.

CLAUDE.md's trap list is explicit that Mosaic layout constraints (dynamic
lane slicing, block-shape divisibility) surface ONLY on the real TPU — the
CPU suite (interpret-mode Pallas + reference impls) cannot catch them.  This
gate runs the SAME weights + the SAME DDIM sample through

  1. the serving path  (scan_impl='pallas_fused': fused scan/epilogue/block
     kernels, the path bench.py measures), and
  2. the XLA reference (scan_impl='chunked': einsum projections + chunked
     associative scan, no Pallas scan/epilogue kernels),

computes PSNR between the two outputs, and FAILS (exit 1) below --threshold.
Run it before every BENCH after kernel surgery; record the delta in
PROGRESS.md.

Defaults match VERDICT r3 #2: DDIM-2, 512x512, bs1, bf16 trunk.  Both
programs land in the persistent compile cache, so reruns are cheap.

Prints one JSON line:
  {"psnr_fused_vs_chunked": N, "threshold": N, "ok": bool, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    # measured 2026-08-19 (r4, 512^2 DDIM-2 bs1 bf16): see PROGRESS.md.
    # bf16 trunk noise between two *valid* implementations sits way above
    # this; a Mosaic layout bug (wrong slice/garbage lanes) craters it.
    ap.add_argument("--threshold", type=float, default=40.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from founddiff_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from founddiff_tpu.config import Config
    from founddiff_tpu.factory import build
    from founddiff_tpu.pipeline import make_hoisted_sampler

    cfg = Config()
    cfg.diffusion.image_size = args.size
    cfg.diffusion.sampling_timesteps = args.steps
    diffusion, model, params = build(cfg)

    compute_dtype = None
    if args.dtype == "bf16":
        cast = lambda t: jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            t,
        )
        if "model" in params:
            params = dict(params, model=cast(params["model"]))
        else:
            params = cast(params)
        compute_dtype = jnp.bfloat16

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.RandomState(0).rand(args.batch, args.size, args.size, 1),
        jnp.float32,
    )

    outs = {}
    for impl in ("pallas_fused", "chunked"):
        m = model.clone(scan_impl=impl)
        sampler = jax.jit(
            make_hoisted_sampler(
                m, diffusion, use_test_schedule=True,
                compute_dtype=compute_dtype,
            )
        )
        out = sampler(params, rng, x)  # same rng -> same injected noise
        jax.block_until_ready(out)
        outs[impl] = np.asarray(out, np.float32)

    a, b = outs["pallas_fused"], outs["chunked"]
    finite = bool(np.isfinite(a).all() and np.isfinite(b).all())
    mse = float(np.mean((a - b) ** 2))
    # outputs live on the [0,1] HU window (sampler unnormalizes), peak 1.0
    psnr = float(10.0 * np.log10(1.0 / mse)) if mse > 0 else float("inf")
    ok = finite and psnr >= args.threshold
    print(
        json.dumps(
            {
                "psnr_fused_vs_chunked": round(psnr, 2),
                "threshold": args.threshold,
                "finite": finite,
                "max_abs_diff": round(float(np.max(np.abs(a - b))), 6),
                "config": f"ddim{args.steps}_{args.size}x{args.size}_bs"
                          f"{args.batch}_{args.dtype}",
                "ok": ok,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

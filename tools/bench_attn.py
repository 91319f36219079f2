"""Micro-benchmark the fused attention-half kernel vs the XLA composition.

Times ops.attn_block at each distinct (image, C) the flagship model runs
(the LN-mod kernel + TransposedAttention chain cost ~35 ms of the 207 ms
r4-profile UNet forward).  Same timing discipline as bench_block.py.

Usage: python tools/bench_attn.py [--batch 8] [--reps 12] [--xla] [--check]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# (name, H, C); W = H; count of blocks in one UNet fwd
SHAPES = [
    ("s0_512_c64", 512, 64, 2),     # down_0, up_3
    ("s1_256_c64", 256, 64, 1),     # down_1
    ("s1u_256_c128", 256, 128, 1),  # up_2
    ("s2_128_c128", 128, 128, 1),   # down_2
    ("s2u_128_c256", 128, 256, 1),  # up_1
    ("s3_64_c256", 64, 256, 1),     # down_3
    ("s3w_64_c512", 64, 512, 2),    # mid, up_0
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--shapes", default=None)
    ap.add_argument("--xla", action="store_true",
                    help="time the XLA composition instead")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--loop", action="store_true",
                    help="device-side chained-scan timing (two lengths, "
                         "differenced) — resolves sub-tunnel-offset deltas")
    args = ap.parse_args()

    from founddiff_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from founddiff_tpu.ops.attn_block import (
        attn_block,
        attn_block_ok,
        attn_block_xla,
    )

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    want = args.shapes.split(",") if args.shapes else None
    total = 0.0
    for name, H, C, count in SHAPES:
        if want and not any(name.startswith(w) for w in want):
            continue
        if not attn_block_ok(H, H, C):
            print(f"{name}: attn_block_ok=False, skipped")
            continue
        rs = np.random.RandomState(0)
        heads = max(1, C // 32)
        f = lambda *s: jnp.asarray(rs.randn(*s) * 0.2, jnp.float32)
        kw = dict(
            x=jnp.asarray(rs.randn(args.batch, H, H, C) * 0.5, dtype),
            mod_scale=f(args.batch, C), mod_shift=f(args.batch, C),
            gate=f(args.batch, C), qkv_w=f(C, 3 * C),
            dw_w=f(3, 3, 1, 3 * C),
            temperature=jnp.abs(f(heads, 1, 1)) + 0.5,
            proj_w=f(1, 1, C, C),
        )
        base = attn_block_xla if args.xla else attn_block
        fn = jax.jit(functools.partial(base, heads=heads, eps=1e-6))
        out = fn(**kw)
        jax.block_until_ready(out)
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32)))), name

        if args.loop:
            # chain the op through lax.scan (output feeds the next input, so
            # nothing CSEs) at two lengths; the difference cancels the ~26 ms
            # tunnel offset and any fixed dispatch cost
            rest = {k: v for k, v in kw.items() if k != "x"}

            def loops(k):
                g = jax.jit(functools.partial(
                    lambda x0, n: jax.lax.scan(
                        lambda c, _: (base(c, **rest, heads=heads,
                                           eps=1e-6), None),
                        x0, None, length=n,
                    )[0], n=k,
                ))
                jax.block_until_ready(g(kw["x"]))  # compile+warm
                ts = []
                for _ in range(max(3, args.reps // 3)):
                    t0 = time.perf_counter()
                    jax.block_until_ready(g(kw["x"]))
                    ts.append(time.perf_counter() - t0)
                return float(np.median(ts))

            k1, k2 = 4, 12
            ms = (loops(k2) - loops(k1)) / (k2 - k1) * 1e3
        else:
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(**kw))
                ts.append(time.perf_counter() - t0)
            ms = float(np.median(ts)) * 1e3
        total += ms * count
        line = f"{name:18s} {ms:8.2f} ms  (x{count} in fwd)"
        if args.check and not args.xla:
            ref = attn_block_xla(**kw, heads=heads, eps=1e-6)
            d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                      - ref.astype(jnp.float32))))
            line += f"  max|diff vs xla|={d:.4f}"
        print(line, flush=True)
    print(f"weighted total: {total:.1f} ms (+~26 ms/call tunnel offset each)")


if __name__ == "__main__":
    main()

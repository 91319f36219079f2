"""Micro-benchmark the fused SS2D block kernels at the real UNet shapes.

The 9 MambaBlocks cost 88 of the 207 ms UNet forward (r4 profile); this
driver times ``ss2d_image_block`` at each distinct (image, d_inner, d_state)
the flagship model runs, so kernel variants can be measured in minutes
(full-model compiles take 15-65 min through the axon tunnel).

Timing follows CLAUDE.md: one jit per shape, warm up, then median of
blocking calls minus nothing (the +26 ms tunnel offset is shared by all
variants; deltas are what matter).

Usage: python tools/bench_block.py [--batch 8] [--reps 12] [--shapes s0,s1,...]
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

# (name, H, D=d_inner, N=d_state, C0=hidden); W = H; count in one UNet fwd
SHAPES = [
    ("s0_512_d128_n4", 512, 128, 4, 64, 2),    # down_0, up_3
    ("s1_256_d128_n8", 256, 128, 8, 64, 2),    # down_1, up_2
    ("s2_128_d256_n16", 128, 256, 16, 128, 1),  # down_2
    ("s2u_128_d512_n16", 128, 512, 16, 256, 1),  # up_1
    ("s3_64_d512_n32", 64, 512, 32, 256, 1),   # down_3
    ("s3w_64_d1024_n32", 64, 1024, 32, 512, 3),  # mid, up_0 (+dup)
]


def make_args(H, D, N, C0, batch, dtype):
    rs = np.random.RandomState(0)
    W = H
    R = max(1, -(-(C0) // 16))
    f = lambda *s: jnp.asarray(rs.randn(*s) * 0.1, jnp.float32)
    return dict(
        x1=jnp.asarray(rs.randn(batch, H, W, C0) * 0.3, dtype),
        xs_conv=jnp.asarray(rs.randn(batch, H, W, D) * 0.3, dtype),
        x_raw=jnp.asarray(rs.randn(batch, H, W, C0) * 0.3, dtype),
        w_z=f(C0, D),
        x_proj_weight=f(4, R + 2 * N, D),
        dt_projs_weight=f(4, D, R),
        A=-jnp.abs(f(4, D, N)) - 0.5,
        Dskip=f(4, D),
        delta_bias=f(4, D),
        ln_g=jnp.ones((D,), jnp.float32),
        ln_b=jnp.zeros((D,), jnp.float32),
        local=f(batch, D),
        proj_w=f(D, C0),
        gate=f(batch, C0),
    ), R


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--shapes", default=None,
                    help="comma-separated prefixes to run (default: all)")
    ap.add_argument("--check", action="store_true",
                    help="also compare vs the XLA composition (max|diff|)")
    ap.add_argument("--loop", action="store_true",
                    help="device-side chained-scan timing (two lengths, "
                         "differenced) — resolves sub-tunnel-offset deltas")
    ap.add_argument("--op", default="image",
                    choices=["image", "mamba"],
                    help="'image' = ss2d_image_block (scan+epilogue); "
                         "'mamba' = ss2d_mamba_block (unified: + LN-mod, "
                         "in_proj, dwconv, silu in-kernel)")
    args = ap.parse_args()

    from founddiff_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from founddiff_tpu.ops.ss2d_block import (
        _xla_compose,
        block_scan_ok,
        ss2d_image_block,
    )

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    want = args.shapes.split(",") if args.shapes else None
    total = 0.0
    for name, H, D, N, C0, count in SHAPES:
        if want and not any(name.startswith(w) for w in want):
            continue
        if not block_scan_ok(H, H, D, N):
            print(f"{name}: block_scan_ok=False, skipped")
            continue
        if args.op == "mamba":
            _bench_mamba(name, H, D, N, C0, count, args, dtype)
            continue
        kw, R = make_args(H, D, N, C0, args.batch, dtype)

        fn = jax.jit(functools.partial(
            ss2d_image_block, dt_rank=R, d_state=N, delta_softplus=True,
            eps=1e-5,
        ))
        out = fn(**kw)
        jax.block_until_ready(out)
        assert bool(jnp.all(jnp.isfinite(out))), name

        if args.loop:
            # chain through lax.scan so every iteration's inputs depend on
            # the carry (x1/x_raw directly; xs_conv via the D=2*C0 tiling),
            # then difference two lengths to cancel the tunnel offset
            rest = {k: v for k, v in kw.items()
                    if k not in ("x1", "xs_conv", "x_raw")}
            part = functools.partial(
                ss2d_image_block, dt_rank=R, d_state=N, delta_softplus=True,
                eps=1e-5, **rest,
            )

            def step(c, _):
                xs = jnp.concatenate([c, c], axis=-1)[..., :D]
                return part(x1=c, xs_conv=xs, x_raw=c), None

            def loops(k):
                g = jax.jit(functools.partial(
                    lambda x0, n: jax.lax.scan(step, x0, None, length=n)[0],
                    n=k,
                ))
                jax.block_until_ready(g(kw["x1"]))
                ts = []
                for _ in range(max(3, args.reps // 3)):
                    t0 = time.perf_counter()
                    jax.block_until_ready(g(kw["x1"]))
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
        line = f"{name:20s} {ms:8.2f} ms  (x{count} in fwd)"
        if args.check:
            from founddiff_tpu.ops.ss2d_block import _derive_weights

            w_delta, w_b, w_c = _derive_weights(
                kw["x_proj_weight"], kw["dt_projs_weight"], R, N
            )
            ref = _xla_compose(
                kw["x1"], kw["xs_conv"], kw["x_raw"],
                kw["w_z"].astype(dtype), w_delta.astype(dtype),
                w_b.astype(dtype), w_c.astype(dtype), kw["A"], kw["Dskip"],
                kw["delta_bias"], kw["ln_g"], kw["ln_b"], kw["local"],
                kw["proj_w"], kw["gate"], True, True, 1e-5,
            )
            d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                      - ref.astype(jnp.float32))))
            line += f"  max|diff vs xla|={d:.4f}"
        print(line, flush=True)
    print(f"weighted total (sum over fwd blocks): {total:.1f} ms "
          f"(+~26 ms/call tunnel offset included per call)")


def _bench_mamba(name, H, D, N, C0, count, args, dtype):
    """Time the unified kernel (raw x in, final block output out) and
    optionally check it against its own XLA remat composition."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from founddiff_tpu.ops.experimental_unified import (
        _mamba_xla_compose,
        mamba_block_ok,
        ss2d_mamba_block,
    )

    if not mamba_block_ok(H, H, D, N, C0):
        print(f"{name}: mamba_block_ok=False, skipped")
        return
    rs = np.random.RandomState(0)
    W = H
    B = args.batch
    R = max(1, -(-(C0) // 16))
    f = lambda *s: jnp.asarray(rs.randn(*s) * 0.1, jnp.float32)
    x = jnp.asarray(rs.randn(B, H, W, C0) * 0.3, dtype)
    kw = dict(
        ln_scale=jnp.ones((C0,), jnp.float32),
        ln_bias=jnp.zeros((C0,), jnp.float32),
        mod_scale=f(B, C0), mod_shift=f(B, C0),
        in_proj_w=f(C0, 2 * D),
        dw_kernel=f(3, 3, 1, D), dw_bias=f(D),
        x_proj_weight=f(4, R + 2 * N, D), dt_projs_weight=f(4, D, R),
        A=-jnp.abs(f(4, D, N)) - 0.5, Dskip=f(4, D), delta_bias=f(4, D),
        out_ln_g=jnp.ones((D,), jnp.float32),
        out_ln_b=jnp.zeros((D,), jnp.float32),
        local=f(B, D), proj_w=f(D, C0), gate=f(B, C0),
    )
    part = functools.partial(
        ss2d_mamba_block, d_inner=D, dt_rank=R, d_state=N,
        delta_softplus=True, eps_ln=1e-5, eps=1e-5, **kw,
    )
    fn = jax.jit(part)
    out = fn(x)
    jax.block_until_ready(out)
    assert bool(jnp.all(jnp.isfinite(out))), name

    if args.loop:
        def step(c, _):
            return part(c), None

        def loops(k):
            g = jax.jit(functools.partial(
                lambda x0, n: jax.lax.scan(step, x0, None, length=n)[0],
                n=k,
            ))
            jax.block_until_ready(g(x))
            ts = []
            for _ in range(max(3, args.reps // 3)):
                t0 = time.perf_counter()
                jax.block_until_ready(g(x))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        k1, k2 = 4, 12
        ms = (loops(k2) - loops(k1)) / (k2 - k1) * 1e3
    else:
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
    line = f"{name:20s} {ms:8.2f} ms  (x{count} in fwd, unified)"
    if args.check:
        from founddiff_tpu.ops.ss2d_block import _derive_weights

        w_delta, w_b, w_c = _derive_weights(
            kw["x_proj_weight"], kw["dt_projs_weight"], R, N
        )
        ms_ = kw["mod_scale"].astype(jnp.float32)
        geff = kw["ln_scale"][None] * (1.0 + ms_)
        beff = kw["ln_bias"][None] * (1.0 + ms_) + kw["mod_shift"]
        ref = _mamba_xla_compose(
            x, geff, beff, kw["in_proj_w"][:, :D].astype(dtype),
            kw["in_proj_w"][:, D:].astype(dtype),
            kw["dw_kernel"][:, :, 0, :].reshape(9, D).astype(dtype),
            kw["dw_bias"].reshape(1, D), w_delta.astype(dtype),
            w_b.astype(dtype), w_c.astype(dtype), kw["A"], kw["Dskip"],
            kw["delta_bias"], kw["out_ln_g"], kw["out_ln_b"], kw["local"],
            kw["proj_w"], kw["gate"], True, True, True, 1e-5, 1e-5,
        )
        d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                  - ref.astype(jnp.float32))))
        line += f"  max|diff vs xla|={d:.4f}"
    print(line, flush=True)


if __name__ == "__main__":
    main()

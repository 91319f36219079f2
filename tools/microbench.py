"""Micro-benchmarks of the hot ops on the real TPU.

Times the Pallas selective scan at each UNet scale, the SS2D block, the
attention block, and one full UNet forward, to locate the throughput
bottleneck.  Usage: python tools/microbench.py [scan|model|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, warmup=1, iters=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def timeit_device(fn, x, *args, n_lo=2, n_hi=12):
    """Tunnel-proof timing: compile device-side ``lax.scan`` loops of the op
    at two iteration counts and difference the *fetched* wall times
    (CLAUDE.md: block_until_ready without a fetch returns early through the
    axon tunnel; the fetch costs a constant ~26 ms that the difference
    cancels).  ``fn(x, *args)`` must return something reduceable; each
    iteration feeds a scalar function of the output back into ``x`` so XLA
    cannot elide or overlap iterations.
    """

    def loop(n):
        def step(carry, _):
            y = fn(carry, *args)
            m = jnp.mean(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32))
            return carry + (m * 1e-30).astype(carry.dtype), None

        return jax.jit(
            lambda x0: jnp.sum(
                jax.lax.scan(step, x0, None, length=n)[0].astype(jnp.float32)
            )
        )

    lo, hi = loop(n_lo), loop(n_hi)
    float(lo(x))  # compile + warm
    float(hi(x))
    t_lo = min(
        (lambda t0: (float(lo(x)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    t_hi = min(
        (lambda t0: (float(hi(x)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    return (t_hi - t_lo) / (n_hi - n_lo)


def bench_scan(B=1, impl="pallas"):
    from founddiff_tpu.ops.selective_scan import selective_scan

    # (L, D, N) per UNet scale at 512^2 after step-2 decimation
    scales = [
        (65536, 128, 4),
        (16384, 256, 8),
        (4096, 512, 16),
        (1024, 1024, 32),
    ]
    K = 4
    total = 0.0
    for L, D, N in scales:
        rng = np.random.RandomState(0)
        u = jnp.asarray(rng.randn(B, K, L, D), jnp.float32)
        dl = jnp.asarray(rng.randn(B, K, L, D) * 0.3, jnp.float32)
        A = -jnp.abs(jnp.asarray(rng.randn(K, D, N), jnp.float32))
        Bm = jnp.asarray(rng.randn(B, K, L, N), jnp.float32)
        Cm = jnp.asarray(rng.randn(B, K, L, N), jnp.float32)
        Dk = jnp.asarray(rng.randn(K, D), jnp.float32)
        bias = jnp.asarray(rng.randn(K, D) * 0.1, jnp.float32)

        fn = lambda u_, *a: selective_scan(
            u_, *a, delta_softplus=True, impl=impl
        )
        dt = timeit_device(fn, u, dl, A, Bm, Cm, Dk, bias)
        total += dt
        print(f"scan {impl} B={B} L={L:6d} D={D:5d} N={N:3d}: {dt*1e3:8.2f} ms")
    print(f"scan {impl} B={B} total per 9-block fwd ~ {total*9/4*1e3:.1f} ms")


def bench_ss2d(B=1, size=512, dim=64):
    from founddiff_tpu.models.ss2d import SS2D, MambaBlock

    m = MambaBlock(hidden_size=dim, d_state=4, time_emb_dim=256)
    x = jnp.zeros((B, size, size, dim))
    c = jnp.zeros((B, 1, 256))
    t = jnp.zeros((B, 256))
    params = m.init(jax.random.PRNGKey(0), x, c, t)
    dt = timeit_device(lambda x_: m.apply(params, x_, c, t), x)
    print(f"MambaBlock dim={dim} {size}^2 B={B}: {dt*1e3:.2f} ms")


def bench_unet(B=1, size=512):
    from founddiff_tpu.config import Config
    from founddiff_tpu.factory import build

    cfg = Config()
    cfg.model.use_dose_encoder = False
    cfg.diffusion.image_size = size
    diffusion, model, params = build(cfg)
    x = jnp.zeros((B, size, size, 2))
    t = [jnp.full((B,), 500.0), jnp.full((B,), 500.0)]
    if os.environ.get("MB_DTYPE", "") == "bf16":
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            params,
        )
        x = x.astype(jnp.bfloat16)
    dt = timeit_device(
        lambda x_: model.apply({"params": params}, x_, t)[0], x, n_lo=1, n_hi=4
    )
    print(f"UNet fwd {size}^2 B={B} (no tower): {dt*1e3:.2f} ms")


def bench_tower(B=1, size=512):
    from founddiff_tpu.models.clip import CLIPIQA

    m = CLIPIQA()
    x = jnp.zeros((B, size, size, 3))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    fn = jax.jit(lambda p, x: m.apply(p, x))
    dt = timeit(fn, params, x, iters=3)
    print(f"Dose-CLIP tower {size}^2 B={B}: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    B = int(os.environ.get("MB_BATCH", 1))
    if what in ("scan", "all"):
        bench_scan(B=B, impl="pallas")
    if what in ("model", "all"):
        bench_ss2d(B=B)
        bench_unet(B=B)
    if what in ("tower",):
        bench_tower(B=B)

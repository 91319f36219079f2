"""Capture + summarize a TPU trace of the benchmark UNet forward.

Usage:
  python tools/profile_unet.py capture [--batch 8] [--size 512] [--dtype bf16]
  python tools/profile_unet.py summarize /tmp/founddiff_profile

``capture`` jits one UNet forward (flagship bench config, no tower), traces a
few iterations, and writes the trace under --out.  ``summarize`` parses the
latest ``*.trace.json.gz`` and prints per-op-category device time so kernel
work can be ranked by profiled cost (CLAUDE.md: pid 3 = TPU device thread).
"""

from __future__ import annotations

import argparse
import collections
import functools
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def capture(out: str, batch: int, size: int, dtype: str, what: str,
            scan_impl: str = "auto") -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from founddiff_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    if what == "scan":
        _capture_scan(out, batch)
        return

    from founddiff_tpu.config import Config
    from founddiff_tpu.factory import build

    cfg = Config()
    cfg.model.use_dose_encoder = False
    cfg.model.scan_impl = scan_impl
    cfg.diffusion.image_size = size
    diffusion, model, params = build(cfg)
    if dtype == "bf16":
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            params,
        )
        xdt = jnp.bfloat16
    else:
        xdt = jnp.float32
    x = jnp.asarray(np.random.RandomState(0).rand(batch, size, size, 2), xdt)
    t = [jnp.full((batch,), 500.0, jnp.float32)] * 2
    fn = jax.jit(lambda p, x: model.apply({"params": p}, x, t)[0])
    out_arr = fn(params, x)
    jax.block_until_ready(out_arr)

    jax.profiler.start_trace(out)
    for _ in range(3):
        out_arr = fn(params, x)
    jax.block_until_ready(out_arr)
    jax.profiler.stop_trace()
    print(f"trace written under {out}")


def _capture_scan(out: str, batch: int) -> None:
    """Profile only the fused scan kernel at the four UNet scales (fast
    compile — the iteration loop for kernel work)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from founddiff_tpu.ops.scan_pallas import selective_scan_pallas_fused

    scales = [(65536, 128, 4, 8), (16384, 256, 8, 16),
              (4096, 512, 16, 32), (1024, 1024, 32, 64)]
    fns = []
    for L, D, N, R in scales:
        rs = np.random.RandomState(0)
        xs = jnp.asarray(rs.randn(batch, 4, L, D), jnp.bfloat16) * 0.3
        xw = jnp.asarray(rs.randn(4, R + 2 * N, D), jnp.float32) * 0.1
        dtw = jnp.asarray(rs.randn(4, D, R), jnp.float32) * 0.1
        A = -jnp.abs(jnp.asarray(rs.randn(4, D, N), jnp.float32))
        Ds = jnp.asarray(rs.randn(4, D), jnp.float32)
        bias = jnp.asarray(rs.randn(4, D) * 0.1, jnp.float32)
        f = jax.jit(functools.partial(
            selective_scan_pallas_fused, dt_rank=R, d_state=N))
        y = f(xs, xw, dtw, A, Ds, bias)
        jax.block_until_ready(y)
        fns.append((f, (xs, xw, dtw, A, Ds, bias)))
    jax.profiler.start_trace(out)
    for _ in range(3):
        outs = [f(*a) for f, a in fns]
    jax.block_until_ready(outs)
    jax.profiler.stop_trace()
    print(f"scan trace written under {out}")


CATEGORIES = [
    ("ss2d_block_kernel", re.compile(r"^mamba")),
    ("attn_half_kernel", re.compile(r"^attn_blk")),
    ("flash_attn", re.compile(r"flash|attention_pallas")),
    # anchored: LN-mod kernels are named 'attn.<digit>...'/'ln_mod...' at
    # scope start; unanchored it would also swallow flash-attn fusion
    # scopes containing 'attn.<digit>' (ADVICE r4)
    ("ln_mod_kernel", re.compile(r"^attn\.\d|ln_mod")),
    ("scan_kernel", re.compile(r"selective_scan|custom-call|tpu_custom_call")),
    ("layernorm_kernel", re.compile(r"layernorm|norm_pallas")),
    ("conv", re.compile(r"%?convolution|conv_general")),
    ("matmul", re.compile(r"%?dot|einsum")),
    ("copy", re.compile(r"%?copy")),
    ("fusion", re.compile(r"%?(loop_)?fusion")),
    ("reduce", re.compile(r"%?reduce")),
    ("reshape/transpose", re.compile(r"%?(reshape|transpose|bitcast)")),
    ("convert", re.compile(r"%?convert")),
    ("dynamic-slice/update", re.compile(r"dynamic.(update.)?slice")),
]


def summarize(trace_dir: str, top: int = 30) -> None:
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device threads: pick pids whose process name mentions TPU / device
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        pid
        for pid, name in proc_names.items()
        if "TPU" in name or "/device" in name.lower() or "Device" in name
    }
    if not device_pids:  # fall back: everything except obvious host pids
        device_pids = {
            pid for pid, name in proc_names.items() if "python" not in name.lower()
        }
    # thread names: keep only the per-op device thread ("XLA Ops"); the
    # "XLA Modules" thread carries one whole-program span per iteration and
    # double-counts everything if summed alongside
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    op_tids = {
        k for k, name in thread_names.items()
        if k[0] in device_pids and "Ops" in name
    }
    module_tids = {
        k for k, name in thread_names.items()
        if k[0] in device_pids and "Modules" in name
    }
    op_time = collections.Counter()
    module_spans = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if key in module_tids:
            # count executions PER module name: warm-up/compile spans or a
            # second traced module would otherwise inflate the divisor and
            # silently deflate ms/iter (ADVICE r4); the profiled program is
            # the module that executed most often
            module_spans[e.get("name", "")] += 1
            continue
        if op_tids:
            if key not in op_tids:
                continue
        elif e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0)  # microseconds
        op_time[name] += dur
    total = sum(op_time.values())
    cat_time = collections.Counter()
    for name, dur in op_time.items():
        for cat, pat in CATEGORIES:
            if pat.search(name):
                cat_time[cat] += dur
                break
        else:
            cat_time["other"] += dur
    iters = module_spans.most_common(1)[0][1] if module_spans else 3
    print(f"device total: {total/1e3/iters:.2f} ms/iter  ({paths[-1]})")
    print("\nby category (ms/iter):")
    for cat, dur in cat_time.most_common():
        print(f"  {cat:22s} {dur/1e3/iters:8.2f}  ({100*dur/total:5.1f}%)")
    print(f"\ntop {top} ops (ms/iter):")
    for name, dur in op_time.most_common(top):
        print(f"  {dur/1e3/iters:8.2f}  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["capture", "summarize"])
    ap.add_argument("path", nargs="?", default="/tmp/founddiff_profile")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--what", default="unet")
    ap.add_argument("--scan_impl", default="auto",
                    help="model scan_impl for capture (e.g. 'pallas' = the "
                         "unfused path seq-sharded serving runs)")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    if args.mode == "capture":
        capture(args.path, args.batch, args.size, args.dtype, args.what,
                args.scan_impl)
    else:
        summarize(args.path, args.top)

"""Analytic roofline bound for the CUDA reference (BASELINE.md evidence).

No GPU exists in this environment, so the reference cannot be measured.
This tool derives, from the reference architecture alone (shapes read off
src/DADiff.py:530-836 / src/emamba2.py:404-751), hard per-step FLOP and
HBM-traffic counts, and converts them into an UPPER bound on the reference's
DDIM-50 512^2 throughput on an A100-80GB — i.e. the most conservative
possible baseline for the speedup claim:

    t_step >= max(FLOPs / peak_flops, bytes / peak_bw)
    ref_slices_per_sec <= 1 / (50 * t_step)

The bound deliberately ignores every real overhead the reference pays
(kernel launches, the serial selective-scan recurrence, Python dispatch,
fp32 everywhere, CLIP recompute synchronization), so the true reference
throughput is strictly below it.

Usage: python tools/ref_roofline.py [--size 512] [--steps 50]
"""

from __future__ import annotations

import argparse
import json


def conv2d_cost(n, cin, cout, k=3, groups=1):
    flops = 2 * n * cin * cout * k * k // groups
    bytes_ = 4 * n * (cin + cout)  # fp32 activations in+out (weights small)
    return flops, bytes_


def dense_cost(n, cin, cout):
    return 2 * n * cin * cout, 4 * n * (cin + cout)


def elementwise(n, c, passes=1):
    return passes * n * c, passes * 8 * n * c


def ss2d_cost(n, d, d_state):
    """Reference SS2D forward (src/emamba2.py:718-751 + cross_selective_scan
    :295-367): in_proj, dwconv, decimated 4-dir scan chain, merge, LN, gate,
    out_proj."""
    di = 2 * d
    R = -(-d // 16)
    N = d_state
    L = n // 4  # step-2 decimation, 4 directions of L each => n total
    F = B_ = 0

    def add(f, b):
        nonlocal F, B_
        F += f
        B_ += b

    add(*dense_cost(n, d, 2 * di))             # in_proj
    add(*elementwise(n, di))                   # silu(z)
    add(*conv2d_cost(n, di, di, 3, groups=di))  # dwconv
    add(*elementwise(n, di))                   # silu
    add(0, 8 * n * di)                         # EfficientScan copy
    add(*dense_cost(n, di, R + 2 * N))         # x_dbl einsum
    add(*dense_cost(n, R, di))                 # dt proj
    # selective_scan_cuda: 9 flops per (l, d, n) element
    # (reference flops_selective_scan_fn src/emamba2.py:38-110)
    add(9 * n * di * N, 4 * n * (3 * di + 2 * N) + 4 * n * di)
    add(0, 8 * n * di)                         # EfficientMerge copy
    add(*elementwise(n, di, passes=2))         # out_norm LN
    add(*elementwise(n, di))                   # y * z
    add(*dense_cost(n, di, d))                 # out_proj
    return F, B_


def attn_cost(n, d):
    heads = max(1, d // 32)
    ch = d // heads
    F = B_ = 0

    def add(f, b):
        nonlocal F, B_
        F += f
        B_ += b

    add(*dense_cost(n, d, 3 * d))              # qkv 1x1
    add(*conv2d_cost(n, 3 * d, 3 * d, 3, groups=3 * d))  # qkv dwconv
    add(2 * 2 * n * d * ch, 8 * n * d)         # gram + attn@v (channel attn)
    add(*dense_cost(n, d, d))                  # project_out
    return F, B_


def resnet_cost(n, cin, cout):
    f, b = conv2d_cost(n, cin, cout, 3)
    f2, b2 = elementwise(n, cout, passes=2)    # GN + silu
    f3, b3 = (conv2d_cost(n, cin, cout, 1) if cin != cout else (0, 0))
    return f + f2 + f3, b + b2 + b3


def unet_cost(size, dim=64, mults=(1, 2, 4, 8), d_states=(4, 8, 16, 32)):
    """Exact level schedule of the reference Unet (src/DADiff.py:561-685):
    dims [64,64,128,256,512]; downsample halves the grid except the last
    level (stride-1 3x3); decoder mirrors with skip-concat resnets."""
    F = B_ = 0

    def add(fb):
        nonlocal F, B_
        F += fb[0]
        B_ += fb[1]

    n0 = size * size
    add(conv2d_cost(n0, 2, dim, 7))
    dims = [dim] + [dim * m for m in mults]
    in_out = list(zip(dims[:-1], dims[1:]))
    num = len(in_out)
    # encoder: level i runs at grid size size/2^i
    for i, (cin, cout) in enumerate(in_out):
        n = (size // 2**i) ** 2
        add(ss2d_cost(n, cin, d_states[i]))
        add(attn_cost(n, cin))
        add(resnet_cost(n, cin, cin))
        if i < num - 1:  # 4x4 stride-2 downsample
            add(conv2d_cost(n // 4, cin, cout, 4))
        else:  # last level: stride-1 3x3
            add(conv2d_cost(n, cin, cout, 3))
    nm = (size // 2 ** (num - 1)) ** 2
    add(resnet_cost(nm, dims[-1], dims[-1]))
    add(ss2d_cost(nm, dims[-1], d_states[-1]))
    add(attn_cost(nm, dims[-1]))
    # decoder: iter i runs at level num-1-i
    for i, (cin, cout) in enumerate(reversed(in_out)):
        level = num - 1 - i
        n = (size // 2**level) ** 2
        add(resnet_cost(n, cout + cin, cout))
        add(ss2d_cost(n, cout, d_states[level]))
        add(attn_cost(n, cout))
        if i < num - 1:  # nearest-2x upsample + 3x3 conv at the larger grid
            add(conv2d_cost(4 * n, cout, cin, 3))
        else:
            add(conv2d_cost(n, cout, cin, 3))
    add(resnet_cost(n0, 2 * dim, dim))
    add(conv2d_cost(n0, dim, 1, 1))
    return F, B_


def clip_rn50_cost(size):
    # stock RN50 is ~4.1 GFLOP at 224^2; visual tower scales with area.
    f = 4.1e9 * (size / 224) ** 2
    # ~50 conv/bn/relu stages; activation traffic ~ 2 bytes moved per flop/8
    b = f / 8
    # text transformer on 2x77 tokens: negligible
    return int(f), int(b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--peak_tf32_tflops", type=float, default=156.0)
    ap.add_argument("--peak_fp32_tflops", type=float, default=19.5)
    ap.add_argument("--peak_bw_tbs", type=float, default=2.0)
    args = ap.parse_args()

    fu, bu = unet_cost(args.size)
    fc, bc = clip_rn50_cost(args.size)
    f_step, b_step = fu + fc, bu + bc
    t_flops_tf32 = f_step / (args.peak_tf32_tflops * 1e12)
    t_flops_fp32 = f_step / (args.peak_fp32_tflops * 1e12)
    t_bw = b_step / (args.peak_bw_tbs * 1e12)

    def bound(t_step):
        return 1.0 / (args.steps * t_step)

    out = {
        "unet_gflops_per_step": round(fu / 1e9, 1),
        "clip_gflops_per_step": round(fc / 1e9, 1),
        "unet_gbytes_per_step": round(bu / 1e9, 2),
        "t_step_lb_ms_tf32": round(1e3 * max(t_flops_tf32, t_bw), 3),
        "t_step_lb_ms_fp32": round(1e3 * max(t_flops_fp32, t_bw), 3),
        "ref_upper_bound_slices_per_sec_tf32": round(
            bound(max(t_flops_tf32, t_bw)), 3
        ),
        "ref_upper_bound_slices_per_sec_fp32_cuda_cores": round(
            bound(max(t_flops_fp32, t_bw)), 3
        ),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

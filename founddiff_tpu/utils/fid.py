"""FID / Inception-Score utilities.

The reference trainer shells out to ``fid_and_inception_score.py`` every 10k
steps (src/DADiff.py:1746-1747) — a script that is absent from the repo.
This module provides the real capability:

- :func:`frechet_distance` — the Frechet distance between two gaussians,
  via a host float64 eigendecomposition robust to the rank-deficient
  covariances of small eval batches (scipy.linalg.sqrtm verifies it in
  tests; feature extraction stays on device).
- :func:`fid_from_features` / :func:`compute_fid` — end-to-end FID given a
  feature extractor.  The default extractor is the framework's own frozen
  CLIP RN50 visual tower (the canonical InceptionV3 weights cannot be
  downloaded in an air-gapped TPU pod; any ``extract_fn`` with pretrained
  weights can be passed instead, and the statistics machinery is identical).
- :func:`inception_score` — IS from class-probability vectors.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _trace_sqrtm_psd_product(s1: np.ndarray, s2: np.ndarray) -> float:
    """tr(sqrtm(s1 @ s2)) for PSD s1, s2 via the symmetric-product trick:
    s1 s2 is similar to sqrt(s1) s2 sqrt(s1) (PSD), whose eigenvalues are
    real and >= 0, so the trace is the sum of their square roots.  Unlike a
    Newton-Schulz iteration this cannot diverge on the rank-deficient
    covariances of small evaluation batches (N << D): negative eigenvalue
    noise is clamped to zero, matching scipy.sqrtm(...).real conventions."""
    w1, v1 = np.linalg.eigh(s1)
    sq1 = (v1 * np.sqrt(np.clip(w1, 0.0, None))) @ v1.T
    m = sq1 @ s2 @ sq1
    w = np.linalg.eigvalsh((m + m.T) / 2.0)
    return float(np.sum(np.sqrt(np.clip(w, 0.0, None))))


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between N(mu1, sigma1) and N(mu2, sigma2).

    Host float64 eigendecomposition (the matrices are [D, D] with D the
    feature dim — tiny next to the extractor work, which stays on device),
    the same math as the reference pipeline's pytorch-fid/scipy.sqrtm path
    (fid_and_inception_score.py)."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2
    offset = eps * np.eye(sigma1.shape[0])
    tr_covmean = _trace_sqrtm_psd_product(sigma1 + offset, sigma2 + offset)
    return float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_covmean
    )


def feature_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of an [N, D] feature matrix."""
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def fid_from_features(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    mu1, s1 = feature_statistics(feats_a)
    mu2, s2 = feature_statistics(feats_b)
    return float(frechet_distance(mu1, s1, mu2, s2))


def make_clip_extractor(params, clipiqa_module, batch_size: int = 8) -> Callable:
    """Feature extractor from the frozen Dose-CLIP visual tower: [N,H,W,1]
    CT slices in [0,1] -> [N, embed_dim] image features."""

    res = int(getattr(clipiqa_module, "backbone_resolution", 224))

    @jax.jit
    def embed(p, x):
        # the RN50 tower reduces 32x spatially; resize to the tower's
        # native resolution so every input (including micro eval batches
        # smaller than the reduction factor) sees the same protocol — the
        # reference's FID script likewise resizes for its extractor
        if x.shape[1] != res or x.shape[2] != res:
            x = jax.image.resize(
                x, (x.shape[0], res, res, x.shape[-1]), method="bilinear"
            )
        rgb = jnp.repeat(x * 2.0 - 1.0, 3, axis=-1)
        return clipiqa_module.apply(
            {"params": p},
            rgb,
            method=lambda m, v: m.clip_model.encode_image(v),
        )

    def extract(images: np.ndarray) -> np.ndarray:
        outs = []
        for i in range(0, len(images), batch_size):
            outs.append(np.asarray(embed(params, jnp.asarray(images[i : i + batch_size]))))
        return np.concatenate(outs, axis=0)

    return extract


def compute_fid(images_a, images_b, extract_fn: Callable) -> float:
    """FID between two image sets given a feature extractor."""
    return fid_from_features(extract_fn(np.asarray(images_a)),
                             extract_fn(np.asarray(images_b)))


def inception_score(probs: np.ndarray, splits: int = 10) -> Tuple[float, float]:
    """IS from [N, C] class probabilities: exp(E_x KL(p(y|x) || p(y)))."""
    probs = np.asarray(probs, np.float64)
    n = probs.shape[0]
    scores = []
    for i in range(splits):
        part = probs[i * n // splits : (i + 1) * n // splits]
        if len(part) == 0:
            continue
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))

"""FID / Inception-Score utilities.

The reference trainer shells out to ``fid_and_inception_score.py`` every 10k
steps (src/DADiff.py:1746-1747) — a script that is absent from the repo.
This module provides the real capability:

- :func:`frechet_distance` — the Frechet distance between two gaussians,
  with a JAX Newton-Schulz matrix square root (no scipy dependency on
  device; scipy.linalg.sqrtm is used for verification in tests).
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


def _sqrtm_newton_schulz(a: jnp.ndarray, num_iters: int = 50) -> jnp.ndarray:
    """Matrix square root of a PSD matrix via Newton-Schulz iteration."""
    dim = a.shape[0]
    norm = jnp.sqrt(jnp.sum(a * a))
    y = a / norm
    z = jnp.eye(dim, dtype=a.dtype)
    eye3 = 3.0 * jnp.eye(dim, dtype=a.dtype)

    def body(_, carry):
        y, z = carry
        t = 0.5 * (eye3 - z @ y)
        return y @ t, t @ z

    y, _ = jax.lax.fori_loop(0, num_iters, body, (y, z))
    return y * jnp.sqrt(norm)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> jnp.ndarray:
    """FID between N(mu1, sigma1) and N(mu2, sigma2)."""
    # fp32: jax defaults to 32-bit; the Newton-Schulz iteration is stable in
    # fp32 for the feature dims used here (scipy-verified in tests)
    mu1, mu2 = jnp.asarray(mu1, jnp.float32), jnp.asarray(mu2, jnp.float32)
    sigma1 = jnp.asarray(sigma1, jnp.float32)
    sigma2 = jnp.asarray(sigma2, jnp.float32)
    diff = mu1 - mu2
    offset = eps * jnp.eye(sigma1.shape[0], dtype=sigma1.dtype)
    covmean = _sqrtm_newton_schulz((sigma1 + offset) @ (sigma2 + offset))
    return (
        diff @ diff
        + jnp.trace(sigma1)
        + jnp.trace(sigma2)
        - 2.0 * jnp.trace(covmean)
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

    @jax.jit
    def embed(p, x):
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

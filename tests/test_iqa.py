"""IQA utility tests (reference src/DACLIP.py:680-854 equivalents)."""

import numpy as np
import jax.numpy as jnp

from founddiff_tpu.utils.iqa import (
    OPENAI_CLIP_MEAN,
    clip_preprocess,
    dist_to_mos,
    random_crop,
)


def test_dist_to_mos_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    d = rng.rand(4, 5).astype(np.float32)
    d = d / d.sum(-1, keepdims=True)
    want = (
        (torch.tensor(d) * torch.arange(1, 6).float())
        .sum(dim=-1, keepdim=True)
        .numpy()
    )
    got = np.asarray(dist_to_mos(jnp.asarray(d)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_random_crop_shapes_and_lockstep():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    b = a + 1.0
    ca, cb = random_crop([a, b], crop_size=8, crop_num=3,
                         rng=np.random.RandomState(7))
    assert ca.shape == (6, 8, 8, 3) and cb.shape == (6, 8, 8, 3)
    # identical crop windows across the list
    np.testing.assert_allclose(np.asarray(cb) - np.asarray(ca), 1.0,
                               rtol=1e-6)

    # undersized input gets upscaled first
    small = jnp.asarray(rng.rand(1, 6, 6, 1).astype(np.float32))
    cs = random_crop(small, crop_size=8, crop_num=2,
                     rng=np.random.RandomState(0))
    assert cs.shape == (2, 8, 8, 1)


def test_clip_preprocess_shape_and_normalization():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 64, 48, 3).astype(np.float32))
    out = clip_preprocess(x, input_resolution=32)
    assert out.shape == (2, 32, 32, 3)
    # a constant-0.5 image maps exactly to (floor(127.5)/255 - mean)/std
    const = jnp.full((1, 40, 40, 3), 0.5)
    out_c = np.asarray(clip_preprocess(const, input_resolution=32))
    want = (np.floor(np.asarray([0.5] * 3) * 255) / 255 - np.asarray(
        OPENAI_CLIP_MEAN)) / np.asarray(
        [0.26862954, 0.26130258, 0.27577711])
    np.testing.assert_allclose(out_c[0, 0, 0], want, rtol=1e-5, atol=1e-5)

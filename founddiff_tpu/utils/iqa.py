"""IQA inference utilities (reference src/DACLIP.py:680-854).

JAX equivalents of the CLIP-IQA helper functions the reference carries for
generic image-quality scoring:

- :func:`dist_to_mos` — class-distribution -> mean-opinion-score
  (reference ``dist_to_mos`` src/DACLIP.py:715-729).
- :func:`random_crop` — batched multi-crop augmentation for IQA scoring
  (reference ``random_crop`` src/DACLIP.py:732-761).
- :func:`clip_preprocess` — tensor-input CLIP preprocessing: bicubic resize
  to the tower resolution, center crop, OpenAI mean/std normalization
  (reference ``clip_preprocess_tensor`` src/DACLIP.py:764-780).

The url-download / torch state-dict loader halves of the reference section
are torch plumbing replaced by :mod:`founddiff_tpu.utils.torch_convert`.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

# reference src/DACLIP.py:30-31 (OPENAI_CLIP_MEAN/STD)
OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def dist_to_mos(dist_score: jnp.ndarray) -> jnp.ndarray:
    """[*, C] class distribution -> [*, 1] mean opinion score
    (reference src/DACLIP.py:715-729)."""
    num_classes = dist_score.shape[-1]
    weights = jnp.arange(1, num_classes + 1, dtype=dist_score.dtype)
    return jnp.sum(dist_score * weights, axis=-1, keepdims=True)


def random_crop(
    inputs: Union[jnp.ndarray, Sequence[jnp.ndarray]],
    crop_size: int,
    crop_num: int,
    rng: np.random.RandomState = None,
):
    """``crop_num`` random crops shared across a list of NHWC images
    (reference src/DACLIP.py:732-761, NCHW there).  Images smaller than
    ``crop_size`` are bilinearly upscaled first.  Returns an array (or list)
    of shape [B * crop_num, ch, cw, C]."""
    single = not isinstance(inputs, (list, tuple))
    input_list: List[jnp.ndarray] = [inputs] if single else list(inputs)
    rng = rng or np.random.RandomState()

    b, h, w, c = input_list[0].shape
    ch = cw = crop_size
    if min(h, w) <= crop_size:
        scale = (crop_size + 1) / min(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        input_list = [
            jax.image.resize(x, (x.shape[0], nh, nw, x.shape[-1]), "bilinear")
            for x in input_list
        ]
        b, h, w, c = input_list[0].shape

    crops = [[] for _ in input_list]
    for _ in range(crop_num):
        sh = int(rng.randint(0, h - ch + 1))
        sw = int(rng.randint(0, w - cw + 1))
        for j, x in enumerate(input_list):
            crops[j].append(x[:, sh : sh + ch, sw : sw + cw, :])
    out = [
        jnp.stack(cs, axis=1).reshape(b * crop_num, ch, cw, -1)
        for cs in crops
    ]
    return out[0] if single else out


def clip_preprocess(x: jnp.ndarray, input_resolution: int = 224) -> jnp.ndarray:
    """CLIP preprocessing for [B, H, W, 3] float images in [0, 1]
    (reference ``clip_preprocess_tensor`` src/DACLIP.py:764-780): quantize
    to uint8 (the reference round-trips through bytes), bicubic resize of
    the short side to ``input_resolution``, center crop, normalize with the
    OpenAI CLIP mean/std."""
    x = jnp.floor(jnp.clip(x, 0.0, 1.0) * 255.0)  # .byte() truncation
    B, H, W, C = x.shape
    r = input_resolution
    if H < W:
        nh, nw = r, max(r, int(round(W * r / H)))
    else:
        nh, nw = max(r, int(round(H * r / W))), r
    x = jax.image.resize(x, (B, nh, nw, C), method="bicubic")
    top = (nh - r) // 2
    left = (nw - r) // 2
    x = x[:, top : top + r, left : left + r, :]
    x = x / 255.0
    mean = jnp.asarray(OPENAI_CLIP_MEAN, x.dtype)
    std = jnp.asarray(OPENAI_CLIP_STD, x.dtype)
    return (x - mean) / std

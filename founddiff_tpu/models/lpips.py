"""LPIPS perceptual distance (AlexNet backbone) in Flax.

The reference instantiates a frozen ``lpips.LPIPS(net='alex')`` inside its
diffusion module (src/DADiff.py:1029-1031) for the optional perceptual loss
term (commented at src/DADiff.py:1480) — capability N5 in SURVEY.md §2.2.

Structure matches the richzhang/PerceptualSimilarity 'alex' variant: the
5 AlexNet conv stages, unit-normalized feature differences, 1x1 linear heads,
spatial mean, summed over stages.  Weights load via the torch converter
(:func:`convert_lpips`); random init gives a structurally-complete stand-in.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from founddiff_tpu.models.blocks import conv2d

# ImageNet scaling used by LPIPS
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class AlexNetFeatures(nn.Module):
    """AlexNet feature extractor (torchvision layout), returning the five
    relu stages LPIPS taps."""

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        feats = []
        x = conv2d(64, 11, strides=4, padding=((2, 2), (2, 2)), name="conv0")(x)
        x = nn.relu(x)
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = conv2d(192, 5, padding=((2, 2), (2, 2)), name="conv1")(x)
        x = nn.relu(x)
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = conv2d(384, 3, padding=((1, 1), (1, 1)), name="conv2")(x)
        x = nn.relu(x)
        feats.append(x)
        x = conv2d(256, 3, padding=((1, 1), (1, 1)), name="conv3")(x)
        x = nn.relu(x)
        feats.append(x)
        x = conv2d(256, 3, padding=((1, 1), (1, 1)), name="conv4")(x)
        x = nn.relu(x)
        feats.append(x)
        return tuple(feats)


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(f**2, axis=-1, keepdims=True))
    return f / (norm + eps)


class LPIPS(nn.Module):
    """Perceptual distance between two images in [-1, 1], NHWC RGB."""

    @nn.compact
    def __call__(self, x0, x1):
        shift = jnp.asarray(_SHIFT, x0.dtype)
        scale = jnp.asarray(_SCALE, x0.dtype)
        net = AlexNetFeatures(name="net")
        f0 = net((x0 - shift) / scale)
        f1 = net((x1 - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            w = conv2d(1, 1, use_bias=False, name=f"lin{i}")(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def convert_lpips(torch_state, params_template):
    """Map a torch lpips 'alex' state dict onto the Flax tree.

    torch keys: ``net.slice{1..5}.<idx>.weight/bias`` (AlexNet convs at
    indices 0,3,6,8,10 of torchvision's feature stack) and
    ``lin{0..4}.model.1.weight``.
    """
    from founddiff_tpu.utils.torch_convert import Converter, _apply

    c = Converter(dict(torch_state))
    # torchvision AlexNet conv indices inside the flattened feature stack
    conv_keys = [
        ("net/conv0", "net.slice1.0"),
        ("net/conv1", "net.slice2.3"),
        ("net/conv2", "net.slice3.6"),
        ("net/conv3", "net.slice4.8"),
        ("net/conv4", "net.slice5.10"),
    ]
    for fpath, tkey in conv_keys:
        c.conv(fpath, tkey)
    for i in range(5):
        c.conv(f"lin{i}", f"lin{i}.model.1", bias=False)
    return _apply(params_template, c.out)

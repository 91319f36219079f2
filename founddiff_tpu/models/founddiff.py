"""FoundDiff composed denoiser: frozen Dose-CLIP tower + UnetRes.

The reference builds the CLIP towers *inside* the UNet constructor and runs
the dose encoder on the conditioning channel on every forward
(src/DADiff.py:588-600, 685-709).  Here the composition is explicit:

- ``__call__`` reproduces that behavior (tower per call, gradients stopped —
  the tower is frozen, src/DADiff.py:590-600);
- ``encode`` exposes the tower alone so samplers can hoist the
  time-independent dose/content embeddings out of the DDIM loop and pass
  them back via ``dose_embedding``/``content_embedding`` — a free
  algorithmic win the reference leaves on the table (it recomputes the full
  RN50 at every denoising step).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from founddiff_tpu.models.clip import CLIPIQA
from founddiff_tpu.models.unet import UnetRes


class FoundDiffDenoiser(nn.Module):
    dim: int
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 1
    num_unet: int = 1
    condition: bool = True
    input_condition: bool = False
    self_condition: bool = False
    resnet_block_groups: int = 8
    objective: str = "pred_res"
    test_res_or_noise: str = "res"
    scan_impl: str = "auto"
    clip_backbone: str = "RN50"
    # micro-tower overrides for tests/dryrun, as hashable kv pairs
    clip_overrides: Tuple[Tuple[str, object], ...] = ()
    # sequence-parallel mesh threaded down to the SS2D scans (see SS2D.mesh);
    # set via .clone(mesh=...) for config-5 full-volume inference
    mesh: Optional[object] = None

    def setup(self):
        assert self.clip_backbone == "RN50", "reference ships RN50 only"
        self.dose_encoder = CLIPIQA(**dict(self.clip_overrides))
        self.model = UnetRes(
            dim=self.dim,
            dim_mults=self.dim_mults,
            channels=self.channels,
            self_condition=self.self_condition,
            resnet_block_groups=self.resnet_block_groups,
            num_unet=self.num_unet,
            condition=self.condition,
            input_condition=self.input_condition,
            objective=self.objective,
            test_res_or_noise=self.test_res_or_noise,
            scan_impl=self.scan_impl,
            mesh=self.mesh,
        )

    def encode(self, x_input):
        """Dose/content embeddings from the conditioning image
        (reference src/DADiff.py:692: the channel is tripled to RGB).
        x_input: [B, H, W, channels] in [-1, 1]."""
        rgb = jnp.repeat(x_input[..., : self.channels], 3, axis=-1)
        _, dose, content = self.dose_encoder(rgb)
        return dose, content[:, None, :]

    def __call__(
        self,
        x,
        time,
        x_self_cond=None,
        dose_embedding=None,
        content_embedding=None,
        deterministic: bool = True,
    ):
        if self.condition and dose_embedding is None:
            # conditioning channel sits after the noisy channels
            # (reference indexes x[:, 1], src/DADiff.py:692)
            cond = x[..., self.channels : 2 * self.channels]
            dose_embedding, content_embedding = self.encode(cond)
            dose_embedding = jax.lax.stop_gradient(dose_embedding)
            content_embedding = jax.lax.stop_gradient(content_embedding)
        return self.model(
            x,
            time,
            dose_embedding=dose_embedding,
            content_embedding=content_embedding,
            x_self_cond=x_self_cond,
            deterministic=deterministic,
        )

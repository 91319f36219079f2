"""FoundDiff denoiser UNet (Flax, NHWC).

Rebuild of the reference ``Unet``/``UnetRes`` (src/DADiff.py:530-836):
per-scale [MambaBlock -> ResnetBlock -> Downsample] stacks with d_state
4/8/16/32, a Resnet+Mamba mid block, skip-concat decoder, and a
prompt-learned Dose-CLIP time-conditioning path.

TPU-first deviations from the reference (behavior-preserving):

- NHWC layout; channel concat on the trailing axis.
- The frozen Dose-CLIP tower is *not* constructed inside the UNet (the
  reference loads CLIP in the model ctor, src/DADiff.py:588-600); instead the
  UNet takes the dose/content embeddings as inputs so samplers can hoist the
  frozen tower out of the timestep loop (the reference recomputes it every
  call, src/DADiff.py:692).  The composition lives in
  :class:`founddiff_tpu.models.founddiff.FoundDiff`.
- The reference's unused ``clip_model`` attribute (loaded but never used in
  forward, src/DADiff.py:590-592) is dropped.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from founddiff_tpu.models.blocks import (
    Downsample,
    ResnetBlock,
    SinusoidalPosEmb,
    RandomOrLearnedSinusoidalPosEmb,
    Upsample,
    conv2d,
    dense,
)
from founddiff_tpu.models.ss2d import MambaBlock


class Unet(nn.Module):
    """FoundDiff UNet backbone (reference src/DADiff.py:530-740)."""

    dim: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 1
    self_condition: bool = False
    resnet_block_groups: int = 8
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    condition: bool = False
    input_condition: bool = False
    base_d_state: int = 4
    ssm_expand: float = 2.0
    context_dim: int = 1024
    scan_impl: str = "auto"
    mesh: Optional[object] = None  # sequence-parallel mesh (see SS2D.mesh)

    @nn.compact
    def __call__(
        self,
        x,
        time,
        dose_embedding=None,
        content_embedding=None,
        x_self_cond=None,
        deterministic: bool = True,
    ):
        """x: [B, H, W, C_in] (noisy + condition channels concatenated);
        time: [B] float; dose_embedding: [B, 1024];
        content_embedding: [B, 1, 256]."""
        dim = self.dim
        init_dim = self.init_dim or dim
        time_dim = dim * 4
        mults = self.dim_mults
        num_res = len(mults)

        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x[..., : self.channels])
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        x = conv2d(init_dim, 7, name="init_conv")(x)
        r = x

        # time embedding (reference src/DADiff.py:566-585)
        if self.learned_sinusoidal_cond or self.random_fourier_features:
            emb = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim, self.random_fourier_features,
                name="sinu_pos_emb",
            )(time)
        else:
            emb = SinusoidalPosEmb(dim, name="sinu_pos_emb")(time)
        t = dense(time_dim, name="time_mlp_1")(emb)
        t = nn.gelu(t, approximate=False)
        t = dense(time_dim, name="time_mlp_2")(t)

        # learned-prompt dose conditioning (reference src/DADiff.py:606-611,
        # 703-709): t += prompt_mlp(softmax(text_mlp(dose)) * prompt).
        # Params exist whenever condition=True (zero embeddings substitute for
        # a missing tower) so the param tree is stable.
        if self.condition:
            if dose_embedding is None:
                dose_embedding = jnp.zeros((x.shape[0], self.context_dim), x.dtype)
            prompt = self.param(
                "prompt",
                lambda key, shape: jax.random.uniform(key, shape),
                (1, time_dim),
            )
            pe = dense(time_dim, name="text_mlp_1")(dose_embedding)
            pe = nn.silu(pe)
            pe = dense(time_dim, name="text_mlp_2")(pe)
            pe = jax.nn.softmax(pe, axis=1) * prompt
            t = t + dense(time_dim, name="prompt_mlp")(pe)
            if content_embedding is None:
                content_embedding = jnp.zeros((x.shape[0], 1, 256), x.dtype)

        # keep the trunk in the activation dtype (time/conditioning paths
        # compute in fp32; a silent upcast here would drag the whole UNet
        # back to fp32 under a bf16 policy)
        t = t.astype(x.dtype)
        c = content_embedding  # [B, 1, 256] (None when condition=False)
        if c is not None:
            c = c.astype(x.dtype)

        dims = [init_dim] + [dim * m for m in mults]
        in_out = list(zip(dims[:-1], dims[1:]))

        def d_state_for(level):
            return (
                self.base_d_state
                if level == 0
                else int(self.base_d_state * 2**level)
            )

        # encoder: attn -> res -> push skip -> downsample
        # (reference src/DADiff.py:712-719)
        skips = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            x = MambaBlock(
                hidden_size=dim_in,
                d_state=d_state_for(ind),
                expand=self.ssm_expand,
                scan_impl=self.scan_impl,
                mesh=self.mesh,
                name=f"down_{ind}_attn",
            )(x, c, t, deterministic=deterministic)
            x = ResnetBlock(
                dim_in, groups=self.resnet_block_groups, name=f"down_{ind}_res"
            )(x)
            skips.append(x)
            if not is_last:
                x = Downsample(dim_out, name=f"down_{ind}_down")(x)
            else:
                x = conv2d(dim_out, 3, name=f"down_{ind}_down")(x)

        # mid (reference src/DADiff.py:646-649, 721-722)
        mid_dim = dims[-1]
        x = ResnetBlock(
            mid_dim, groups=self.resnet_block_groups, name="mid_block"
        )(x)
        x = MambaBlock(
            hidden_size=mid_dim,
            d_state=int(self.base_d_state * 2 ** (num_res - 1)),
            expand=self.ssm_expand,
            scan_impl=self.scan_impl,
            mesh=self.mesh,
            name="mid_attn",
        )(x, c, t, deterministic=deterministic)

        # decoder: concat skip -> res -> attn -> upsample
        # (reference src/DADiff.py:725-731)
        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == num_res - 1
            level = num_res - 1 - ind
            # skip-concat rides split-kernel convs (no concat copy in HBM)
            x = ResnetBlock(
                dim_out, groups=self.resnet_block_groups, name=f"up_{ind}_res"
            )(x, skip=skips.pop())
            x = MambaBlock(
                hidden_size=dim_out,
                d_state=d_state_for(level),
                expand=self.ssm_expand,
                scan_impl=self.scan_impl,
                mesh=self.mesh,
                name=f"up_{ind}_attn",
            )(x, c, t, deterministic=deterministic)
            if not is_last:
                x = Upsample(dim_in, name=f"up_{ind}_up")(x)
            else:
                x = conv2d(dim_in, 3, name=f"up_{ind}_up")(x)

        out_dim = self.out_dim or self.channels * (
            1 if not self.learned_variance else 2
        )
        x = ResnetBlock(
            dim, groups=self.resnet_block_groups, name="final_res_block"
        )(x, skip=r)
        return conv2d(out_dim, 1, name="final_conv")(x)


class UnetRes(nn.Module):
    """Wrapper over 1 or 2 UNets with per-objective time selection
    (reference src/DADiff.py:743-836)."""

    dim: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 1
    self_condition: bool = False
    resnet_block_groups: int = 8
    learned_variance: bool = False
    num_unet: int = 1
    condition: bool = False
    input_condition: bool = False
    objective: str = "pred_res_noise"
    test_res_or_noise: str = "res_noise"
    scan_impl: str = "auto"
    mesh: Optional[object] = None  # sequence-parallel mesh (see SS2D.mesh)

    def _make_unet(self, name):
        return Unet(
            dim=self.dim,
            init_dim=self.init_dim,
            out_dim=self.out_dim,
            dim_mults=self.dim_mults,
            channels=self.channels,
            self_condition=self.self_condition,
            resnet_block_groups=self.resnet_block_groups,
            learned_variance=self.learned_variance,
            condition=self.condition,
            input_condition=self.input_condition,
            scan_impl=self.scan_impl,
            mesh=self.mesh,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        x,
        time,
        dose_embedding=None,
        content_embedding=None,
        x_self_cond=None,
        deterministic: bool = True,
    ):
        """time: two-element sequence [acs[t]*T, bcs[t]*T]."""
        kw = dict(
            dose_embedding=dose_embedding,
            content_embedding=content_embedding,
            x_self_cond=x_self_cond,
            deterministic=deterministic,
        )
        if self.num_unet == 2:
            unet0 = self._make_unet("unet0")
            unet1 = self._make_unet("unet1")
            if self.test_res_or_noise == "res_noise":
                return [unet0(x, time[0], **kw), unet1(x, time[1], **kw)]
            if self.test_res_or_noise == "res":
                return [unet0(x, time[0], **kw), 0.0]
            if self.test_res_or_noise == "noise":
                return [0.0, unet1(x, time[1], **kw)]
            raise ValueError(self.test_res_or_noise)
        # single-unet objectives pick their time channel
        # (reference src/DADiff.py:825-836)
        if self.objective == "pred_noise":
            t = time[1]
        elif self.objective == "pred_res":
            t = time[0]
        else:
            t = time[0]
        return [self._make_unet("unet0")(x, t, **kw)]

"""Vanilla DDPM UNet (lucidrains-style) in Flax — the baseline generation
path the reference bundles (src/denoising_diffusion_pytorch.py:283-410,
selected by ``original_ddim_ddpm=True``; train.py:59,85-95).

Structure: two time-conditioned resnet blocks + linear attention per scale,
full attention at the bottleneck, double skip connections per scale.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from founddiff_tpu.models.blocks import (
    Attention,
    Block,
    ChanLayerNorm,
    Downsample,
    LinearAttention,
    RandomOrLearnedSinusoidalPosEmb,
    SinusoidalPosEmb,
    Upsample,
    conv2d,
    dense,
)


class TimeResnetBlock(nn.Module):
    """Two WSConv blocks with a SiLU-Linear time scale/shift on the first
    (reference src/denoising_diffusion_pytorch.py:201-225)."""

    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if time_emb is not None:
            emb = dense(self.dim_out * 2, name="mlp")(nn.silu(time_emb))
            emb = emb[:, None, None, :]
            scale_shift = jnp.split(emb, 2, axis=-1)
        h = Block(self.dim_out, groups=self.groups, name="block1")(
            x, scale_shift=scale_shift
        )
        res = x
        if x.shape[-1] != self.dim_out:
            res = conv2d(self.dim_out, 1, name="res_conv")(x)
        # residual add fused into block2's GN/SiLU epilogue
        return Block(self.dim_out, groups=self.groups, name="block2")(
            h, residual=res
        )


class VanillaUnet(nn.Module):
    dim: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 3
    self_condition: bool = False
    resnet_block_groups: int = 8
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16

    @nn.compact
    def __call__(self, x, time, x_self_cond=None, deterministic: bool = True):
        dim = self.dim
        init_dim = self.init_dim or dim
        time_dim = dim * 4

        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        x = conv2d(init_dim, 7, name="init_conv")(x)
        r = x

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
        t = t.astype(x.dtype)  # no fp32 leak into the trunk under bf16

        dims = [init_dim] + [dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)
        g = self.resnet_block_groups

        skips = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            x = TimeResnetBlock(dim_in, groups=g, name=f"down_{ind}_block1")(x, t)
            skips.append(x)
            x = TimeResnetBlock(dim_in, groups=g, name=f"down_{ind}_block2")(x, t)
            x = x + LinearAttention(dim_in, name=f"down_{ind}_attn")(
                ChanLayerNorm(dim_in, name=f"down_{ind}_attn_norm")(x)
            )
            skips.append(x)
            if not is_last:
                x = Downsample(dim_out, name=f"down_{ind}_down")(x)
            else:
                x = conv2d(dim_out, 3, name=f"down_{ind}_down")(x)

        mid_dim = dims[-1]
        x = TimeResnetBlock(mid_dim, groups=g, name="mid_block1")(x, t)
        x = x + Attention(mid_dim, name="mid_attn")(
            ChanLayerNorm(mid_dim, name="mid_attn_norm")(x)
        )
        x = TimeResnetBlock(mid_dim, groups=g, name="mid_block2")(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == num_res - 1
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = TimeResnetBlock(dim_out, groups=g, name=f"up_{ind}_block1")(x, t)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = TimeResnetBlock(dim_out, groups=g, name=f"up_{ind}_block2")(x, t)
            x = x + LinearAttention(dim_out, name=f"up_{ind}_attn")(
                ChanLayerNorm(dim_out, name=f"up_{ind}_attn_norm")(x)
            )
            if not is_last:
                x = Upsample(dim_in, name=f"up_{ind}_up")(x)
            else:
                x = conv2d(dim_in, 3, name=f"up_{ind}_up")(x)

        out_dim = self.out_dim or self.channels * (
            1 if not self.learned_variance else 2
        )
        x = jnp.concatenate([x, r], axis=-1)
        x = TimeResnetBlock(dim, groups=g, name="final_res_block")(x, t)
        return conv2d(out_dim, 1, name="final_conv")(x)

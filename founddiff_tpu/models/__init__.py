from founddiff_tpu.models.blocks import (
    Attention,
    Block,
    ChanLayerNorm,
    ChannelAttention,
    CrossAttention,
    Downsample,
    LinearAttention,
    RandomOrLearnedSinusoidalPosEmb,
    ResnetBlock,
    SinusoidalPosEmb,
    TimestepEmbedder,
    TransposedAttention,
    Upsample,
    WSConv,
)
from founddiff_tpu.models.ss2d import SS2D, MambaBlock, PatchMerging2D
from founddiff_tpu.models.unet import Unet, UnetRes
from founddiff_tpu.models.vanilla_unet import TimeResnetBlock, VanillaUnet
from founddiff_tpu.models.lpips import LPIPS
from founddiff_tpu.models.clip import CLIP, CLIPIQA, PromptLearner
from founddiff_tpu.models.founddiff import FoundDiffDenoiser

__all__ = [
    "Attention",
    "Block",
    "CLIP",
    "CLIPIQA",
    "FoundDiffDenoiser",
    "LPIPS",
    "PatchMerging2D",
    "PromptLearner",
    "ChanLayerNorm",
    "ChannelAttention",
    "CrossAttention",
    "Downsample",
    "LinearAttention",
    "MambaBlock",
    "RandomOrLearnedSinusoidalPosEmb",
    "ResnetBlock",
    "SS2D",
    "SinusoidalPosEmb",
    "TimeResnetBlock",
    "TimestepEmbedder",
    "TransposedAttention",
    "Unet",
    "UnetRes",
    "Upsample",
    "VanillaUnet",
    "WSConv",
]

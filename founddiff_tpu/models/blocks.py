"""Flax building blocks of the FoundDiff denoiser UNet.

TPU-native (NHWC) re-implementations of the reference blocks in
src/DADiff.py:122-527: weight-standardized convs, resnet blocks, the
attention family, and timestep embeddings.  Channel concatenation and
normalization happen on the trailing axis (XLA's preferred conv layout),
and every block is a pure `nn.Module`.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from founddiff_tpu.models.init import make_torch_bias_init, torch_kernel_init


class WSConv(nn.Module):
    """Weight-standardized conv (reference src/DADiff.py:139-154).

    Kernel is standardized over (kh, kw, in) per output channel at call time
    with biased variance; eps follows the reference's dtype switch.

    ``skip``: a second input whose channels logically follow ``x``'s —
    ``WSConv()(x, skip)`` computes exactly ``WSConv()(concat([x, skip]))``
    (same kernel param, standardized jointly, then split along the input-
    channel dim) without ever materializing the concatenated image in HBM.
    The reference concatenates (src/DADiff.py:725-731); on TPU the concat
    copy costs a full extra HBM pass per decoder stage.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x, skip=None):
        kh, kw = self.kernel_size
        c1 = x.shape[-1]
        in_ch = c1 + (skip.shape[-1] if skip is not None else 0)
        fan_in = in_ch * kh * kw
        kernel = self.param(
            "kernel", torch_kernel_init, (kh, kw, in_ch, self.features), jnp.float32
        )
        bias = self.param(
            "bias", make_torch_bias_init(fan_in), (self.features,), jnp.float32
        )
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        var = kernel.var(axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) * jax.lax.rsqrt(var + eps)

        def conv(u, k):
            return jax.lax.conv_general_dilated(
                u,
                k.astype(u.dtype),
                window_strides=(1, 1),
                padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        y = conv(x, kernel[:, :, :c1])
        if skip is not None:
            y = y + conv(skip, kernel[:, :, c1:])
        return y + bias.astype(y.dtype)


class TorchConv(nn.Module):
    """nn.Conv with torch-default init for kernel AND bias
    (kaiming_uniform(a=sqrt(5)) / U(+-1/sqrt(fan_in)))."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Any = 1
    padding: Any = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x, skip=None):
        """``skip``: second input whose channels follow ``x``'s — equivalent
        to calling on ``concat([x, skip], -1)`` without the concat copy
        (ungrouped convs only); see :class:`WSConv`."""
        kh, kw = self.kernel_size
        c1 = x.shape[-1]
        total = c1 + (skip.shape[-1] if skip is not None else 0)
        assert skip is None or self.feature_group_count == 1
        in_ch = total // self.feature_group_count
        fan_in = in_ch * kh * kw
        kernel = self.param(
            "kernel", torch_kernel_init, (kh, kw, in_ch, self.features),
            jnp.float32,
        )
        strides = (
            (self.strides, self.strides)
            if isinstance(self.strides, int)
            else self.strides
        )

        def conv(u, k):
            # im2col path for tiny input channels (the TPU conv emitter
            # runs ~25x off roofline at C_in < 8; init_conv's 7x7 2->64 is
            # 3.1 ms native at 512^2 bs8).  OPT-IN (FOUNDDIFF_IM2COL=1):
            # standalone the im2col matmul wins, but in-model it is a NET
            # LOSS — its dot-layout output forces relayout copies at both
            # consumers (r5 bench: default 0.7956 vs im2col 0.7739
            # slices/sec, DDIM-50 512^2 bs16).
            import os as _os

            if (
                u.shape[-1] <= 4
                and kh * kw > 4
                and strides == (1, 1)
                and self.padding == "SAME"
                and self.feature_group_count == 1
                and _os.environ.get("FOUNDDIFF_IM2COL", "0") == "1"
            ):
                B, H, W, Ci = u.shape
                up = jnp.pad(
                    u, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2),
                        (0, 0))
                )
                cols = jnp.concatenate(
                    [
                        up[:, i : i + H, j : j + W, :]
                        for i in range(kh)
                        for j in range(kw)
                    ],
                    axis=-1,
                )
                kmat = k.astype(u.dtype).reshape(kh * kw * Ci, -1)
                return jax.lax.dot_general(
                    cols, kmat, (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(u.dtype)
            return jax.lax.conv_general_dilated(
                u,
                k.astype(u.dtype),
                window_strides=strides,
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.feature_group_count,
            )

        y = conv(x, kernel if skip is None else kernel[:, :, :c1])
        if skip is not None:
            y = y + conv(skip, kernel[:, :, c1:])
        if self.use_bias:
            bias = self.param(
                "bias", make_torch_bias_init(fan_in), (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(y.dtype)
        return y


def conv2d(features, kernel_size, strides=1, padding="SAME", use_bias=True,
           feature_group_count=1, name=None):
    """Conv with torch-style kernel+bias init."""
    ks = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    return TorchConv(
        features,
        ks,
        strides=strides,
        padding=padding,
        use_bias=use_bias,
        feature_group_count=feature_group_count,
        name=name,
    )


class TorchDense(nn.Module):
    """nn.Dense with torch-default kernel AND bias init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init, (fan_in, self.features), jnp.float32
        )
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", make_torch_bias_init(fan_in), (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        return y


def dense(features, use_bias=True, name=None):
    return TorchDense(features, use_bias=use_bias, name=name)


class LNorm(nn.Module):
    """LayerNorm over the trailing axis backed by the fused Pallas kernel
    (param layout identical to nn.LayerNorm: scale/bias)."""

    features: int
    eps: float = 1e-5
    use_affine: bool = True

    @nn.compact
    def __call__(self, x):
        from founddiff_tpu.ops.norm_pallas import layer_norm

        if self.use_affine:
            scale = self.param(
                "scale", nn.initializers.ones, (self.features,), jnp.float32
            )
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            return layer_norm(x, scale, bias, self.eps)
        return layer_norm(x, None, None, self.eps)


class ChanLayerNorm(nn.Module):
    """Channel LayerNorm with biased variance and scale only
    (reference src/DADiff.py:157-166); NHWC -> normalize trailing axis."""

    dim: int

    @nn.compact
    def __call__(self, x):
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        g = self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)
        mean = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) * g.astype(x.dtype)


class SinusoidalPosEmb(nn.Module):
    """reference src/DADiff.py:173-185 — note sin-first ordering."""

    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        scale = math.log(10000) / (half - 1)
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -scale)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    """reference src/DADiff.py:189-205 (crowsonkb random fourier features)."""

    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,), jnp.float32)
        if self.is_random:
            w = jax.lax.stop_gradient(w)
        t = t.astype(jnp.float32)[:, None]
        freqs = t * w[None, :] * 2 * math.pi
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class TimestepEmbedder(nn.Module):
    """DiT-style embedder (reference src/DADiff.py:490-527) — cos-first
    frequency ordering, MLP(hidden, SiLU, hidden)."""

    hidden_size: int
    frequency_embedding_size: int = 256

    @staticmethod
    def timestep_embedding(t, dim, max_period=10000):
        half = dim // 2
        freqs = jnp.exp(
            -math.log(max_period)
            * jnp.arange(half, dtype=jnp.float32)
            / half
        )
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        if dim % 2:
            emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
        return emb

    @nn.compact
    def __call__(self, t):
        emb = self.timestep_embedding(t, self.frequency_embedding_size)
        emb = dense(self.hidden_size)(emb)
        emb = nn.silu(emb)
        return dense(self.hidden_size)(emb)


class _GNAffine(nn.Module):
    """GroupNorm affine params (paths ``<name>/scale``, ``<name>/bias``
    identical to nn.GroupNorm for the checkpoint converter)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return scale, bias


class Block(nn.Module):
    """WSConv -> GroupNorm -> (scale/shift) -> SiLU (reference
    src/DADiff.py:214-233).  The post-conv epilogue (GN stats + normalize +
    modulation + silu + optional residual add) runs through the fused Pallas
    kernel (:mod:`founddiff_tpu.ops.groupnorm_pallas`) — the GN statistics
    alone cost ~15 ms/fwd at 512^2 as XLA convert_reduce passes."""

    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, scale_shift=None, residual=None, skip=None):
        from founddiff_tpu.ops.groupnorm_pallas import group_norm_silu

        x = WSConv(self.dim_out, (3, 3), name="proj")(x, skip)
        scale, bias = _GNAffine(self.dim_out, name="norm")()
        if scale_shift is not None:
            B, C = x.shape[0], x.shape[-1]
            scale_shift = tuple(t.reshape(B, C) for t in scale_shift)
        return group_norm_silu(
            x, scale, bias, residual=residual, scale_shift=scale_shift,
            groups=self.groups, eps=1e-5,
        )


class ResnetBlock(nn.Module):
    """Single-block residual unit (reference src/DADiff.py:398-427; the
    reference's second block and time MLP are commented out — capability
    preserved via ``use_time_emb`` for future variants).  The residual add
    rides the fused GroupNorm/SiLU kernel epilogue."""

    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, time_emb=None, skip=None):
        """``skip``: decoder skip tensor, logically concatenated after
        ``x``'s channels (reference torch.cat src/DADiff.py:725-731) but fed
        through split-kernel convs so the concat never rides HBM."""
        res = x
        total = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        if total != self.dim_out:
            res = conv2d(self.dim_out, 1, name="res_conv")(x, skip)
        else:
            assert skip is None
        return Block(self.dim_out, groups=self.groups, name="block1")(
            x, residual=res, skip=skip
        )


class Downsample(nn.Module):
    """4x4 stride-2 conv (reference src/DADiff.py:136)."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        return conv2d(
            self.dim_out, 4, strides=2, padding=((1, 1), (1, 1)), name="conv"
        )(x)


class Upsample(nn.Module):
    """nearest x2 + 3x3 conv (reference src/DADiff.py:129-133)."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # nearest-2x as broadcast+reshape (one cheap fusion; jax.image.resize
        # lowers to gathers that dominated the Upsample profile)
        x = jnp.broadcast_to(
            x[:, :, None, :, None, :], (B, H, 2, W, 2, C)
        ).reshape(B, H * 2, W * 2, C)
        return conv2d(self.dim_out, 3, name="conv")(x)


class ChannelAttention(nn.Module):
    """RCAN squeeze-excite channel attention (reference src/DADiff.py:232-249)."""

    num_feat: int
    squeeze_factor: int = 16

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2), keepdims=True)
        y = conv2d(self.num_feat // self.squeeze_factor, 1)(y)
        y = nn.relu(y)
        y = conv2d(self.num_feat, 1)(y)
        return x * nn.sigmoid(y)


class _ConvKernel(nn.Module):
    """Bare conv kernel param (path ``<name>/kernel`` stays converter-
    compatible with the reference Conv2d modules)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", torch_kernel_init, self.shape, jnp.float32)


class TransposedAttention(nn.Module):
    """Channel ('transposed') attention: C x C attention with the pixel axis
    contracted, never materializing L x L (reference src/DADiff.py:252-285).
    The context argument is accepted and ignored, as in the reference.

    ``fused_mod=(scale_mlp, shift_mlp, gate_mlp)``: serving fast path — ``x``
    is then the PRE-norm MambaBlock state and the whole half-block
    ``x + gate * attn(modulate(LN(x)))`` runs as one Pallas kernel per image
    (:mod:`founddiff_tpu.ops.attn_block`), all params identical."""

    dim: int
    heads: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, c=None, fused_mod=None):
        B, H, W, C = x.shape
        hd, ch = self.heads, C // self.heads
        temperature = self.param(
            "temperature", nn.initializers.ones, (self.heads, 1, 1), jnp.float32
        )
        assert not self.use_bias, "reference TransposedAttention has no bias"
        if fused_mod is not None:
            from founddiff_tpu.ops.attn_block import attn_block

            scale_mlp, shift_mlp, gate_mlp = fused_mod
            qkv_w4 = _ConvKernel((1, 1, C, 3 * C), name="qkv")()
            dw_w4 = _ConvKernel((3, 3, 1, 3 * C), name="qkv_dwconv")()
            proj4 = _ConvKernel((1, 1, C, C), name="project_out")()
            return attn_block(
                x, scale_mlp, shift_mlp, gate_mlp,
                qkv_w4[0, 0], dw_w4, temperature, proj4,
                heads=hd, eps=1e-6,
            )
        # the qkv 1x1 conv and the depthwise 3x3 keep their reference param
        # layout, but the q/k vs v SPLIT happens on the (tiny) WEIGHTS, not
        # the activations — no big output slices/relayouts downstream
        qkv_w = _ConvKernel((1, 1, C, 3 * C), name="qkv")()[0, 0]
        dw_w = _ConvKernel((3, 3, 1, 3 * C), name="qkv_dwconv")()
        dn = ("NHWC", "HWIO", "NHWC")

        def pipe(lo, hi):
            u = jnp.einsum(
                "bhwc,ce->bhwe", x, qkv_w[:, lo:hi].astype(x.dtype)
            )
            return jax.lax.conv_general_dilated(
                u, dw_w[..., lo:hi].astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=dn, feature_group_count=hi - lo,
            )

        # One flat Gram matmul over [q; k] yields the q.k^T attention logits
        # AND both L2 norms (diagonals) in a single pass over HBM — no qkv
        # split, no head-split relayout, no separate norm reduces.  The
        # [B, 2C, 2C] Gram includes cross-head blocks (discarded; the extra
        # MXU FLOPs are negligible next to the saved passes).  Math identical
        # to the reference chain (src/DADiff.py:266-281).
        qk = pipe(0, 2 * C).reshape(B, H * W, 2 * C)
        G = jnp.einsum(
            "blc,bld->bcd", qk, qk, preferred_element_type=jnp.float32
        )  # [B, 2C, 2C]
        diag = jnp.diagonal(G, axis1=1, axis2=2)  # [B, 2C]
        qn = jnp.maximum(jnp.sqrt(diag[:, :C]), 1e-12).reshape(B, hd, ch)
        kn = jnp.maximum(jnp.sqrt(diag[:, C:]), 1e-12).reshape(B, hd, ch)
        qk_block = G[:, :C, C:]  # [B, C, C]; per-head blocks on the diagonal
        attn = jnp.stack(
            [
                qk_block[:, i * ch : (i + 1) * ch, i * ch : (i + 1) * ch]
                for i in range(hd)
            ],
            axis=1,
        )  # [B, h, ch, ch]
        attn = attn / (qn[..., None] * kn[:, :, None, :])
        attn = jax.nn.softmax(attn * temperature, axis=-1)  # [B, h, c, d]

        # fold project_out into the attention: out_px = P (blockdiag(attn) v_px)
        # == v_px @ M_b with a per-batch [C, C] matrix — one pixel pass total
        proj_kernel = _ConvKernel((1, 1, C, C), name="project_out")()
        pk = proj_kernel[0, 0].reshape(hd, ch, C)  # [(h c), C] -> [h, c, C]
        M = jnp.einsum("hce,bhcd->bhde", pk.astype(jnp.float32), attn)
        M = M.reshape(B, C, C).astype(x.dtype)
        v = pipe(2 * C, 3 * C).reshape(B, H * W, C)
        out = jnp.einsum(
            "blf,bfe->ble", v, M, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        return out.reshape(B, H, W, C)


class LinearAttention(nn.Module):
    """Linear attention (reference src/DADiff.py:287-317)."""

    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x, c=None):
        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        scale = self.dim_head**-0.5
        qkv = conv2d(hidden * 3, 1, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(u):  # [B,H,W,hd] -> [B, heads, d, L]
            u = u.reshape(B, H * W, self.heads, self.dim_head)
            return u.transpose(0, 2, 3, 1)

        q, k, v = map(to_heads, (q, k, v))
        q = jax.nn.softmax(q, axis=-2) * scale
        k = jax.nn.softmax(k, axis=-1)
        v = v / (H * W)
        context = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhde,bhdn->bhen", context, q)
        out = out.transpose(0, 3, 1, 2).reshape(B, H, W, hidden)
        out = conv2d(self.dim, 1, name="to_out")(out)
        return ChanLayerNorm(self.dim, name="to_out_norm")(out)


class Attention(nn.Module):
    """Full softmax self-attention (reference src/DADiff.py:369-392), used by
    the vanilla UNet path at low resolutions.  Long sequences route through
    the Pallas flash-attention kernel (the TPU equivalent of the reference's
    pinned flash-attn dependency, install.yaml:188)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    use_flash: Optional[bool] = None  # None -> auto (L >= 1024)

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        scale = self.dim_head**-0.5
        qkv = conv2d(hidden * 3, 1, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(u):  # -> [B, heads, L, d]
            return u.reshape(B, H * W, self.heads, self.dim_head).transpose(
                0, 2, 1, 3
            )

        q, k, v = map(to_heads, (q, k, v))
        use_flash = (
            self.use_flash
            if self.use_flash is not None
            else (H * W >= 1024 and not self.is_initializing())
        )
        if use_flash:
            from founddiff_tpu.ops.attention_pallas import flash_attention

            out = flash_attention(q, k, v, scale)
        else:
            sim = jnp.einsum(
                "bhid,bhjd->bhij", q * scale, k,
                preferred_element_type=jnp.float32,
            )
            attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, hidden)
        return conv2d(self.dim, 1, name="to_out")(out)


class CrossAttention(nn.Module):
    """Pixel-to-context cross attention (reference src/DADiff.py:319-366);
    context is the Dose-CLIP content embedding [B, 1, 256]."""

    query_dim: int
    context_dim: int = 256
    heads: int = 4
    dim_head: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        B, H, W, C = x.shape
        inner = self.heads * self.dim_head
        scale = self.dim_head**-0.5
        xf = x.reshape(B, H * W, C)
        ctx = xf if context is None else context

        q = dense(inner, use_bias=False, name="to_q")(xf)
        k = dense(inner, use_bias=False, name="to_k")(ctx)
        v = dense(inner, use_bias=False, name="to_v")(ctx)

        def to_heads(u):
            return u.reshape(B, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(to_heads, (q, k, v))
        # long self-/cross-contexts route through the streamed flash kernel
        # (the L x L score matrix would not fit at 512^2 pixels); the
        # FoundDiff config's 1-token Dose-CLIP context stays on plain XLA
        Lq, Lk = q.shape[2], k.shape[2]
        if Lq * Lk >= 1024 * 1024 and Lk >= 128 and not self.is_initializing():
            from founddiff_tpu.ops.attention_pallas import flash_attention

            out = flash_attention(q, k, v, scale)
        else:
            sim = jnp.einsum(
                "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
            ) * scale
            attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H * W, inner)
        out = dense(self.query_dim, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out.reshape(B, H, W, self.query_dim)


class PreNorm(nn.Module):
    dim: int
    fn: nn.Module

    @nn.compact
    def __call__(self, x):
        return self.fn(ChanLayerNorm(self.dim)(x))


class Residual(nn.Module):
    fn: nn.Module

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        return self.fn(x, *args, **kwargs) + x


def modulate(x, shift, scale):
    """adaLN modulation for NHWC feature maps (reference src/DADiff.py:450-451)."""
    return x * (1 + scale[:, None, None, :]) + shift[:, None, None, :]

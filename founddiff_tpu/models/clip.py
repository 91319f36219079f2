"""Dose-CLIP conditioning tower in Flax (frozen at train time).

Rebuild of the reference's CLIP stack (src/DACLIP.py / src/model_clipiqa.py):
``ModifiedResNet`` RN50 visual tower with attention pooling
(src/DACLIP.py:262-349, 214-259), QuickGELU text transformer
(src/DACLIP.py:352-398), the CLIP-IQA ``PromptLearner`` with learnable
context around fixed CT prompts (src/DACLIP.py:895-969), and the ``CLIPIQA``
dose/content heads (src/DACLIP.py:1135-1221).

TPU-first notes:

- BatchNorms are frozen (eval-mode) affine+stats parameters — the tower is
  never trained inside this framework (the reference sets requires_grad=False
  on every tower param, src/DADiff.py:588-600), so there is no mutable state.
- The attention pool computes only the single mean-token query (identical
  math to taking row 0 of the full QKV attention the reference computes,
  src/DACLIP.py:236-259, but HW+1 times cheaper).
- Text tokenization is out of scope on-device: ``PromptLearner`` carries the
  prompt token *embeddings* as parameters (filled by the torch checkpoint
  converter), and ``encode_text`` takes pre-tokenized ids.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from founddiff_tpu.models.blocks import dense
from founddiff_tpu.models.init import torch_kernel_init


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm: (x - mean) * scale / sqrt(var + eps) + bias."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (bias - mean * inv)


def _conv(features, kernel, stride=1, name=None):
    pad = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=stride,
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        kernel_init=torch_kernel_init,
        name=name,
    )


def _avg_pool(x, k):
    return nn.avg_pool(x, (k, k), strides=(k, k))


class Bottleneck(nn.Module):
    """CLIP anti-aliased bottleneck (reference src/DACLIP.py:168-211)."""

    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[-1]
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(
            _conv(self.planes, 1, name="conv1")(x)
        ))
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(
            _conv(self.planes, 3, name="conv2")(out)
        ))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = FrozenBatchNorm(self.planes * self.expansion, name="bn3")(
            _conv(self.planes * self.expansion, 1, name="conv3")(out)
        )
        if self.stride > 1 or inplanes != self.planes * self.expansion:
            identity = x
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = FrozenBatchNorm(
                self.planes * self.expansion, name="downsample_bn"
            )(_conv(self.planes * self.expansion, 1, name="downsample_conv")(identity))
        else:
            identity = x
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling of the mean token (reference src/DACLIP.py:214-259).

    Only the mean-token query is evaluated; output equals the reference's
    ``x[0]``.  ``pos_embedding=False`` (the FoundDiff path at 512 px) skips
    the positional embedding exactly as the reference does.
    """

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, pos_embedding: bool = False):
        B, H, W, C = x.shape
        out_dim = self.output_dim or self.embed_dim
        tokens = x.reshape(B, H * W, C)
        mean_tok = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # [B, HW+1, C]

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim**-0.5),
            (self.spacial_dim**2 + 1, self.embed_dim),
        )
        if pos_embedding:
            # bicubic-interpolated when token count differs
            if tokens.shape[1] != pos.shape[0]:
                pos_r = jax.image.resize(
                    pos[None, None], (1, 1, tokens.shape[1], C), method="bicubic"
                )[0, 0]
            else:
                pos_r = pos
            tokens = tokens + pos_r[None]

        q = dense(self.embed_dim, name="q_proj")(tokens[:, :1])
        k = dense(self.embed_dim, name="k_proj")(tokens)
        v = dense(self.embed_dim, name="v_proj")(tokens)
        hd = self.embed_dim // self.num_heads

        def heads(u):
            return u.reshape(B, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = map(heads, (q, k, v))
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q * hd**-0.5, k,
                       preferred_element_type=jnp.float32),
            axis=-1,
        ).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, self.embed_dim)
        return dense(out_dim, name="c_proj")(out)


class ModifiedResNet(nn.Module):
    """CLIP RN50 visual tower (reference src/DACLIP.py:262-349)."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)
    output_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224
    width: int = 64

    @nn.compact
    def __call__(self, x, pos_embedding: bool = False, return_features: bool = False):
        w = self.width
        # the tower reduces 32x spatially; inputs below 32 px (micro test
        # towers) would collapse to an empty grid before the attention pool
        # (the torch reference errors identically) — upsample them first
        B, H, W, C = x.shape
        if H < 32 or W < 32:
            x = jax.image.resize(
                x, (B, max(H, 32), max(W, 32), C), method="bilinear"
            )
        # 3-conv stem with avgpool
        x = nn.relu(FrozenBatchNorm(w // 2, name="bn1")(
            nn.Conv(w // 2, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=torch_kernel_init, name="conv1")(x)
        ))
        x = nn.relu(FrozenBatchNorm(w // 2, name="bn2")(
            _conv(w // 2, 3, name="conv2")(x)
        ))
        x = nn.relu(FrozenBatchNorm(w, name="bn3")(_conv(w, 3, name="conv3")(x)))
        x = _avg_pool(x, 2)

        def layer(x, planes, blocks, stride, name):
            x = Bottleneck(planes, stride, name=f"{name}_0")(x)
            for i in range(1, blocks):
                x = Bottleneck(planes, 1, name=f"{name}_{i}")(x)
            return x

        x = layer(x, w, self.layers[0], 1, "layer1")
        x = layer(x, w * 2, self.layers[1], 2, "layer2")
        x = layer(x, w * 4, self.layers[2], 2, "layer3")
        x = layer(x, w * 8, self.layers[3], 2, "layer4")
        if return_features:
            return x
        return AttentionPool2d(
            spacial_dim=self.input_resolution // 32,
            embed_dim=w * 32,
            num_heads=self.heads,
            output_dim=self.output_dim,
            name="attnpool",
        )(x, pos_embedding=pos_embedding)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class VisionTransformer(nn.Module):
    """CLIP ViT visual tower (reference src/DACLIP.py:401-447).

    Patchify conv -> [CLS; patches] -> (optional bicubic-resized positional
    embedding, gated exactly like the reference's ``pos_embedding`` flag) ->
    ln_pre -> QuickGELU transformer -> ln_post on the CLS token -> proj."""

    input_resolution: int
    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x, pos_embedding: bool = False,
                 return_token: bool = False):
        B = x.shape[0]
        w = self.width
        x = nn.Conv(
            w, (self.patch_size, self.patch_size),
            strides=self.patch_size, padding="VALID", use_bias=False,
            kernel_init=torch_kernel_init, name="conv1",
        )(x)  # [B, g, g, w]
        x = x.reshape(B, -1, w)  # [B, g*g, w]

        scale = w**-0.5
        cls = self.param(
            "class_embedding", nn.initializers.normal(scale), (w,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, w)), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(scale),
            ((self.input_resolution // self.patch_size) ** 2 + 1, w),
        )
        if pos_embedding:
            if x.shape[1] != pos.shape[0]:
                pos_r = jax.image.resize(
                    pos[None, None], (1, 1, x.shape[1], w), method="bicubic"
                )[0, 0]
            else:
                pos_r = pos
            x = x + pos_r[None].astype(x.dtype)

        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                w, self.heads, name=f"resblock_{i}"
            )(x, None)
        ln_post = nn.LayerNorm(epsilon=1e-5, name="ln_post")
        token = ln_post(x[:, 1:, :]) if return_token else None
        x = ln_post(x[:, 0, :])
        proj = self.param(
            "proj", nn.initializers.normal(scale), (w, self.output_dim)
        )
        x = x @ proj.astype(x.dtype)
        if return_token:
            return x, token
        return x


class ResidualAttentionBlock(nn.Module):
    """Text transformer block with QuickGELU (reference src/DACLIP.py:364-387)."""

    d_model: int
    n_head: int

    @nn.compact
    def __call__(self, x, attn_mask=None):
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        B, L, C = y.shape
        qkv = dense(3 * C, name="attn_in_proj")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = C // self.n_head

        def heads(u):
            return u.reshape(B, L, self.n_head, hd).transpose(0, 2, 1, 3)

        q, k, v = map(heads, (q, k, v))
        sim = jnp.einsum("bhqd,bhkd->bhqk", q * hd**-0.5, k,
                         preferred_element_type=jnp.float32)
        if attn_mask is not None:
            sim = sim + attn_mask
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        x = x + dense(C, name="attn_out_proj")(out)

        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = dense(4 * C, name="mlp_c_fc")(y)
        y = quick_gelu(y)
        x = x + dense(C, name="mlp_c_proj")(y)
        return x


class TextTransformer(nn.Module):
    """Causal text transformer (reference src/DACLIP.py:390-398,531-538)."""

    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 77

    @nn.compact
    def __call__(self, x):
        L = x.shape[1]
        mask = jnp.triu(jnp.full((L, L), -jnp.inf), k=1)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, name=f"resblock_{i}"
            )(x, mask)
        return x


class CLIP(nn.Module):
    """CLIP (reference ``CLIP`` src/DACLIP.py:450-581).

    ``vision_layers`` dispatches the visual tower exactly like the reference
    ctor (src/DACLIP.py:469-487): a tuple builds the ``ModifiedResNet``
    (RN50-family), an int builds the ``VisionTransformer`` with
    ``vision_patch_size`` patches."""

    embed_dim: int = 1024
    image_resolution: int = 224
    # Tuple[int, ...] selects the ResNet tower, int the ViT (reference
    # src/DACLIP.py:469-487 makes the same isinstance dispatch)
    vision_layers: Any = (3, 4, 6, 3)
    vision_width: int = 64
    vision_patch_size: int = 32  # ViT only
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    def setup(self):
        if isinstance(self.vision_layers, (tuple, list)):
            self.visual = ModifiedResNet(
                layers=tuple(self.vision_layers),
                output_dim=self.embed_dim,
                heads=self.vision_width * 32 // 64,
                input_resolution=self.image_resolution,
                width=self.vision_width,
            )
        else:
            self.visual = VisionTransformer(
                input_resolution=self.image_resolution,
                patch_size=self.vision_patch_size,
                width=self.vision_width,
                layers=int(self.vision_layers),
                heads=self.vision_width // 64,
                output_dim=self.embed_dim,
            )
        self.transformer = TextTransformer(
            width=self.transformer_width,
            layers=self.transformer_layers,
            heads=self.transformer_heads,
            context_length=self.context_length,
        )
        self.token_embedding = nn.Embed(
            self.vocab_size,
            self.transformer_width,
            embedding_init=nn.initializers.normal(0.02),
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.transformer_width),
        )
        self.ln_final = nn.LayerNorm(epsilon=1e-5)
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(self.transformer_width**-0.5),
            (self.transformer_width, self.embed_dim),
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(1 / 0.07)),
            (),
        )

    def encode_image(self, image, pos_embedding: bool = False):
        return self.visual(image, pos_embedding=pos_embedding)

    def encode_text(self, text_ids):
        """text_ids: [B, 77] pre-tokenized (BPE ids)."""
        x = self.token_embedding(text_ids)
        x = x + self.positional_embedding[None]
        x = self.transformer(x)
        x = self.ln_final(x)
        eot = jnp.argmax(text_ids, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        return x @ self.text_projection

    def encode_prompt_embedding(self, prompt_embeds, eot_indices):
        """Run already-embedded prompts through the text tower
        (the ``PromptLearner.forward`` path, src/DACLIP.py:956-969)."""
        x = prompt_embeds + self.positional_embedding[None]
        x = self.transformer(x)
        x = self.ln_final(x)
        x = x[jnp.arange(x.shape[0]), eot_indices]
        return x @ self.text_projection

    def __call__(self, image, text_ids):
        """Returns (logits_per_image, image_features) as the reference's
        modified ``CLIP.forward`` does (src/DACLIP.py:560-581)."""
        image_features = self.encode_image(image)
        text_features = self.encode_text(text_ids)
        image_features = image_features / jnp.linalg.norm(
            image_features, axis=-1, keepdims=True
        )
        text_features = text_features / jnp.linalg.norm(
            text_features, axis=-1, keepdims=True
        )
        logits = jnp.exp(self.logit_scale) * image_features @ text_features.T
        return logits, image_features


class PromptLearner(nn.Module):
    """Learnable context around fixed CT prompts
    (reference src/DACLIP.py:895-969).

    Parameters: ``ctx`` [n_cls, n_ctx, width] (learned), plus frozen prompt
    token-embedding buffers ``token_prefix`` [n_cls, 1, width] and
    ``token_suffix`` [n_cls, suffix_len, width] filled by the checkpoint
    converter.  ``eot_indices`` are static attributes (position of the EOT
    token in each tokenized prompt; the default matches
    'high dose CT image..' / 'low dose CT noisy image..' with 16 ctx tokens).
    """

    n_cls: int = 2
    n_ctx: int = 16
    width: int = 512
    context_length: int = 77
    name_lens: Tuple[int, ...] = (3, 3)
    eot_indices: Tuple[int, ...] = (24, 25)

    @nn.compact
    def __call__(self, clip_model: CLIP):
        suffix_len = self.context_length - 1 - self.n_ctx
        ctx = self.param(
            "ctx", nn.initializers.normal(0.02),
            (self.n_cls, self.n_ctx, self.width),
        )
        prefix = self.param(
            "token_prefix", nn.initializers.normal(0.01),
            (self.n_cls, 1, self.width),
        )
        suffix = self.param(
            "token_suffix", nn.initializers.normal(0.01),
            (self.n_cls, suffix_len, self.width),
        )
        half = self.n_ctx // 2
        prompts = []
        for i in range(self.n_cls):
            nl = self.name_lens[i]
            prompts.append(
                jnp.concatenate(
                    [
                        prefix[i : i + 1],
                        ctx[i : i + 1, :half],
                        suffix[i : i + 1, :nl],
                        ctx[i : i + 1, half:],
                        suffix[i : i + 1, nl:],
                    ],
                    axis=1,
                )
            )
        prompts = jnp.concatenate(prompts, axis=0)
        return clip_model.encode_prompt_embedding(
            prompts, jnp.asarray(self.eot_indices)
        )


class CLIPIQA(nn.Module):
    """Dose-CLIP encoder (reference ``CLIPIQA`` src/DACLIP.py:1135-1221).

    ``__call__`` returns ``(dose_prob, dose_embedding, content_embedding)``:
    dose_prob [B, 1], dose_embedding [B, 1024] (L2-normalized head1 output),
    content_embedding [B, 256] (L2-normalized head2 output).
    """

    # the reference loads the stock 224-px RN50 and runs it on 512-px inputs
    # with pos_embedding=False (src/DADiff.py:590-600, src/DACLIP.py:1203)
    backbone_resolution: int = 224
    embed_dim: int = 1024
    # RN50 defaults; overridable for micro test/dryrun towers
    vision_layers: Tuple[int, ...] = (3, 4, 6, 3)
    vision_width: int = 64
    transformer_width: int = 512
    transformer_layers: int = 12
    transformer_heads: int = 8
    # EOT positions of the two tokenized prompts (reference derives them via
    # tokenized_prompts.argmax(-1), src/DACLIP.py:967; configurable so
    # tokenizer-bootstrapped or test towers can supply the real positions).
    # The (24, 25) default assumes the stock CLIP BPE splits 'CT' -> [c, t]
    # and '..' -> [., .] (1 SOT + 16 ctx + 7/8 name tokens); when a real
    # bpe_simple_vocab_16e6.txt.gz is available, callers should derive the
    # true positions via
    # founddiff_tpu.models.tokenizer.bootstrap_prompt_learner (which also
    # validates against this default) rather than trust it.
    prompt_eot_indices: Tuple[int, ...] = (24, 25)
    prompt_name_lens: Tuple[int, ...] = (3, 3)

    def setup(self):
        self.clip_model = CLIP(
            embed_dim=self.embed_dim,
            image_resolution=self.backbone_resolution,
            vision_layers=self.vision_layers,
            vision_width=self.vision_width,
            transformer_width=self.transformer_width,
            transformer_layers=self.transformer_layers,
            transformer_heads=self.transformer_heads,
        )
        self.prompt_learner = PromptLearner(
            width=self.transformer_width,
            eot_indices=self.prompt_eot_indices,
            name_lens=self.prompt_name_lens,
        )
        # head1: embed_dim -> 1024 -> embed_dim (reference Linear(1024,1024)
        # pairs with RN50's embed_dim=1024, src/DACLIP.py:1179-1188)
        self.head1_fc1 = dense(1024, name="head1_fc1")
        self.head1_fc2 = dense(self.embed_dim, name="head1_fc2")
        self.head2_fc1 = dense(1024, name="head2_fc1")
        self.head2_fc2 = dense(256, name="head2_fc2")

    def __call__(self, x):
        """x: [B, H, W, 3] in the model's input domain (the reference feeds
        the [-1,1]-normalized CT channel tripled to RGB *without* CLIP mean/std
        normalization, src/DADiff.py:692, src/DACLIP.py:1190-1193)."""
        text_features = self.prompt_learner(self.clip_model)  # [2, 1024]
        features = self.clip_model.encode_image(x, pos_embedding=False)

        image_features = self.head1_fc2(nn.relu(self.head1_fc1(features)))
        content = self.head2_fc2(nn.relu(self.head2_fc1(features)))
        content = content / jnp.linalg.norm(content, axis=-1, keepdims=True)

        image_features = image_features / jnp.linalg.norm(
            image_features, axis=-1, keepdims=True
        )
        text_features = text_features / jnp.linalg.norm(
            text_features, axis=-1, keepdims=True
        )
        # the reference builds a *fresh* logit scale here (a constant 1/0.07)
        # rather than using the trained one (src/DACLIP.py:1214-1216)
        logit_scale = jnp.exp(jnp.asarray(np.log(1 / 0.07), jnp.float32))
        logits = logit_scale * image_features @ text_features.T  # [B, 2]
        probs = jax.nn.softmax(logits.reshape(x.shape[0], -1, 2), axis=-1)
        dose_prob = probs[..., 0].mean(axis=1, keepdims=True)
        return dose_prob, image_features, content

"""SS2D (2-D selective scan) block and the adaLN-Zero Mamba block, in Flax.

TPU-native rebuild of the VMamba-style ``SS2D`` module
(reference src/emamba2.py:404-751) and the DiT-style ``Mamba_block``
(reference src/DADiff.py:453-488):

- the 4-direction decimated scan runs through the Pallas selective-scan
  kernel (:mod:`founddiff_tpu.ops`), with the per-direction projections as
  single stacked einsums (MXU-friendly [B,K,L,D] @ [K,C,D] contractions);
- dt/A/D parameters follow the reference's S4D-real init
  (src/emamba2.py:538-586);
- conditioning: the Dose-CLIP content embedding is projected and added
  before ``out_proj`` (src/emamba2.py:522-525, 748).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from founddiff_tpu.models.blocks import (
    CrossAttention,
    LNorm,
    TransposedAttention,
    dense,
    modulate,
)
from founddiff_tpu.models.init import make_torch_bias_init, torch_kernel_init
from founddiff_tpu.ops.selective_scan import (
    efficient_merge,
    efficient_scan,
    selective_scan,
)


def _dt_weight_init(dt_rank: int, dt_scale: float = 1.0):
    std = dt_rank**-0.5 * dt_scale

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -std, std)

    return init


def _dt_bias_init(dt_min=0.001, dt_max=0.1, dt_init_floor=1e-4):
    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, jnp.float32)
            * (math.log(dt_max) - math.log(dt_min))
            + math.log(dt_min)
        )
        dt = jnp.clip(dt, dt_init_floor, None)
        # inverse of softplus (reference src/emamba2.py:557-559)
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)

    return init


def _a_log_init(key, shape, dtype=jnp.float32):
    # S4D-real: A[d, n] = n+1 -> store log (reference src/emamba2.py:566-577)
    K, D, N = shape
    a = jnp.arange(1, N + 1, dtype=jnp.float32)
    return jnp.log(jnp.broadcast_to(a, (K, D, N))).astype(dtype)


class _DenseKernel(nn.Module):
    """Bare bias-free Dense kernel param (path ``<name>/kernel`` identical
    to :class:`founddiff_tpu.models.blocks.TorchDense` for the checkpoint
    converter) — lets the fused epilogue consume out_proj's weight without
    instantiating the dense module."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", torch_kernel_init, (self.in_features, self.features),
            jnp.float32,
        )


class _AffineParams(nn.Module):
    """Bare LayerNorm affine params (paths ``<name>/scale``, ``<name>/bias``
    stay identical to :class:`LNorm` for the checkpoint converter)."""

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


class _DWConvParams(nn.Module):
    """Bare depthwise-conv params (paths ``<name>/kernel``, ``<name>/bias``
    identical to :class:`founddiff_tpu.models.blocks.TorchConv` with
    ``feature_group_count == features`` for the checkpoint converter) — lets
    the unified block kernel consume the taps without instantiating the
    conv module."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param(
            "kernel", torch_kernel_init, (k, k, 1, self.features),
            jnp.float32,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", make_torch_bias_init(k * k), (self.features,),
                jnp.float32,
            )
        return kernel, bias


class SS2D(nn.Module):
    """2-D selective scan module (reference src/emamba2.py:404-751)."""

    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: Optional[int] = None  # None -> ceil(d_model / 16)
    d_conv: int = 3
    conv_bias: bool = True
    dropout: float = 0.0
    use_bias: bool = False
    step_size: int = 2
    context_dim: int = 256
    scan_impl: str = "auto"
    # 'v2' = decimated EfficientScan (shipped config, src/emamba2.py:690-708);
    # 'v0' = full 4-direction scan variant (src/emamba2.py:589-634)
    forward_type: str = "v2"
    # sequence parallelism: when a Mesh with a >1 'seq' axis is given, the
    # scan's L axis is sharded over it (shard_map + all-gathered shard
    # summaries, :mod:`founddiff_tpu.parallel.sequence`) — the TPU-native
    # answer to BASELINE config 5 / SURVEY §2.3 "shard the (H/2)(W/2) scan
    # dimension"; the reference is DP-only (src/DADiff.py:1546-1552)
    mesh: Optional[object] = None

    def _seq_shards(self) -> int:
        m = self.mesh
        if m is None or "seq" not in getattr(m, "axis_names", ()):
            return 1
        return int(m.shape["seq"])

    @nn.compact
    def __call__(self, x, c=None, deterministic: bool = True, gate=None,
                 residual=None, pre_norm=None):
        """x: [B, H, W, d_model]; c: [B, 1, context_dim] content embedding.

        ``gate`` [B, d_model] + ``residual`` [B, H, W, d_model] (both or
        neither): the MambaBlock tail ``residual + gate * SS2D(x)`` is
        computed HERE — on the fused TPU path it folds into the epilogue
        kernel together with out_proj, so the 2*d_model-channel epilogue
        output never round-trips HBM.

        ``pre_norm``: optional (ln_scale, ln_bias, mod_scale, mod_shift) —
        when given, ``x`` is the RAW block input and this module applies
        ``modulate(LayerNorm(x))`` itself.  On the TPU fast path the LN,
        in_proj, depthwise conv, and silu all fuse INTO the scan kernels
        (ops/experimental_unified.py ``ss2d_mamba_block``), so x1 and the conv'd scan
        input never touch HBM."""
        B, H, W, _ = x.shape
        assert (gate is None) == (residual is None)
        d_inner = int(self.ssm_ratio * self.d_model)
        R = self.dt_rank or -(-self.d_model // 16)
        N = self.d_state
        K = 4

        # conditioning projection (reference src/emamba2.py:522-525)
        if c is not None:
            local = nn.silu(
                dense(d_inner, use_bias=False, name="cond_proj")(c)
            )  # [B, 1, d_inner]

        impl = self.scan_impl
        if impl == "auto":
            impl = "pallas_fused" if jax.default_backend() == "tpu" else "chunked"
        # fused epilogue (merge+LN+silu-gate+cond in one pass) rides the
        # fused kernel path on even grids with the shipped v2 decimation;
        # the image/merge kernels hardcode step-2 decimation, so any other
        # step_size must fall through to the unfused path
        fuse_epilogue = (
            impl == "pallas_fused"
            and self.forward_type == "v2"
            and self.step_size == 2
            and H % 2 == 0
            and W % 2 == 0
            and self._seq_shards() == 1  # seq-sharded scans use the
            # projection-materializing path under shard_map
        )

        from founddiff_tpu.models.blocks import conv2d

        # fully-fused block path: the scan kernels produce the FINAL
        # MambaBlock output (epilogue + out_proj + adaLN gate + residual
        # in-kernel, z computed in-kernel from x via the MXU) — the z half
        # of in_proj, the direction sequences ys, and the separate epilogue
        # kernel never touch HBM (ops/ss2d_block.py)
        fold_proj = (
            gate is not None and not self.use_bias and self.dropout == 0.0
        )
        # unified whole-first-half kernel: LN+modulate, in_proj, dwconv,
        # silu, scans, epilogue — reads only raw x (ops/ss2d_block.py).
        # r4 NEGATIVE result, default OFF: in the full UNet it nets +8 ms
        # (222.9 vs 214.5 ms fwd) — the in-kernel LN/proj/dwconv costs ~2x
        # its XLA equivalent (XLA's conv emitter + fusion infrastructure
        # beat per-op Mosaic vector code for this pre-scan chain), more
        # than the removed ln_mod kernel + relayout copies give back.
        import os as _os

        if (
            _os.environ.get("FOUNDDIFF_UNIFIED", "0") == "1"
            and fuse_epilogue
            and fold_proj
            and pre_norm is not None
            and residual is x
            and self.d_conv == 3
        ):
            from founddiff_tpu.ops.experimental_unified import (
                mamba_block_ok,
                ss2d_mamba_block,
            )

            if mamba_block_ok(H, W, d_inner, N, self.d_model):
                in_w = _DenseKernel(
                    2 * d_inner, self.d_model, name="in_proj"
                )()
                dw_kernel, dw_bias = _DWConvParams(
                    d_inner, self.d_conv, self.conv_bias, name="dwconv"
                )()
                ln_scale, ln_bias = _AffineParams(d_inner, name="out_norm")()
                proj_kernel = _DenseKernel(
                    self.d_model, d_inner, name="out_proj"
                )()
                xw, dtw, dt_bias, A_logs, Ds = self._scan_params(
                    d_inner, R, N, K
                )
                return ss2d_mamba_block(
                    x, pre_norm[0], pre_norm[1], pre_norm[2], pre_norm[3],
                    in_proj_w=in_w, dw_kernel=dw_kernel, dw_bias=dw_bias,
                    x_proj_weight=xw, dt_projs_weight=dtw,
                    A=-jnp.exp(A_logs), Dskip=Ds, delta_bias=dt_bias,
                    out_ln_g=ln_scale, out_ln_b=ln_bias,
                    local=local[:, 0] if c is not None else None,
                    proj_w=proj_kernel, gate=gate,
                    d_inner=d_inner, dt_rank=R, d_state=N,
                    delta_softplus=True, eps_ln=1e-5, eps=1e-5,
                )

        if pre_norm is not None:
            from founddiff_tpu.ops.norm_pallas import layer_norm_modulated

            x = layer_norm_modulated(
                x, pre_norm[0], pre_norm[1], pre_norm[2], pre_norm[3],
                eps=1e-5,
            )

        if fuse_epilogue and fold_proj:
            from founddiff_tpu.ops.ss2d_block import (
                block_scan_ok,
                ss2d_image_block,
            )

            if block_scan_ok(H, W, d_inner, N):
                in_w = _DenseKernel(
                    2 * d_inner, self.d_model, name="in_proj"
                )()
                xs = jnp.einsum(
                    "bhwc,cd->bhwd", x, in_w[:, :d_inner].astype(x.dtype)
                )
                xs = conv2d(
                    d_inner, self.d_conv, padding="SAME",
                    feature_group_count=d_inner, use_bias=self.conv_bias,
                    name="dwconv",
                )(xs)
                # FOUNDDIFF_SILU=kernel moves the silu INSIDE the scan
                # kernels (drops this ~1.7 ms/scale XLA HBM pass; the
                # conv->Pallas relayout copy remains either way)
                silu_in_kernel = (
                    _os.environ.get("FOUNDDIFF_SILU", "xla") == "kernel"
                )
                if not silu_in_kernel:
                    xs = nn.silu(xs)
                ln_scale, ln_bias = _AffineParams(d_inner, name="out_norm")()
                proj_kernel = _DenseKernel(
                    self.d_model, d_inner, name="out_proj"
                )()
                xw, dtw, dt_bias, A_logs, Ds = self._scan_params(
                    d_inner, R, N, K
                )
                return ss2d_image_block(
                    x, xs, residual,
                    w_z=in_w[:, d_inner:], x_proj_weight=xw,
                    dt_projs_weight=dtw, A=-jnp.exp(A_logs), Dskip=Ds,
                    delta_bias=dt_bias, ln_g=ln_scale, ln_b=ln_bias,
                    local=local[:, 0] if c is not None else None,
                    proj_w=proj_kernel, gate=gate,
                    dt_rank=R, d_state=N, delta_softplus=True, eps=1e-5,
                    silu_input=silu_in_kernel,
                )

        xz = dense(2 * d_inner, use_bias=self.use_bias, name="in_proj")(x)
        xs, z = jnp.split(xz, 2, axis=-1)
        if not fuse_epilogue:
            z = nn.silu(z)  # fused path applies silu(z) inside the epilogue

        xs = conv2d(
            d_inner,
            self.d_conv,
            padding="SAME",
            feature_group_count=d_inner,
            use_bias=self.conv_bias,
            name="dwconv",
        )(xs)
        xs = nn.silu(xs)

        if fuse_epilogue:
            from founddiff_tpu.ops.scan_pallas import (
                image_scan_vmem_ok,
                selective_scan_image,
            )
            from founddiff_tpu.ops.ss2d_fused import (
                merge_ln_gate,
                merge_ln_gate_split,
            )

            ln_scale, ln_bias = _AffineParams(d_inner, name="out_norm")()
            cond_local = local[:, 0] if c is not None else None
            # fold out_proj + adaLN gate + residual add into the epilogue
            # when there is no bias/dropout in the way (the shipped config:
            # use_bias=False, dropout=0.0) — removes the Pallas->dense
            # relayout boundary and two elementwise image passes
            fold_proj = (
                gate is not None
                and not self.use_bias
                and self.dropout == 0.0
            )
            fold_kw = {}
            if fold_proj:
                proj_kernel = _DenseKernel(
                    self.d_model, d_inner, name="out_proj"
                )()
                fold_kw = dict(
                    proj_w=proj_kernel.astype(x.dtype),
                    gate=gate.astype(x.dtype),
                    residual_x=residual,
                )
            if image_scan_vmem_ok(H, W, d_inner, N):
                # image-direct path: decimation rides the scan kernels'
                # block DMA; merge+LN+silu-gate+cond fuse into the epilogue
                xw, dtw, dt_bias, A_logs, Ds = self._scan_params(
                    d_inner, R, N, K
                )
                ys_rows, ys_cols = selective_scan_image(
                    xs, xw, dtw, -jnp.exp(A_logs), Ds, dt_bias,
                    dt_rank=R, d_state=N, delta_softplus=True,
                )
                y = merge_ln_gate_split(
                    ys_rows, ys_cols, z, ln_scale, ln_bias, cond_local,
                    H=H, W=W, eps=1e-5, gate_silu=True, **fold_kw,
                )
            else:
                # deep scales: decimated fused kernel + joint epilogue
                ys = self._scan_core(
                    xs, H, W, d_inner, R, N, K, impl=impl, merge=False
                )
                y = merge_ln_gate(
                    ys, z, ln_scale, ln_bias, cond_local,
                    H=H, W=W, eps=1e-5, gate_silu=True, **fold_kw,
                )
            if fold_proj:
                return y  # out_proj/gate/residual already applied in-kernel
        else:
            ys = self._scan_core(xs, H, W, d_inner, R, N, K, impl=impl)
            y = LNorm(d_inner, eps=1e-5, name="out_norm")(ys)
            y = y * z
            if c is not None:
                # broadcast [B,1,1,d_inner] over H, W
                y = y + local[:, :, None, :]
        out = dense(self.d_model, use_bias=self.use_bias, name="out_proj")(y)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        if gate is not None:
            out = residual + gate[:, None, None, :].astype(out.dtype) * out
        return out

    def _scan_params(self, d_inner, R, N, K):
        """Stacked per-direction scan parameters
        (reference src/emamba2.py:498-586)."""
        x_proj_weight = self.param(
            "x_proj_weight",
            torch_kernel_init,
            (K, R + 2 * N, d_inner),
            jnp.float32,
        )
        dt_projs_weight = self.param(
            "dt_projs_weight", _dt_weight_init(R), (K, d_inner, R), jnp.float32
        )
        dt_projs_bias = self.param(
            "dt_projs_bias", _dt_bias_init(), (K, d_inner), jnp.float32
        )
        A_logs = self.param("A_logs", _a_log_init, (K, d_inner, N), jnp.float32)
        Ds = self.param("Ds", nn.initializers.ones, (K, d_inner), jnp.float32)
        return x_proj_weight, dt_projs_weight, dt_projs_bias, A_logs, Ds

    def _scan_core(self, x, H, W, d_inner, R, N, K, impl=None, merge=True):
        """cross_selective_scan (reference src/emamba2.py:295-367).
        ``merge=False`` returns the raw direction sequences [B, K, L, D] for
        the fused epilogue."""
        if self.forward_type == "v0":
            from founddiff_tpu.ops.selective_scan import cross_scan_v0

            xs = cross_scan_v0(x)  # [B, K, H*W, D]
        else:
            xs = efficient_scan(x, self.step_size)  # [B, K, L, D]

        (x_proj_weight, dt_projs_weight, dt_projs_bias, A_logs,
         Ds) = self._scan_params(d_inner, R, N, K)

        As = -jnp.exp(A_logs)
        if impl is None:
            impl = self.scan_impl
        if impl == "auto":
            impl = "pallas_fused" if jax.default_backend() == "tpu" else "chunked"
        if self._seq_shards() > 1:
            # sequence-parallel scan: L sharded over the mesh 'seq' axis,
            # batch over 'data'; the per-position projections shard freely,
            # the scan stitches shards via all-gathered (A_prod, h_end)
            # summaries (founddiff_tpu/parallel/sequence.py)
            from founddiff_tpu.parallel.sequence import (
                seq_sharded_selective_scan,
            )

            x_dbl = jnp.einsum(
                "bkld,kcd->bklc", xs, x_proj_weight.astype(xs.dtype)
            )
            dts, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=-1)
            dts = jnp.einsum(
                "bklr,kdr->bkld", dts, dt_projs_weight.astype(xs.dtype)
            )
            batch_axis = (
                "data"
                if "data" in self.mesh.axis_names
                and xs.shape[0] % int(self.mesh.shape["data"]) == 0
                else None
            )
            ys = seq_sharded_selective_scan(
                xs, dts, As, Bs, Cs, Ds, delta_bias=dt_projs_bias,
                mesh=self.mesh, axis="seq", batch_axis=batch_axis,
            )
        elif impl == "pallas_fused":
            # fused kernel: the x_dbl/dt projections run inside the scan so
            # delta/B/C never round-trip HBM
            from founddiff_tpu.ops.scan_pallas import selective_scan_pallas_fused

            ys = selective_scan_pallas_fused(
                xs, x_proj_weight, dt_projs_weight, As, Ds, dt_projs_bias,
                dt_rank=R, d_state=N, delta_softplus=True,
            )
        else:
            x_dbl = jnp.einsum(
                "bkld,kcd->bklc", xs, x_proj_weight.astype(xs.dtype)
            )
            dts, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=-1)
            dts = jnp.einsum(
                "bklr,kdr->bkld", dts, dt_projs_weight.astype(xs.dtype)
            )
            ys = selective_scan(
                xs,
                dts,
                As,
                Bs,
                Cs,
                Ds,
                delta_bias=dt_projs_bias,
                delta_softplus=True,
                impl=impl,
            )
        if not merge:
            return ys.astype(x.dtype)
        if self.forward_type == "v0":
            from founddiff_tpu.ops.selective_scan import cross_merge_v0

            y = cross_merge_v0(ys, H, W)
        else:
            y = efficient_merge(ys, H, W, self.step_size)
        return y.astype(x.dtype)


class PatchMerging2D(nn.Module):
    """VMamba downsampling: 2x2 neighborhood concat -> LayerNorm -> Linear
    (reference src/emamba2.py:377-401)."""

    dim: int
    out_dim: int = -1

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        out = self.out_dim if self.out_dim > 0 else 2 * self.dim
        return dense(out, use_bias=False, name="reduction")(x)


class MambaBlock(nn.Module):
    """adaLN-Zero conditioned SS2D + channel-attention block
    (reference ``Mamba_block`` src/DADiff.py:453-488)."""

    hidden_size: int
    d_state: int
    expand: float = 2.0
    dropout: float = 0.0
    cross: bool = False
    time_emb_dim: Optional[int] = None
    scan_impl: str = "auto"
    mesh: Optional[object] = None  # sequence-parallel mesh (see SS2D.mesh)

    @nn.compact
    def __call__(self, x, c, t, deterministic: bool = True):
        """x: [B,H,W,hidden]; c: [B,1,256]; t: [B,time_emb_dim]."""
        h = self.hidden_size
        # zero-init adaLN (reference src/DADiff.py:473-474)
        mod = nn.Dense(
            6 * h,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="adaLN",
        )
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
            mod(nn.silu(t)), 6, axis=-1
        )

        from founddiff_tpu.ops.norm_pallas import layer_norm_modulated

        # norm1 LN + adaLN modulation handed to SS2D (pre_norm): on the TPU
        # fast path it fuses INTO the scan kernels together with in_proj,
        # the depthwise conv, silu, the epilogue, out_proj, the adaLN gate
        # and the residual add — the whole first half of the block is two
        # Pallas kernels reading only raw x
        n1_scale, n1_bias = _AffineParams(h, name="norm1")()
        x = SS2D(
            d_model=h,
            d_state=self.d_state,
            ssm_ratio=self.expand,
            dropout=self.dropout,
            scan_impl=self.scan_impl,
            mesh=self.mesh,
            name="mamba",
        )(
            x, c, deterministic=deterministic, gate=gate_msa, residual=x,
            pre_norm=(n1_scale, n1_bias, scale_msa, shift_msa),
        )

        impl = self.scan_impl
        if impl == "auto":
            impl = "pallas_fused" if jax.default_backend() == "tpu" else "chunked"
        if not self.cross:
            from founddiff_tpu.ops.attn_block import attn_block_route

            B, H, W, _ = x.shape
            # routing policy (not just capability): C<128 scales run the
            # XLA composition by default — see attn_block_route docstring
            if impl == "pallas_fused" and attn_block_route(H, W, h):
                # whole second half (LN+modulate+TransposedAttention+gated
                # residual) as one Pallas kernel per image (ops/attn_block)
                return TransposedAttention(
                    dim=h, heads=max(1, h // 32), name="attn_blk"
                )(x, c, fused_mod=(scale_mlp, shift_mlp, gate_mlp))
        x2 = layer_norm_modulated(
            x, None, None, scale_mlp, shift_mlp, eps=1e-6
        )
        if self.cross:
            attn_out = CrossAttention(query_dim=h, name="attn_blk")(
                x2, c, deterministic=deterministic
            )
        else:
            attn_out = TransposedAttention(
                dim=h, heads=max(1, h // 32), name="attn_blk"
            )(x2, c)
        x = x + gate_mlp[:, None, None, :] * attn_out
        return x

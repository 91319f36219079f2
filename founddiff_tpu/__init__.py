"""founddiff_tpu — a TPU-native (JAX / Flax / Pallas) rebuild of FoundDiff.

FoundDiff ("Foundational Diffusion Model for Generalizable Low-Dose CT
Denoising") trains and samples a residual diffusion model (RDDM-style) whose
UNet denoiser replaces attention with 2-D selective-scan (Mamba/VMamba) blocks
conditioned by a frozen Dose-CLIP encoder.

This package is a from-scratch TPU-first implementation with the same
capability surface as the PyTorch reference (hao1635/FoundDiff):

- ``founddiff_tpu.diffusion``  — residual + gaussian diffusion processes,
  schedules, ``lax.scan`` DDPM/DDIM samplers.
- ``founddiff_tpu.models``     — Flax denoiser UNets (FoundDiff UNet with
  SS2D/adaLN blocks, the vanilla DDPM UNet) and the Dose-CLIP tower.
- ``founddiff_tpu.ops``        — Pallas TPU kernels (selective scan, flash
  attention) plus pure-JAX metrics (SSIM/PSNR/RMSE) and wavelet/Sobel losses.
- ``founddiff_tpu.parallel``   — device mesh / sharding utilities (data
  parallel via ``jax.sharding``, sequence-sharded scan for volume inference).
- ``founddiff_tpu.data``       — CT slice datasets (Mayo 2016/2020), HU
  windowing, paired augmentation, prefetching loaders.
- ``founddiff_tpu.train``      — Trainer (jitted train step, EMA, Orbax
  checkpointing, periodic sampling/eval).
"""

__version__ = "0.1.0"

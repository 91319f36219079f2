from founddiff_tpu.ops.metrics import (
    compute_psnr,
    compute_rmse,
    compute_ssim,
    slice_metrics,
)
from founddiff_tpu.ops.losses import bmc_loss, grad_loss, sobel, wt_decomp
from founddiff_tpu.ops.selective_scan import (
    cross_merge_v0,
    cross_scan_v0,
    efficient_merge,
    efficient_scan,
    flops_selective_scan,
    selective_scan,
    selective_scan_chunked,
    selective_scan_ref,
)
from founddiff_tpu.ops.scan_pallas import selective_scan_pallas
from founddiff_tpu.ops.attention_pallas import flash_attention

__all__ = [
    "bmc_loss",
    "compute_psnr",
    "compute_rmse",
    "compute_ssim",
    "cross_merge_v0",
    "cross_scan_v0",
    "efficient_merge",
    "efficient_scan",
    "flash_attention",
    "flops_selective_scan",
    "grad_loss",
    "selective_scan",
    "selective_scan_chunked",
    "selective_scan_pallas",
    "selective_scan_ref",
    "slice_metrics",
    "sobel",
    "wt_decomp",
]

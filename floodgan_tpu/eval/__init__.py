from floodgan_tpu.eval.metrics import (
    MaskMetricsAccumulator,
    image_pair_metrics,
    ms_ssim,
    psnr,
    ssim,
)

__all__ = [
    "MaskMetricsAccumulator",
    "image_pair_metrics",
    "ms_ssim",
    "psnr",
    "ssim",
]

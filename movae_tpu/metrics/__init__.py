"""Metrics suite: pixel (SSIM/PSNR/SSNR), perceptual (LPIPS), feature-space
(FID/KID/IS/precision-recall), and hypervolume."""

from movae_tpu.metrics.features import (  # noqa: F401
    calculate_fid,
    calculate_inception_score,
    calculate_kid,
    extract_inception_features,
    fid_from_features,
    kid_from_features,
    precision_recall_from_features,
)
from movae_tpu.metrics.hv import HVIndicator, build_hv_indicator, hypervolume  # noqa: F401
from movae_tpu.metrics.pixel import psnr, ssim, ssnr  # noqa: F401

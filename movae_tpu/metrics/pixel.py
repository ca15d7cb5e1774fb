"""Pixel-space reconstruction metrics: SSIM / PSNR / SSNR (jitted).

JAX re-implementation of the reference metrics
(/root/reference/utils/metrics.py:14-203): 11x11 Gaussian-window SSIM with
the same C1/C2 constants and [-1,1] -> [0,1] auto-ranging, per-image PSNR and
SSNR in dB with the same clamps. Images are NHWC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    g = g / g.sum()
    w = np.outer(g, g).astype(np.float32)
    return w


def _auto_range(img: Array) -> Array:
    img = img.astype(jnp.float32)
    img = jnp.where(jnp.min(img) < 0, (img + 1.0) / 2.0, img)
    return jnp.clip(img, 0.0, 1.0)


def _depthwise_blur(img: Array, window: Array) -> Array:
    c = img.shape[-1]
    kernel = jnp.broadcast_to(window[:, :, None, None],
                              window.shape + (1, 1))
    kernel = jnp.tile(kernel, (1, 1, 1, c))  # HWIO with feature_group_count
    return jax.lax.conv_general_dilated(
        img, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def ssim(img1: Array, img2: Array, window_size: int = 11,
         size_average: bool = True) -> Array:
    """SSIM (metrics.py:14-80); NHWC inputs in [0,1] or [-1,1]."""
    img1, img2 = _auto_range(img1), _auto_range(img2)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    w = jnp.asarray(_gaussian_window(window_size))
    mu1, mu2 = _depthwise_blur(img1, w), _depthwise_blur(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _depthwise_blur(img1 * img1, w) - mu1_sq
    s2 = _depthwise_blur(img2 * img2, w) - mu2_sq
    s12 = _depthwise_blur(img1 * img2, w) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def psnr(img1: Array, img2: Array, max_val: float = 1.0) -> Array:
    """PSNR in dB, mean over batch (metrics.py:157-203)."""
    img1, img2 = _auto_range(img1), _auto_range(img2)
    mse = jnp.mean(jnp.square(img1 - img2), axis=(1, 2, 3))
    mse = jnp.clip(mse, min=1e-10)
    vals = 20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(mse)
    return jnp.mean(vals)


def ssnr(img1: Array, img2: Array) -> Array:
    """Signal-to-noise ratio in dB (metrics.py:109-154)."""
    img1, img2 = _auto_range(img1), _auto_range(img2)
    signal = jnp.clip(jnp.var(img1, axis=(1, 2, 3)), min=1e-10)
    noise = jnp.clip(jnp.mean(jnp.square(img1 - img2), axis=(1, 2, 3)),
                     min=1e-10)
    return jnp.mean(10.0 * jnp.log10(signal / noise))

"""Torch-exact bicubic image resize as separable weight-matrix matmuls.

The reference preprocesses every image entering the Inception tower with
``torchvision.transforms.functional.resize(batch, 299, BICUBIC,
antialias=True)`` (/root/reference/utils/metrics.py:549-553), which on
tensors is ``torch.nn.functional.interpolate(mode="bicubic",
antialias=True)``. ``jax.image.resize(method="cubic")`` uses the Keys
kernel with A=-0.5 and different windowing, so its output does NOT match
torch — a silent numerical divergence in the single most
implementation-sensitive spot of FID.

This module reproduces torch's two bicubic paths bit-for-bit (verified
against ``torch.nn.functional.interpolate`` to ~1e-15 in f64, see
tests/test_metric_tower_oracle.py):

- ``antialias=False``: classic cubic convolution, A=-0.75, 4 taps at
  ``floor(c)-1..+2`` around ``c = scale*(i+0.5)-0.5``, unnormalized
  weights, border-clamped indices (ATen ``upsample_bicubic2d``).
- ``antialias=True``: PIL-style filter, A=-0.5, window half-width
  ``2*max(scale,1)`` around ``c = scale*(i+0.5)``, weights normalized to
  sum 1 (ATen ``_upsample_bicubic2d_aa``; torch applies this path for
  upscaling too, with filterscale clamped to 1).

Because every shape in the pipeline is static under jit, the resample is
expressed as two dense (out,in) weight matrices built in numpy at trace
time and contracted with einsum — two matmuls that XLA maps straight onto
the MXU, instead of the gather soup a direct translation would produce.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray, A: float) -> np.ndarray:
    """Cubic convolution kernel with coefficient A (vectorized, f64)."""
    x = np.abs(x)
    out = np.where(
        x <= 1.0,
        ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * A, 0.0))
    return out


def _triangle(x: np.ndarray) -> np.ndarray:
    """Bilinear (triangle) kernel (PIL BILINEAR filter)."""
    return np.maximum(0.0, 1.0 - np.abs(x))


@lru_cache(maxsize=64)
def _weight_matrix(in_size: int, out_size: int, antialias: bool,
                   kernel: str = "bicubic") -> np.ndarray:
    """(out_size, in_size) resampling matrix, float32.

    ``kernel="bilinear"`` reproduces torch's two bilinear paths the same
    way the bicubic pair does: antialias=True is ATen
    ``_upsample_bilinear2d_aa`` (PIL triangle filter, support 1*filterscale,
    normalized weights — torchvision's DEFAULT interpolation for
    ``TF.resize`` on tensors, which the reference's Inception-Score
    preprocessing uses, utils/metrics.py:873-875); antialias=False is
    classic ``upsample_bilinear2d`` with align_corners=False (2 taps at
    floor(c), c = scale*(i+0.5)-0.5, border-clamped)."""
    scale = in_size / out_size
    W = np.zeros((out_size, in_size), np.float64)
    if antialias:
        # PIL path: normalized window, filterscale >= 1
        fs = max(scale, 1.0)
        support = (1.0 if kernel == "bilinear" else 2.0) * fs
        for i in range(out_size):
            center = scale * (i + 0.5)
            jmin = max(int(center - support + 0.5), 0)
            jmax = min(int(center + support + 0.5), in_size)
            j = np.arange(jmin, jmax)
            u = (j - center + 0.5) / fs
            w = _triangle(u) if kernel == "bilinear" else _cubic(u, -0.5)
            W[i, jmin:jmax] = w / w.sum()
    elif kernel == "bilinear":
        # classic path: 2 taps, align_corners=False, clamped indices
        for i in range(out_size):
            c = scale * (i + 0.5) - 0.5
            j0 = int(np.floor(c))
            t = c - j0
            for off, w in ((0, 1.0 - t), (1, t)):
                W[i, int(np.clip(j0 + off, 0, in_size - 1))] += w
    else:
        # classic path: A=-0.75, 4 unnormalized taps, clamped indices
        for i in range(out_size):
            c = scale * (i + 0.5) - 0.5
            j0 = int(np.floor(c))
            t = c - j0
            offs = np.arange(-1, 3)
            w = _cubic(offs - t, -0.75)
            j = np.clip(j0 + offs, 0, in_size - 1)
            np.add.at(W[i], j, w)
    return W.astype(np.float32)


def resize_bicubic(x: jnp.ndarray, out_h: int, out_w: int,
                   antialias: bool = True) -> jnp.ndarray:
    """Bicubic-resize an NHWC batch to (out_h, out_w), matching
    ``torch.nn.functional.interpolate(mode='bicubic', antialias=...)``.

    jit-compatible (static shapes); f32 accumulation.
    """
    return _resize(x, out_h, out_w, antialias, "bicubic")


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int,
                    antialias: bool = True) -> jnp.ndarray:
    """Bilinear-resize an NHWC batch to (out_h, out_w), matching
    ``torch.nn.functional.interpolate(mode='bilinear', antialias=...,
    align_corners=False)`` — the torchvision-default interpolation the
    reference's IS preprocessing uses (utils/metrics.py:873-875)."""
    return _resize(x, out_h, out_w, antialias, "bilinear")


def _resize(x, out_h, out_w, antialias, kernel):
    b, h, w, c = x.shape
    x = x.astype(jnp.float32)
    if h != out_h:
        Wh = jnp.asarray(_weight_matrix(h, out_h, antialias, kernel))
        x = jnp.einsum("oh,bhwc->bowc", Wh, x)
    if w != out_w:
        Ww = jnp.asarray(_weight_matrix(w, out_w, antialias, kernel))
        x = jnp.einsum("ow,bhwc->bhoc", Ww, x)
    return x

"""Sobel edge losses for the gradient-guided (GG) model family.

JAX/NHWC re-implementation of the reference's Sobel-based objectives
(/root/reference/models/gg_vae.py:125-222, gg_vq_vae.py:124-272): the
edge-weighted pixel loss and every edge-matching variant. Depthwise 3x3
convs fuse trivially in XLA (SURVEY.md §2.6 #5).

Variant naming note: GG-VAE archs use version numbers {1,2,3,5,6} mapped to
magnitude/normalized/angle/cosine/binary losses (gg_vae.py:57-63), while
GG-VQ-VAE archs use {v1..v8} mapped onto an overlapping but differently
numbered set (gg_vq_vae.py:65-89). Both tables are reproduced here.
The reference's GG-VAE v6 contains a live typo (``F.mse_losss``,
gg_vae.py:220) that crashes if selected; we implement the evidently intended
binary-edge MSE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
EPS = 1e-8

_SOBEL_X = np.array([[-1.0, 0.0, 1.0],
                     [-2.0, 0.0, 2.0],
                     [-1.0, 0.0, 1.0]], np.float32)
_SOBEL_Y = np.array([[-1.0, -2.0, -1.0],
                     [0.0, 0.0, 0.0],
                     [1.0, 2.0, 1.0]], np.float32)


def sobel_gradients(x: Array):
    """Depthwise Sobel x/y gradients on NHWC images -> (gx, gy)."""
    c = x.shape[-1]
    kx = jnp.asarray(np.tile(_SOBEL_X[:, :, None, None], (1, 1, 1, c)))
    ky = jnp.asarray(np.tile(_SOBEL_Y[:, :, None, None], (1, 1, 1, c)))
    x32 = x.astype(jnp.float32)

    def dw(k):
        return jax.lax.conv_general_dilated(
            x32, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)

    return dw(kx), dw(ky)


def _smooth_l1(a: Array, b: Array, beta: float = 1.0) -> Array:
    d = jnp.abs(a - b)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def _mag(gx: Array, gy: Array) -> Array:
    return jnp.sqrt(gx * gx + gy * gy + EPS)


def edge_weighted_pixel_loss(inputs: Array, recons: Array) -> Array:
    """gradient_guided_loss: input-edge-magnitude-weighted MSE
    (gg_vae.py:125-138, gg_vq_vae.py:150-162)."""
    gx, gy = sobel_gradients(inputs)
    w = jnp.max(_mag(gx, gy), axis=-1)  # max over channels (NHWC)
    w = w / (jnp.max(w) + EPS)
    pixel = jnp.square(recons.astype(jnp.float32) - inputs.astype(jnp.float32))
    return jnp.mean(w[..., None] * pixel)


def edge_matching_signed_mse(inputs: Array, recons: Array) -> Array:
    """MSE on signed gradients (gg_vq_vae.py edge_matching_loss_v1)."""
    igx, igy = sobel_gradients(inputs)
    rgx, rgy = sobel_gradients(recons)
    return jnp.mean(jnp.square(rgx - igx)) + jnp.mean(jnp.square(rgy - igy))


def edge_matching_magnitude(inputs: Array, recons: Array) -> Array:
    """Smooth-L1 on gradient magnitudes (gg_vae.py:140-156,
    gg_vq_vae.py v2)."""
    igx, igy = sobel_gradients(inputs)
    rgx, rgy = sobel_gradients(recons)
    return _smooth_l1(_mag(rgx, rgy), _mag(igx, igy))


def edge_matching_normalized(inputs: Array, recons: Array) -> Array:
    """Smooth-L1 on max-normalized magnitudes (gg_vae.py:158-173,
    gg_vq_vae.py v3)."""
    igx, igy = sobel_gradients(inputs)
    rgx, rgy = sobel_gradients(recons)
    gt, gp = _mag(igx, igy), _mag(rgx, rgy)
    return _smooth_l1(gp / (jnp.max(gp) + EPS), gt / (jnp.max(gt) + EPS))


def edge_matching_angle(inputs: Array, recons: Array) -> Array:
    """Smooth-L1 on atan2 gradient angles (gg_vae.py:176-189,
    gg_vq_vae.py v4)."""
    igx, igy = sobel_gradients(inputs)
    rgx, rgy = sobel_gradients(recons)
    return _smooth_l1(jnp.arctan2(rgy, rgx), jnp.arctan2(igy, igx))


def edge_matching_masked(inputs: Array, recons: Array) -> Array:
    """Smooth-L1 on magnitudes masked above the target mean
    (gg_vq_vae.py v5/edge_matching_loss_v5)."""
    igx, igy = sobel_gradients(inputs)
    rgx, rgy = sobel_gradients(recons)
    gt, gp = _mag(igx, igy), _mag(rgx, rgy)
    mask = (gt > jnp.mean(gt)).astype(jnp.float32)
    return _smooth_l1(gp * mask, gt * mask)


def edge_matching_cosine(inputs: Array, recons: Array) -> Array:
    """1 - cosine similarity of unit gradient vectors (gg_vae.py:191-207,
    gg_vq_vae.py v6)."""
    igx, igy = sobel_gradients(inputs)
    rgx, rgy = sobel_gradients(recons)
    gt = jnp.stack([igx, igy], axis=-1)
    gp = jnp.stack([rgx, rgy], axis=-1)
    # torch F.normalize(eps=1e-12): clamp norm, not norm+eps
    gt_n = gt / jnp.clip(jnp.linalg.norm(gt, axis=-1, keepdims=True),
                         min=1e-12)
    gp_n = gp / jnp.clip(jnp.linalg.norm(gp, axis=-1, keepdims=True),
                         min=1e-12)
    cos = jnp.sum(gt_n * gp_n, axis=-1)
    return 1.0 - jnp.mean(cos)


def edge_matching_binary(inputs: Array, recons: Array) -> Array:
    """MSE on thresholded binary edge maps (gg_vq_vae.py v8/
    edge_matching_loss_v7; also the intended GG-VAE v6, whose reference
    implementation has a fatal typo at gg_vae.py:220)."""
    igx, igy = sobel_gradients(inputs)
    rgx, rgy = sobel_gradients(recons)
    te = (_mag(igx, igy) > 0.5).astype(jnp.float32)
    pe = (_mag(rgx, rgy) > 0.5).astype(jnp.float32)
    return jnp.mean(jnp.square(pe - te))


# --- dispatch tables -------------------------------------------------------

# GG-VAE arch version -> edge-matching fn (gg_vae.py:57-63)
GG_VAE_EDGE_FNS = {
    1: edge_matching_magnitude,
    2: edge_matching_normalized,
    3: edge_matching_angle,
    5: edge_matching_cosine,
    6: edge_matching_binary,
}

# GG-VQ-VAE arch version -> edge-matching fn (gg_vq_vae.py:65-89)
GG_VQVAE_EDGE_FNS = {
    "v2": edge_matching_signed_mse,
    "v3": edge_matching_magnitude,
    "v4": edge_matching_normalized,
    "v5": edge_matching_angle,
    "v6": edge_matching_masked,
    "v7": edge_matching_cosine,
    "v8": edge_matching_binary,
}

"""Objective (loss) library.

JAX re-implementation of the reference objective library
(/root/reference/utils/objectives.py:6-144): per-pixel-mean reconstruction
losses (mse/bce/l1/smooth_l1/perceptual), their per-image-sum variants, and
the analytic Gaussian KL divergence.

All functions are pure ``(inputs, recons) -> scalar`` (or ``(mu, log_var) ->
scalar``) and safe to use under ``jax.jit`` / ``jax.vjp``.

Images are NHWC float arrays (the TPU-native layout; the torch reference
uses NCHW but every objective here is layout-agnostic except perceptual).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# torch.nn.functional.binary_cross_entropy clamps log() at -100; mirror that
# so bce values match the reference semantics for saturated probabilities.
_BCE_LOG_CLAMP = -100.0


def mse_per_pixel_mean(inputs: Array, recons: Array) -> Array:
    """Mean squared error, mean over every element (objectives.py:95-97)."""
    d = recons.astype(jnp.float32) - inputs.astype(jnp.float32)
    return jnp.mean(jnp.square(d))


def mse_per_image_sum(inputs: Array, recons: Array) -> Array:
    """MSE summed over features, mean over batch (objectives.py:84-86)."""
    d = recons.astype(jnp.float32) - inputs.astype(jnp.float32)
    return jnp.sum(jnp.square(d)) / inputs.shape[0]


def mse_total_batch_sum_scaled(inputs: Array, recons: Array) -> Array:
    """Scaled total MSE (objectives.py:89-91)."""
    d = (recons.astype(jnp.float32) - inputs.astype(jnp.float32)) * 255.0
    return jnp.sum(jnp.square(d)) / 255.0


def _bce_elementwise(inputs: Array, recons: Array) -> Array:
    p = recons.astype(jnp.float32)
    t = inputs.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(p), _BCE_LOG_CLAMP)
    log_1mp = jnp.maximum(jnp.log1p(-p), _BCE_LOG_CLAMP)
    return -(t * log_p + (1.0 - t) * log_1mp)


def bce_per_pixel_mean(inputs: Array, recons: Array) -> Array:
    """Binary cross entropy on probabilities, mean reduction (objectives.py:108-110)."""
    return jnp.mean(_bce_elementwise(inputs, recons))


def bce_per_image_sum(inputs: Array, recons: Array) -> Array:
    """BCE summed over features, mean over batch (objectives.py:103-105)."""
    return jnp.sum(_bce_elementwise(inputs, recons)) / inputs.shape[0]


def _bce_logits_elementwise(inputs: Array, logits: Array) -> Array:
    x = logits.astype(jnp.float32)
    t = inputs.astype(jnp.float32)
    # Numerically-stable BCE-with-logits: max(x,0) - x*t + log(1+exp(-|x|))
    return jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def bce_with_logits_per_pixel_mean(inputs: Array, recons: Array) -> Array:
    """BCE with logits, mean reduction (objectives.py:117-119)."""
    return jnp.mean(_bce_logits_elementwise(inputs, recons))


def bce_with_logits_per_image_sum(inputs: Array, recons: Array) -> Array:
    """BCE with logits, per-image sum (objectives.py:112-114)."""
    return jnp.sum(_bce_logits_elementwise(inputs, recons)) / inputs.shape[0]


def laplacian_per_pixel_mean(inputs: Array, recons: Array) -> Array:
    """L1 loss, mean reduction (objectives.py:129-131)."""
    return jnp.mean(jnp.abs(recons.astype(jnp.float32) - inputs.astype(jnp.float32)))


def laplacian_per_image_sum(inputs: Array, recons: Array) -> Array:
    """L1 loss summed over features, mean over batch (objectives.py:124-126)."""
    return jnp.sum(jnp.abs(recons.astype(jnp.float32) - inputs.astype(jnp.float32))) / inputs.shape[0]


def smooth_l1_per_pixel_mean(inputs: Array, recons: Array, beta: float = 1.0) -> Array:
    """Smooth-L1 (Huber, beta=1 to match torch default), mean reduction (objectives.py:134-136)."""
    d = jnp.abs(recons.astype(jnp.float32) - inputs.astype(jnp.float32))
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def kl_divergence(mu: Array, log_var: Array) -> Array:
    """D_KL(N(mu, e^log_var) || N(0, I)): sum over latents, mean over batch
    (objectives.py:141-144)."""
    mu = mu.astype(jnp.float32)
    log_var = log_var.astype(jnp.float32)
    kl = -0.5 * jnp.sum(1.0 + log_var - jnp.square(mu) - jnp.exp(log_var), axis=1)
    return jnp.mean(kl)


def integer_cross_entropy(logits: Array, labels: Array) -> Array:
    """Mean CE over integer labels: ``mean(logsumexp(l) - l[label])``, the
    prior-training loss (reference main.py:1002, F.cross_entropy).

    Scatter-free by construction: ``optax.softmax_cross_entropy_with_
    integer_labels`` picks the label logit with ``take_along_axis``, whose
    VJP is an XLA scatter — serialized per row on TPU. Selecting via a
    one-hot multiply keeps the backward a pure softmax-minus-one-hot
    elementwise fusion; values and gradients are bitwise-equal to the optax
    form (tested)."""
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    picked = jnp.sum(
        jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
        * logits, axis=-1)
    return jnp.mean(lse - picked)


# ---------------------------------------------------------------------------
# Registry: recons_objective name -> (fn, inferred activation)
# Mirrors get_recon_obj_and_activation (objectives.py:6-43).
# ---------------------------------------------------------------------------

VALID_RECONS_OBJECTIVES = ("mse", "bce", "l1", "smooth_l1", "perceptual")

ReconFn = Callable[[Array, Array], Array]


def get_recon_obj_and_activation(
    recons_objective: str,
    recons_activation: Optional[str] = "tanh",
    use_logits: bool = False,
    perceptual_fn: Optional[ReconFn] = None,
) -> Tuple[Optional[ReconFn], str]:
    """Resolve a reconstruction objective name to ``(loss_fn, activation)``.

    Mirrors the reference dispatch (objectives.py:6-43): mse/l1/smooth_l1/
    perceptual default the decoder activation to ``tanh``; bce forces
    ``sigmoid`` (or ``none`` with ``use_logits``).

    For ``"perceptual"``, the loss needs VGG16 features which live inside the
    model (models embed a VGG tower submodule); callers may pass a bound
    ``perceptual_fn`` or receive ``None`` and wire it at the model level.
    """
    name = recons_objective.lower()
    if name not in VALID_RECONS_OBJECTIVES:
        raise ValueError(
            f"recons_objective must be one of {VALID_RECONS_OBJECTIVES}, got {name}"
        )
    if name == "mse":
        return mse_per_pixel_mean, recons_activation or "tanh"
    if name == "bce":
        if use_logits:
            return bce_with_logits_per_pixel_mean, "none"
        return bce_per_pixel_mean, "sigmoid"
    if name == "l1":
        return laplacian_per_pixel_mean, recons_activation or "tanh"
    if name == "smooth_l1":
        return smooth_l1_per_pixel_mean, recons_activation or "tanh"
    # perceptual
    return perceptual_fn, recons_activation or "tanh"

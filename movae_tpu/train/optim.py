"""Optimizers and per-epoch LR schedules (optax).

Mirrors the reference's optimizer/scheduler surface
(/root/reference/main.py:1169-1189): sgd/adam/adamw/rmsprop with torch
hyperparameter semantics (weight decay as L2-on-gradient for non-AdamW), and
cosine / multi_step / exponential schedulers stepped **per epoch** (torch
calls ``scheduler.step()`` once per epoch, main.py:1397) — here expressed as
a step-indexed optax schedule with ``steps_per_epoch`` baked in.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import optax


def lr_schedule(
    base_lr: float,
    scheduler: Optional[str],
    epochs: int,
    steps_per_epoch: int,
    lr_min: float = 0.0,
    gamma: float = 0.1,
    milestones: Optional[Sequence[int]] = None,
):
    """Return an optax schedule fn step -> lr with torch per-epoch stepping."""
    spe = max(int(steps_per_epoch), 1)

    if scheduler is None or scheduler == "none":
        return lambda step: base_lr
    if scheduler == "cosine":
        def fn(step):
            epoch = step // spe
            t = jnp.minimum(epoch, epochs) / max(epochs, 1)
            return lr_min + (base_lr - lr_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        return fn
    if scheduler == "multi_step":
        ms = jnp.asarray(sorted(milestones or []), jnp.int32)
        def fn(step):
            epoch = step // spe
            k = jnp.sum((ms <= epoch).astype(jnp.int32))
            return base_lr * (gamma ** k)
        return fn
    if scheduler == "exponential":
        def fn(step):
            epoch = step // spe
            return base_lr * (gamma ** epoch)
        return fn
    raise ValueError(f"Scheduler {scheduler} not supported")


def build_optimizer(
    name: str,
    schedule,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = None,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Optimizer matching the reference dispatch (main.py:1169-1178), with
    optional global-norm clipping (main.py:211-212) fused into the chain.

    ``eps`` is the adaptive-denominator epsilon (torch default 1e-8 for all
    three adaptive optimizers); exposed so numerical-equivalence tests can
    raise it — at eps=1e-8 an element whose true gradient is below float32
    cross-framework noise gets a full ±lr*sign(noise) step, which makes
    bitwise-independent implementations diverge by 2*lr/step by construction.
    """
    name = name.lower()
    parts = []
    if max_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(max_grad_norm))

    if name == "sgd":
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=False))
        parts.append(optax.scale_by_learning_rate(schedule))
    elif name == "adam":
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=eps))
        parts.append(optax.scale_by_learning_rate(schedule))
    elif name == "adamw":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=eps))
        parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_learning_rate(schedule))
    elif name == "rmsprop":
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        # torch RMSprop divides by (sqrt(nu) + eps); optax's default puts
        # eps inside the sqrt, which shrinks early/flat-gradient steps by
        # up to 1e4x relative to the reference
        parts.append(optax.scale_by_rms(decay=0.99, eps=eps,
                                        eps_in_sqrt=False))
        parts.append(optax.scale_by_learning_rate(schedule))
    else:
        raise ValueError(f"Optimizer {name} not supported")
    return optax.chain(*parts)

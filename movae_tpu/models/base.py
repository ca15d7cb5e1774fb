"""Base model contract for the MO-VAE TPU model zoo.

Every model in the zoo follows the same contract as the reference models
(/root/reference/models/vae.py:49-51, vq_vae.py:185-187):

  * ``objective_names``: ordered tuple of component-loss names. The loss dict
    returned by :meth:`loss_terms` has exactly these keys (weighted by
    ``lambda_weights``); ``total_loss`` is their sum and is excluded from the
    vector handed to the aggregator (reference main.py:184).
  * ``feature_names``: names of forward outputs at which the shared trunk
    ends, or ``None`` to force full-parameter Jacobians (reference
    main.py:179-196 selects ``mtl_backward`` vs ``backward`` on this).
  * ``trunk(x, train)`` -> (features tuple, aux): everything up to (and
    including) the feature tensors.
  * ``heads(features, aux, x, train)`` -> outputs dict: the rest of the
    forward pass, differentiable w.r.t. both features and head params.
  * ``__call__(x, train)`` = heads(trunk(x)) -> outputs dict with ``recons``.
  * ``loss_terms(x, outputs)`` -> ordered dict of *weighted* component losses.
  * ``sample(n)`` -> generated images (rng via the ``'sample'`` stream).

Unlike the reference (stateful torch modules + torchjd hooks), these are pure
Flax modules: randomness comes from named rng streams (``'sample'``,
``'dropout'``), normalization state lives in the ``batch_stats`` collection,
and the multi-objective machinery (movae_tpu/moo) differentiates through
``trunk``/``heads`` with ``jax.vjp`` instead of re-running autograd m times.

Images are NHWC (TPU-native layout).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
LambdaWeights = Tuple[Tuple[str, float], ...]


def resolve_lambda_weights(
    objective_names: Sequence[str],
    lambda_weights: Union[None, Sequence[float], Mapping[str, float], LambdaWeights],
    defaults: Mapping[str, float],
) -> LambdaWeights:
    """Validate/normalize lambda weights to a hashable ordered tuple.

    Mirrors the reference validation (vae.py:55-79): a list must have one
    weight per objective (in objective order); a dict must have exactly the
    objective keys.
    """
    names = tuple(objective_names)
    if lambda_weights is None:
        return tuple((k, float(defaults[k])) for k in names)
    if isinstance(lambda_weights, Mapping):
        expected, provided = set(names), set(lambda_weights.keys())
        if expected != provided:
            missing, extra = expected - provided, provided - expected
            msg = "lambda_weights keys must match objectives keys. "
            if missing:
                msg += f"Missing: {missing}. "
            if extra:
                msg += f"Extra: {extra}."
            raise ValueError(msg)
        return tuple((k, float(lambda_weights[k])) for k in names)
    seq = tuple(lambda_weights)
    if seq and isinstance(seq[0], tuple):  # already items
        return resolve_lambda_weights(names, dict(seq), defaults)
    if len(seq) != len(names):
        raise ValueError(
            f"model requires {len(names)} lambda_weights {names}, got {len(seq)}"
        )
    return tuple((k, float(w)) for k, w in zip(names, seq))


def resolve_activation(name: Optional[str]):
    """Decoder output activation by name (vae.py:107-114)."""
    name = (name or "none").lower()
    if name == "tanh":
        return jnp.tanh
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "none":
        return lambda x: x
    raise ValueError(f"recons_activation {name} not supported")


class MOVAEModel(nn.Module):
    """Abstract base (see module docstring for the contract)."""

    @property
    def objective_names(self) -> Tuple[str, ...]:
        raise NotImplementedError

    @property
    def feature_names(self) -> Optional[Tuple[str, ...]]:
        raise NotImplementedError

    # --- forward contract -------------------------------------------------
    def trunk(self, x: Array, train: bool = False) -> Tuple[Tuple[Array, ...], Any]:
        raise NotImplementedError

    def heads(self, features, aux, x: Array, train: bool = False) -> Dict[str, Any]:
        raise NotImplementedError

    def __call__(self, x: Array, train: bool = False) -> Dict[str, Any]:
        features, aux = self.trunk(x, train=train)
        return self.heads(features, aux, x, train=train)

    def loss_terms(self, x: Array, outputs: Dict[str, Any]) -> Dict[str, Array]:
        raise NotImplementedError

    def forward_with_losses(self, x: Array, train: bool = False):
        """One-shot forward + weighted component losses.

        Returns ``(loss_vec, loss_dict, outputs)`` where ``loss_vec`` stacks
        the component losses in ``objective_names`` order and ``loss_dict``
        additionally carries ``total_loss`` (their sum), matching the
        reference loss dict contract (vae.py:211-228).
        """
        outputs = self(x, train=train)
        loss_dict = self.loss_terms(x, outputs)
        loss_vec = jnp.stack([loss_dict[k] for k in self.objective_names])
        loss_dict = dict(loss_dict)
        loss_dict["total_loss"] = jnp.sum(loss_vec)
        return loss_vec, loss_dict, outputs

    def heads_with_losses(self, features, aux, x: Array, train: bool = False):
        """Heads + losses, differentiable w.r.t. ``features`` (MOO feature path)."""
        outputs = self.heads(features, aux, x, train=train)
        loss_dict = self.loss_terms(x, outputs)
        loss_vec = jnp.stack([loss_dict[k] for k in self.objective_names])
        loss_dict = dict(loss_dict)
        loss_dict["total_loss"] = jnp.sum(loss_vec)
        return loss_vec, loss_dict, outputs

    # --- generation -------------------------------------------------------
    def sample(self, num_samples: int) -> Array:
        raise NotImplementedError

    def lambda_weight(self, name: str) -> float:
        return dict(self.lambda_weights)[name]

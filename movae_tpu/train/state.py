"""Train state: one pytree carrying everything a jitted step mutates."""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """Parameters, norm statistics, optimizer state, and aggregator state.

    Unlike the reference (stateful torch module + optimizer + scheduler +
    stateful aggregator objects, main.py:1161-1244), every piece of mutable
    training state lives in this single pytree so the whole update is one
    pure jitted function and sharding annotations apply uniformly.
    """

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    agg_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx, agg_state):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            agg_state=agg_state,
            apply_fn=apply_fn,
            tx=tx,
        )

"""Per-objective gradient engine: Jacobians, Gramians, and combination.

The TPU-native replacement for torchjd's ``backward`` / ``mtl_backward``
(reference usage: /root/reference/main.py:188-196). Instead of m sequential
autograd passes re-walking the graph, both modes below compute the m
per-objective gradients from **one** forward and m one-hot VJPs through a
single shared ``jax.vjp`` — unrolled with constant basis cotangents so XLA
prunes each objective's backward to its dependency cone (see
``_UNROLL_MAX``), or vmapped into m-wide MXU matmuls for large m:

  * full mode   — Jacobian w.r.t. *all* trainable params (torchjd
    ``backward``; used when the model declares ``feature_names = None``).
  * feature mode — Jacobian w.r.t. the shared-trunk feature tensors only;
    the aggregated cotangent is pulled back through the trunk with a single
    VJP, while head params receive their own per-objective gradients
    (torchjd ``mtl_backward`` semantics).

Gramians are accumulated in float32 regardless of the compute dtype.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
PyTree = Any


def gramian(J: PyTree) -> Array:
    """G[i,j] = <J_i, J_j> summed over every leaf of a stacked Jacobian
    pytree whose leaves have leading axis m."""
    leaves = jax.tree_util.tree_leaves(J)
    m = leaves[0].shape[0]
    G = jnp.zeros((m, m), jnp.float32)
    for leaf in leaves:
        flat = leaf.reshape(m, -1).astype(jnp.float32)
        G = G + flat @ flat.T
    return G


def combine(J: PyTree, alpha: Array) -> PyTree:
    """g = alpha^T J per leaf (tensordot over the leading objective axis)."""
    def _comb(leaf):
        return jnp.tensordot(alpha.astype(leaf.dtype), leaf, axes=1)
    return jax.tree_util.tree_map(_comb, J)


def sum_rows(J: PyTree) -> PyTree:
    return jax.tree_util.tree_map(lambda leaf: leaf.sum(axis=0), J)


def tree_add(a: PyTree, b: PyTree) -> PyTree:
    return jax.tree_util.tree_map(lambda x, y: x + y, a, b)


# Unroll the m one-hot VJPs (python loop) instead of vmapping them for
# m <= this bound. The basis cotangents are then compile-time constants, so
# XLA's algebraic simplifier prunes each objective's backward to its true
# dependency cone — e.g. VQ commitment/embedding losses never touch the
# decoder, so their rows skip the (dominant) decoder backward entirely.
# vmap would batch the m cotangents into dense GEMMs that pay the full
# backward for every row. Measured on v5e, 256px VQ-VAE-2 + UPGrad: 679 ->
# ~2000 img/s. vmap remains the path for large m (compile-size bound).
_UNROLL_MAX = 8


def _vjp_rows(vjp_fn, m: int, dtype) -> list:
    eye = jnp.eye(m, dtype=dtype)
    return [vjp_fn(eye[i]) for i in range(m)]


def _stack_rows(rows: list) -> PyTree:
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *rows)


def full_jacobian(
    loss_vec_fn: Callable[[PyTree], Tuple[Array, Any]],
    params: PyTree,
    num_objectives: int,
) -> Tuple[Array, Any, PyTree, Array]:
    """torchjd ``backward`` equivalent.

    ``loss_vec_fn(params) -> (loss_vec, aux)`` with ``loss_vec`` of shape
    (m,). Returns ``(loss_vec, aux, J, G)`` where J is the full-parameter
    Jacobian pytree (leading axis m) from one forward + m one-hot VJPs
    (unrolled for XLA dead-cone pruning; vmapped above ``_UNROLL_MAX``).
    """
    losses, vjp_fn, aux = jax.vjp(loss_vec_fn, params, has_aux=True)
    if num_objectives <= _UNROLL_MAX:
        J = _stack_rows([r[0] for r in
                         _vjp_rows(vjp_fn, num_objectives, losses.dtype)])
    else:
        eye = jnp.eye(num_objectives, dtype=losses.dtype)
        J = jax.vmap(lambda e: vjp_fn(e)[0])(eye)
    return losses, aux, J, gramian(J)


class FeatureJacobian:
    """torchjd ``mtl_backward`` equivalent, staged so the aggregator weights
    can be computed between the feature-Jacobian and the trunk pullback.

    ``trunk_fn(params) -> (features, trunk_aux)``
    ``heads_fn(params, features, trunk_aux) -> (loss_vec, heads_aux)``
    (only params/features are differentiated; trunk_aux is carried data such
    as updated norm statistics).
    """

    def __init__(self, trunk_fn, heads_fn, params, num_objectives: int):
        features, trunk_vjp, trunk_aux = jax.vjp(trunk_fn, params,
                                                 has_aux=True)
        losses, heads_vjp, heads_aux = jax.vjp(
            lambda p, f: heads_fn(p, f, trunk_aux), params, features,
            has_aux=True)
        if num_objectives <= _UNROLL_MAX:
            rows = _vjp_rows(heads_vjp, num_objectives, losses.dtype)
            J_params = _stack_rows([r[0] for r in rows])
            J_feats = _stack_rows([r[1] for r in rows])
        else:
            eye = jnp.eye(num_objectives, dtype=losses.dtype)
            J_params, J_feats = jax.vmap(lambda e: heads_vjp(e))(eye)

        self.losses = losses
        self.trunk_aux = trunk_aux
        self.heads_aux = heads_aux
        self._trunk_vjp = trunk_vjp
        self._J_params = J_params
        self._J_feats = J_feats
        # Gramian from the feature Jacobian only, as in torchjd mtl_backward.
        self.G = gramian(J_feats)

    def grads(self, alpha: Array) -> PyTree:
        """Shared-trunk grads from the aggregated feature cotangent plus the
        per-objective head grads (each head keeps its own loss's gradient)."""
        feat_cot = combine(self._J_feats, alpha)
        shared = self._trunk_vjp(feat_cot)[0]
        direct = sum_rows(self._J_params)
        return tree_add(shared, direct)

"""Per-objective gradient engine: Jacobians, Gramians, and combination.

The TPU-native replacement for torchjd's ``backward`` / ``mtl_backward``
(reference usage: /root/reference/main.py:188-196). Instead of m sequential
autograd passes re-walking the graph, both modes below compute the m
per-objective gradients from one (CSE-shared) forward and m separately
traced backward cones — each objective's backward graph contains only the
ops its loss actually depends on (see ``_UNROLL_MAX`` for why one-hot
cotangents through a shared VJP do NOT achieve this) — or vmapped one-hot
VJPs forming m-wide MXU matmuls for large m:

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


# Trace the m per-objective backwards separately (python loop) instead of
# vmapping one-hot cotangents through a shared VJP, for m <= this bound.
# Separate traces prune STRUCTURALLY: each objective's backward graph
# contains only the ops in its true dependency cone (e.g. the VQ embedding
# loss has an identically-zero feature gradient, so its feature row costs
# nothing), and XLA CSE merges the repeated forward computations. One-hot
# cotangents through a shared VJP do NOT get pruned: XLA refuses the
# float rewrite `0*x -> 0` (inf/NaN soundness), so every row pays the full
# backward — measured on v5e (256px VQ-VAE-2, cost_analysis): all three
# one-hot rows cost identical 7.4e11 FLOPs, even the analytically-zero
# embedding row. vmap remains the path for large m (compile-size bound).
_UNROLL_MAX = 8


def _stack_rows(rows: list) -> PyTree:
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *rows)


def full_jacobian(
    loss_tuple_fn: Callable[[PyTree], Tuple[Tuple[Array, ...], Any]],
    params: PyTree,
    num_objectives: int,
) -> Tuple[Array, Any, PyTree, Array]:
    """torchjd ``backward`` equivalent.

    ``loss_tuple_fn(params) -> (loss_tuple, aux)`` with ``loss_tuple`` a
    python tuple of m UNSTACKED scalar losses — selection must happen
    before any ``jnp.stack`` so each per-objective trace sees only its own
    cone (differentiating ``stack(losses)[i]`` re-introduces concrete
    one-hot cotangents that XLA cannot prune). Returns ``(loss_vec, aux,
    J, G)`` where ``loss_vec`` is the stacked (m,) vector and J the
    full-parameter Jacobian pytree (leading axis m).
    """
    if num_objectives <= _UNROLL_MAX:
        # separate per-objective traces: structural cone pruning (see
        # _UNROLL_MAX); the m forwards are identical expressions XLA CSEs
        # only row 0 carries the aux outputs (loss dict, model outputs,
        # mutated stats): aux in EVERY row would re-trace the full forward
        # per row, and XLA's CSE does not reliably merge the copies
        # (measured: duplicated decoder convs in the optimized HLO). Later
        # rows return just their scalar, so partial-eval DCEs their primal
        # graphs down to each objective's true cone.
        def _loss_0(p):
            lt, a = loss_tuple_fn(p)
            return lt[0], (lt, a)

        g_0, (lt, aux) = jax.grad(_loss_0, has_aux=True)(params)
        losses = jnp.stack(list(lt))
        rows = [g_0]
        for i in range(1, num_objectives):
            def _loss_i(p, i=i):
                return loss_tuple_fn(p)[0][i]
            rows.append(jax.grad(_loss_i)(params))
        J = _stack_rows(rows)
    else:
        def stacked_fn(p):
            lt, a = loss_tuple_fn(p)
            return jnp.stack(list(lt)), a

        losses, vjp_fn, aux = jax.vjp(stacked_fn, params, has_aux=True)
        eye = jnp.eye(num_objectives, dtype=losses.dtype)
        J = jax.vmap(lambda e: vjp_fn(e)[0])(eye)
    return losses, aux, J, gramian(J)


class FeatureJacobian:
    """torchjd ``mtl_backward`` equivalent, staged so the aggregator weights
    can be computed between the feature-Jacobian and the trunk pullback.

    ``trunk_fn(params) -> (features, trunk_aux)``
    ``heads_fn(params, features, trunk_aux) -> (loss_tuple, heads_aux)``
    with ``loss_tuple`` a python tuple of m unstacked scalars (see
    ``full_jacobian`` for why); only params/features are differentiated;
    trunk_aux is carried data such as updated norm statistics.
    """

    def __init__(self, trunk_fn, heads_fn, params, num_objectives: int):
        features, trunk_vjp, trunk_aux = jax.vjp(trunk_fn, params,
                                                 has_aux=True)
        if num_objectives <= _UNROLL_MAX:
            # per-objective JOINT (params, features) grads, each traced
            # separately so its backward graph is exactly its dependency
            # cone (see _UNROLL_MAX; ``heads_fn`` must return an UNSTACKED
            # loss tuple — differentiating ``stack(losses)[i]`` would
            # re-introduce the unprunable one-hot cotangents). The head
            # param grads come from the same sweeps (summed below), so no
            # separate total-loss backward is needed.
            # aux (loss dict / outputs / stats) rides ONLY on row 0: aux in
            # every row re-traces the full heads forward per row and XLA's
            # CSE does not reliably merge the copies (measured as duplicated
            # decoder convs in the optimized HLO); aux-free later rows DCE
            # down to their true cones.
            def _loss_0(p, f):
                lt, a = heads_fn(p, f, trunk_aux)
                return lt[0], (lt, a)

            (gp0, gf0), (lt, heads_aux) = jax.grad(
                _loss_0, argnums=(0, 1), has_aux=True)(params, features)
            losses = jnp.stack(list(lt))
            f_rows = [gf0]
            direct = gp0
            for i in range(1, num_objectives):
                def _loss_i(p, f, i=i):
                    return heads_fn(p, f, trunk_aux)[0][i]
                gp, gf = jax.grad(_loss_i, argnums=(0, 1))(params, features)
                f_rows.append(gf)
                direct = tree_add(direct, gp)
            J_feats = _stack_rows(f_rows)
        else:
            def stacked_fn(p, f):
                lt, a = heads_fn(p, f, trunk_aux)
                return jnp.stack(list(lt)), a

            losses, heads_vjp, heads_aux = jax.vjp(stacked_fn, params,
                                                   features, has_aux=True)
            eye = jnp.eye(num_objectives, dtype=losses.dtype)
            J_params, J_feats = jax.vmap(lambda e: heads_vjp(e))(eye)
            direct = sum_rows(J_params)

        self.losses = losses
        self.trunk_aux = trunk_aux
        self.heads_aux = heads_aux
        self._trunk_vjp = trunk_vjp
        self._direct = direct
        self._J_feats = J_feats
        # Gramian from the feature Jacobian only, as in torchjd mtl_backward.
        self.G = gramian(J_feats)

    def grads(self, alpha: Array) -> PyTree:
        """Shared-trunk grads from the aggregated feature cotangent plus the
        per-objective head grads (each head keeps its own loss's gradient —
        their sum, since head param sets are disjoint per objective)."""
        feat_cot = combine(self._J_feats, alpha)
        shared = self._trunk_vjp(feat_cot)[0]
        return tree_add(shared, self._direct)

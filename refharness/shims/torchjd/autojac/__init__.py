"""torchjd.autojac stand-in: Jacobian-descent backward passes.

Semantics per the torchjd docs (the two entry points the reference uses,
main.py:186-196):

- ``backward(tensors, aggregator)``: stack the gradient of every scalar in
  ``tensors`` w.r.t. all leaf parameters in their autograd graph into a
  Jacobian J (one row per tensor), aggregate A(J) into a single row, and
  accumulate it into each leaf's ``.grad``.
- ``mtl_backward(losses, features, aggregator)``: task-specific parameters
  (leaves reachable from loss_i but not from ``features``) receive the
  plain gradient of their own loss; shared parameters (leaves reachable
  from ``features``) receive the aggregation A(J) of the per-loss
  Jacobians w.r.t. the FEATURES, backpropagated through the shared trunk.

movae_tpu's moo/engine.py full_jacobian / FeatureJacobian modes mirror
exactly these two contracts; tests/test_refharness.py anchors this shim
against brute-force autograd so the equivalence study rests on a verified
base."""

from __future__ import annotations

from typing import Optional, Sequence

import torch
from torch import Tensor

__all__ = ["backward", "mtl_backward"]


def _leaf_params(roots: Sequence[Tensor]) -> list[Tensor]:
    """All leaf tensors requiring grad in the autograd graph of ``roots``
    (AccumulateGrad nodes), deduplicated, in deterministic discovery
    order."""
    seen_fns = set()
    leaves: list[Tensor] = []
    seen_ids = set()
    stack = [r.grad_fn for r in roots if r.grad_fn is not None]
    while stack:
        fn = stack.pop()
        if fn is None or fn in seen_fns:
            continue
        seen_fns.add(fn)
        var = getattr(fn, "variable", None)
        if var is not None and id(var) not in seen_ids:
            seen_ids.add(id(var))
            leaves.append(var)
        stack.extend(nxt for nxt, _ in fn.next_functions)
    return leaves


def _grad_row(scalar: Tensor, params: Sequence[Tensor]) -> Tensor:
    grads = torch.autograd.grad(scalar, params, retain_graph=True,
                                allow_unused=True)
    return torch.cat([
        (g if g is not None else torch.zeros_like(p)).reshape(-1)
        for g, p in zip(grads, params)])


def _accumulate(params: Sequence[Tensor], flat: Tensor) -> None:
    offset = 0
    for p in params:
        n = p.numel()
        piece = flat[offset:offset + n].view_as(p)
        p.grad = piece.clone() if p.grad is None else p.grad + piece
        offset += n


def backward(tensors, aggregator, inputs: Optional[Sequence[Tensor]] = None,
             retain_graph: bool = False) -> None:
    if isinstance(tensors, Tensor):
        tensors = [tensors]
    params = list(inputs) if inputs is not None else _leaf_params(tensors)
    jac = torch.stack([_grad_row(t, params) for t in tensors])
    _accumulate(params, aggregator(jac))
    del retain_graph  # rows are computed with retain_graph=True throughout


def mtl_backward(losses: Sequence[Tensor], features, aggregator,
                 tasks_params: Optional[Sequence[Sequence[Tensor]]] = None,
                 shared_params: Optional[Sequence[Tensor]] = None,
                 retain_graph: bool = False) -> None:
    if isinstance(features, Tensor):
        features = [features]
    features = list(features)
    if shared_params is None:
        shared_params = _leaf_params(features)
    shared_ids = {id(p) for p in shared_params}
    if tasks_params is None:
        tasks_params = [[p for p in _leaf_params([loss])
                         if id(p) not in shared_ids] for loss in losses]

    # Jacobian of the losses w.r.t. the features, aggregated to one row
    feat_rows = []
    for loss in losses:
        grads = torch.autograd.grad(loss, features, retain_graph=True,
                                    allow_unused=True)
        feat_rows.append(torch.cat([
            (g if g is not None else torch.zeros_like(f)).reshape(-1)
            for g, f in zip(grads, features)]))
    agg = aggregator(torch.stack(feat_rows))

    # task-specific params: plain gradient of their own loss
    for loss, params in zip(losses, tasks_params):
        if params:
            _accumulate(params, _grad_row(loss, params))

    # shared params: aggregated feature cotangent through the trunk
    cotangents = []
    offset = 0
    for f in features:
        n = f.numel()
        cotangents.append(agg[offset:offset + n].view_as(f))
        offset += n
    shared_grads = torch.autograd.grad(features, shared_params,
                                       grad_outputs=cotangents,
                                       retain_graph=retain_graph,
                                       allow_unused=True)
    flat = torch.cat([
        (g if g is not None else torch.zeros_like(p)).reshape(-1)
        for g, p in zip(shared_grads, shared_params)])
    _accumulate(shared_params, flat)

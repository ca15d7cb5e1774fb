"""torchjd.aggregation._utils.non_differentiable stand-in."""

from __future__ import annotations


def raise_non_differentiable_error(module, grad_output):
    raise RuntimeError(
        f"{module.__class__.__name__} treats its weights as constants; "
        "differentiating through the aggregation is not supported")

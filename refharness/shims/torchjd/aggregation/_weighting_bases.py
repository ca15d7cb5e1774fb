"""Weighting base classes (torchjd.aggregation._weighting_bases).

A Weighting is an nn.Module mapping a matrix (a Jacobian, or its Gramian
for ``Weighting[PSDMatrix]`` subclasses) to a 1-D tensor of per-row
weights. The reference's custom aggregators (utils/torchmoo/*.py:33-36)
subclass ``Weighting[PSDMatrix]`` directly, so the generic subscript must
be subclassable."""

from __future__ import annotations

from typing import Generic, TypeVar

import torch
from torch import Tensor, nn

#: Type tag for weightings that consume a Gramian (J @ J.T) rather than J.
PSDMatrix = Tensor
Matrix = Tensor

_T = TypeVar("_T")


class Weighting(nn.Module, Generic[_T]):
    """Maps a matrix of type ``_T`` to a vector of row weights."""

    def forward(self, matrix: Tensor) -> Tensor:  # pragma: no cover
        raise NotImplementedError


class ConstantWeighting(Weighting[Tensor]):
    """Returns a fixed preference vector regardless of the input matrix."""

    def __init__(self, weights: Tensor):
        super().__init__()
        self.register_buffer("weights", torch.as_tensor(weights))

    def forward(self, matrix: Tensor) -> Tensor:
        return self.weights.to(matrix.dtype)

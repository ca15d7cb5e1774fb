"""Mean weighting/aggregator (torchjd.aggregation._mean)."""

from __future__ import annotations

import torch
from torch import Tensor

from ._aggregator_bases import WeightedAggregator
from ._weighting_bases import Weighting


class MeanWeighting(Weighting[Tensor]):
    """Uniform weights 1/m (works on either a Jacobian or its Gramian —
    only the row count is used)."""

    def forward(self, matrix: Tensor) -> Tensor:
        m = matrix.shape[0]
        return torch.full((m,), 1.0 / m, dtype=matrix.dtype,
                          device=matrix.device)


class Mean(WeightedAggregator):
    def __init__(self):
        super().__init__(MeanWeighting())

"""Aggregator base classes (torchjd.aggregation._aggregator_bases).

An Aggregator maps a Jacobian matrix (one row per objective) to a single
combined gradient row. ``WeightedAggregator`` computes ``w(J) @ J``; the
reference registers forward hooks on ``aggregator.weighting`` that receive
(module, (matrix,), weights) — see main.py:71-124, 1249-1250 — so the
weighting exposed here is always the MATRIX-level one, with Gramian-level
weightings adapted by ``GramianWeightedAggregator``."""

from __future__ import annotations

from torch import Tensor, nn

from ._weighting_bases import PSDMatrix, Weighting


class Aggregator(nn.Module):
    def forward(self, matrix: Tensor) -> Tensor:  # pragma: no cover
        raise NotImplementedError

    def __str__(self) -> str:
        return self.__class__.__name__


class _GramianAdapter(Weighting[Tensor]):
    """Lifts a Gramian-level weighting to a matrix-level one."""

    def __init__(self, psd_weighting: Weighting[PSDMatrix]):
        super().__init__()
        self.psd_weighting = psd_weighting

    def forward(self, matrix: Tensor) -> Tensor:
        return self.psd_weighting(matrix @ matrix.T)


class WeightedAggregator(Aggregator):
    def __init__(self, weighting: Weighting[Tensor]):
        super().__init__()
        self.weighting = weighting

    def forward(self, matrix: Tensor) -> Tensor:
        return self.weighting(matrix) @ matrix


class GramianWeightedAggregator(WeightedAggregator):
    """WeightedAggregator whose weighting consumes the Gramian J @ J.T.

    The reference's AlignedMTL/NUPGrad/PNUPGrad/MGDA subclass this and pass
    a ``Weighting[PSDMatrix]`` (utils/torchmoo/nupgrad.py:80-83)."""

    def __init__(self, psd_weighting: Weighting[PSDMatrix]):
        super().__init__(_GramianAdapter(psd_weighting))

"""torchjd.aggregation._utils.pref_vector stand-in."""

from __future__ import annotations

from typing import Optional

from torch import Tensor

from .._weighting_bases import ConstantWeighting, Weighting


def pref_vector_to_weighting(pref_vector: Optional[Tensor],
                             default: Weighting) -> Weighting:
    if pref_vector is None:
        return default
    return ConstantWeighting(pref_vector)


def pref_vector_to_str_suffix(pref_vector: Optional[Tensor]) -> str:
    if pref_vector is None:
        return ""
    return f"([{', '.join(f'{float(w):g}' for w in pref_vector)}])"

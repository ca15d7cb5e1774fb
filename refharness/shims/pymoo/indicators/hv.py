"""pymoo.indicators.hv.HV stand-in, delegating to movae_tpu's exact
hypervolume (movae_tpu/metrics/hv.py), which is oracle-tested against
pymoo's documented semantics (points dominating the reference point)."""

from __future__ import annotations

import numpy as np


class HV:
    def __init__(self, ref_point):
        self.ref_point = np.asarray(ref_point, dtype=np.float64)

    def __call__(self, F):
        from movae_tpu.metrics.hv import hypervolume

        F = np.asarray(F, dtype=np.float64)
        if F.ndim == 1:
            F = F[None, :]
        return float(hypervolume(F, self.ref_point))

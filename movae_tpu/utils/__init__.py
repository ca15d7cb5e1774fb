"""Shared utilities: meters, seeding (reference utils/utils.py:45-109)."""

from __future__ import annotations

import random

import numpy as np


class AverageMeter:
    """Running average tracker (reference utils/utils.py:45-77)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def set_seed(seed: int) -> None:
    """Seed host-side RNGs (reference utils/utils.py:45-60). Device-side
    randomness is explicit jax.random key threading derived from this seed."""
    random.seed(seed)
    np.random.seed(seed)

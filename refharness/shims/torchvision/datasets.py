"""torchvision.datasets stand-in. ``CelebA`` exists as a subclassable base
(the reference defines ``MyCelebA(datasets.CelebA)`` at module scope,
utils/utils.py:111); everything raises on instantiation — the harness
feeds pre-built tensors, never reference dataset pipelines."""

from __future__ import annotations

from torch.utils.data import Dataset

_MSG = ("refharness torchvision shim: dataset {name} is unavailable — the "
        "harness feeds pre-built tensors, not reference datasets")


class CelebA(Dataset):
    def __init__(self, *args, **kwargs):
        raise RuntimeError(_MSG.format(name="CelebA"))

    def _check_integrity(self) -> bool:  # overridden by MyCelebA anyway
        return True


def __getattr__(name):
    raise RuntimeError(_MSG.format(name=name))

"""torchvision.models stand-in: the pretrained-tower entry points the
reference imports (utils/metrics.py:7). No pretrained weights exist in
this environment; any call is a hard error so a study can never silently
score through an uninitialized tower."""

from __future__ import annotations

_MSG = ("refharness torchvision shim: pretrained {name} is unavailable "
        "(zero-egress environment). Score samples through movae_tpu's "
        "weight-synced oracle tower instead (tests/test_metric_tower_"
        "oracle.py / scripts/equivalence_study.py).")


class _Weights:
    DEFAULT = None
    IMAGENET1K_V1 = None


Inception_V3_Weights = _Weights
VGG16_Weights = _Weights


def inception_v3(*args, **kwargs):
    raise RuntimeError(_MSG.format(name="inception_v3"))


def vgg16(*args, **kwargs):
    raise RuntimeError(_MSG.format(name="vgg16"))

"""torchvision.models stand-in: the pretrained-tower entry points the
reference imports (utils/metrics.py:7).

Two modes:

- Default: any call is a hard error, so a study can never silently score
  through an uninitialized tower (no pretrained weights exist in this
  zero-egress environment).
- ``MOVAE_REFHARNESS_TOWER_SEED=<int>``: serve the torch mirror towers
  from ``refharness/towers.py`` with seeded random weights. Eval lockstep
  studies (scripts/eval_equivalence_study.py) set this and convert the
  SAME state_dicts into movae_tpu's flax towers, so the reference's
  unmodified metric pipeline (lpips / calculate_fid, utils/metrics.py:
  206-615) runs weight-synced against this framework. The VGG seed is
  offset by +1 so the two towers never share a weight stream.

Tower weights are cached per (name, seed) and served as deep copies: the
reference constructs a new ``InceptionV3(device=...)`` wrapper per metric
call (metrics.py:556, 639) — regenerating ~24M seeded-random parameters
each time dominated study runtime — but callers MUTATE the returned module
(``inception.fc = nn.Identity()``, metrics.py:378), so a shared instance
would leak that mutation into the IS tower.
"""

from __future__ import annotations

import os

_MSG = ("refharness torchvision shim: pretrained {name} is unavailable "
        "(zero-egress environment). Score samples through movae_tpu's "
        "weight-synced oracle tower instead (tests/test_metric_tower_"
        "oracle.py / scripts/equivalence_study.py), or set "
        "MOVAE_REFHARNESS_TOWER_SEED to serve seeded random mirror towers "
        "for a weight-synced lockstep study.")


class _Weights:
    DEFAULT = None
    IMAGENET1K_V1 = None


Inception_V3_Weights = _Weights
VGG16_Weights = _Weights

_cache = {}


def _tower_seed():
    seed = os.environ.get("MOVAE_REFHARNESS_TOWER_SEED")
    return int(seed) if seed else None


def inception_v3(*args, weights=None, transform_input=False, **kwargs):
    seed = _tower_seed()
    if seed is None:
        raise RuntimeError(_MSG.format(name="inception_v3"))
    assert not transform_input, (
        "the reference always passes transform_input=False "
        "(utils/metrics.py:377, 471); the mirror tower models only that")
    key = ("inception_v3", seed)
    if key not in _cache:
        from refharness.towers import build_inception_v3

        _cache[key] = build_inception_v3(seed).state_dict()
    from refharness.towers import TInception3

    m = TInception3()
    m.load_state_dict(_cache[key])
    m.eval()
    return m


def vgg16(*args, weights=None, **kwargs):
    seed = _tower_seed()
    if seed is None:
        raise RuntimeError(_MSG.format(name="vgg16"))
    key = ("vgg16", seed)
    if key not in _cache:
        from refharness.towers import build_vgg16

        _cache[key] = build_vgg16(seed + 1).state_dict()
    from refharness.towers import TVGG16

    m = TVGG16()
    m.load_state_dict(_cache[key])
    m.eval()
    return m

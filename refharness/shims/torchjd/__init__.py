"""Minimal torchjd stand-in for running the reference pipeline (see
refharness/__init__.py). Reimplements the public Jacobian-descent API the
reference uses (main.py:18-31, utils/torchmoo/*) from the documented
torchjd semantics; anchored by tests/test_refharness.py."""

from . import aggregation, autojac  # noqa: F401
from .autojac import backward, mtl_backward  # noqa: F401

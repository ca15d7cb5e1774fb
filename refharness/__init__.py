"""Reference-pipeline harness: run the UNMODIFIED upstream MO-VAE torch
pipeline (/root/reference) on CPU inside this repo's test/verification jobs.

The upstream code imports several packages absent from this environment
(torchjd, torchvision, wandb, pymoo, scienceplots, torchsummary). The
``shims/`` directory provides minimal, semantics-faithful stand-ins for
exactly the surface the reference touches; ``activate()`` wires them plus
the reference tree onto ``sys.path`` so ``import main`` / ``import models``
resolve to the REAL reference modules (main.py, models/*.py, utils/*.py run
unmodified — that is the point: cross-framework equivalence studies compare
movae_tpu against the reference's own forward/loss/backward/optimizer code,
not against a hand-written mirror).

Shim fidelity notes:
- ``torchjd`` is the only shim with numerics in it (Jacobian-descent
  backward + aggregators). It is reimplemented here from the public torchjd
  API documentation and the UPGrad paper; ``tests/test_refharness.py``
  anchors it against torchjd's published docstring example and against
  brute-force autograd.
- ``wandb``/``scienceplots``/``torchsummary``/``pymoo`` are logging or
  display surfaces with no effect on training numerics; they are no-ops
  (pymoo's HV delegates to movae_tpu.metrics.hv).
- ``torchvision`` raises on any call that would affect numerics (pretrained
  towers, dataset downloads) — the harness never takes those paths.
"""

from __future__ import annotations

import importlib
import os
import sys

REFERENCE_DIR = "/root/reference"
SHIMS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shims")

_REFERENCE_MODULES = ("main", "models", "utils")


def reference_available(reference_dir: str = REFERENCE_DIR) -> bool:
    return os.path.isfile(os.path.join(reference_dir, "main.py"))


def activate(reference_dir: str = REFERENCE_DIR):
    """Put shims + the reference tree on sys.path and import reference main.

    Returns the reference ``main`` module. The reference tree is inserted
    ahead of the repo so its top-level ``main``/``models``/``utils`` win;
    call this only from dedicated study/test processes, never from the
    framework itself.
    """
    if not reference_available(reference_dir):
        raise FileNotFoundError(f"reference tree not found at {reference_dir}")
    for p in (reference_dir, SHIMS_DIR):
        if p in sys.path:
            sys.path.remove(p)
        sys.path.insert(0, p)
    for name in _REFERENCE_MODULES:
        mod = sys.modules.get(name)
        if mod is None:
            continue
        # namespace packages (reference utils/ has no __init__.py) carry
        # __file__=None; locate them by __path__ instead
        origin = (getattr(mod, "__file__", None)
                  or next(iter(getattr(mod, "__path__", [])), ""))
        if not str(origin).startswith(reference_dir):
            raise RuntimeError(
                f"module {name!r} already imported from {origin!r}; "
                f"activate() must run before anything imports a "
                f"colliding top-level module")
    main = importlib.import_module("main")
    assert main.__file__.startswith(reference_dir), main.__file__
    return main

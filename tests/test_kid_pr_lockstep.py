"""KID + precision/recall formula lockstep vs the reference's own code.

The eval lockstep study (EQUIVALENCE_EVAL.json) covers losses/usage/HV and
the FID/LPIPS/SSIM/PSNR surfaces; KID and the (pipeline-disabled but
provided) precision/recall had no cross-framework run. This runs the
REFERENCE's `utils.metrics.kid_from_features` /
`precision_recall_from_features` (metrics.py:682-736) in a refharness
subprocess against movae_tpu's implementations on identical features:

- KID deterministic case: subset_size == n makes every no-replacement
  subset the full set, so the estimator is RNG-independent — exact check;
- KID seeded case: the reference uses an UNSEEDED np.random.default_rng
  (metrics.py:696); the subprocess patches it to a seeded generator whose
  draw sequence (real-then-fake per subset) matches ours, giving identical
  subsets — exact check at n > subset_size;
- precision/recall: fully deterministic — exact check.
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isfile("/root/reference/main.py"),
    reason="reference tree not available")

CODE = textwrap.dedent("""
    import numpy as np

    from movae_tpu.metrics.features import (kid_from_features,
                                            precision_recall_from_features)

    import refharness

    refharness.activate()
    from utils.metrics import kid_from_features as ref_kid
    from utils.metrics import precision_recall_from_features as ref_pr

    rng = np.random.default_rng(1)
    fr = rng.normal(size=(50, 64))
    ff = rng.normal(size=(50, 64)) + 0.2

    # deterministic full-subset KID
    ours = kid_from_features(fr, ff, seed=0)
    theirs = ref_kid(fr, ff)
    assert abs(ours - theirs) <= 1e-12 * max(abs(theirs), 1e-12), (
        "full-subset KID", ours, theirs)

    # seeded subset KID at n > subset_size: ours first (it consumes
    # default_rng itself), then patch the reference's unseeded call
    fr2 = rng.normal(size=(200, 64))
    ff2 = rng.normal(size=(200, 64)) + 0.1
    ours2 = kid_from_features(fr2, ff2, seed=7)
    orig = np.random.default_rng
    np.random.default_rng = lambda *a, **k: orig(7)
    try:
        theirs2 = ref_kid(fr2, ff2)
    finally:
        np.random.default_rng = orig
    assert abs(ours2 - theirs2) <= 1e-12 * max(abs(theirs2), 1e-12), (
        "subset KID", ours2, theirs2)

    # precision / recall (deterministic)
    p1, r1 = precision_recall_from_features(fr, ff, k=3)
    p2, r2 = ref_pr(fr, ff, k=3)
    assert (p1, r1) == (p2, r2), ((p1, r1), (p2, r2))
    print("KID", ours2, "PR", p1, r1, "LOCKSTEP-OK")
""")


def test_kid_and_pr_formulas_lockstep():
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run([sys.executable, "-c", CODE], capture_output=True,
                          text=True, timeout=600, env=env, cwd=REPO)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-3000:])
    assert "LOCKSTEP-OK" in proc.stdout

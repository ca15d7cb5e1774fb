"""Sphere perceptual-ON lockstep, in-suite pin (r4 VERDICT Missing #1).

Runs scripts/equivalence_study.py --sphere_perceptual in a subprocess: the
reference's hard-enabled VGG16 perceptual term ACTIVE on both sides via
weight-synced random towers (the torchvision shim's tower-seed mode + the
same state_dict converted into the flax tower), so the perceptual
GRADIENT path is cross-framework-exercised. 10 steps keep the pin inside
the pre-chaos window (step-0 rel delta 1.0e-6, max 2.7e-5 measured); the
full 50-step rows + chaos-control bands live in EQUIVALENCE.json/BENCH.md.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STUDY = os.path.join(REPO, "scripts", "equivalence_study.py")

pytestmark = pytest.mark.skipif(
    not os.path.isfile("/root/reference/main.py"),
    reason="reference tree not available")


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    out = tmp_path_factory.mktemp("sphere_perc") / "out.json"
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, STUDY, "--sphere_perceptual", "--configs",
         "sphere_encoder:sum", "--steps", "10", "--optimizer", "rmsprop",
         "--json", str(out)],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(out) as f:
        return json.load(f)["results"][0]


def test_perceptual_forward_exact_at_step0(result):
    # step 0 is the pure cross-framework forward of the smooth-L1 +
    # VGG-perceptual losses through synced towers: conv-stack fp floor
    assert result["first_loss"]["rel_delta"] < 1e-5, result["first_loss"]


def test_perceptual_trajectory_tracks(result):
    assert result["max_rel_loss_delta"] < 5e-4, result

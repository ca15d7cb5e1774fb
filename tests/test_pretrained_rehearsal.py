"""End-to-end pretrained-weights drop-in rehearsal (VERDICT r3 item 5).

Runs scripts/pretrained_rehearsal.py in a subprocess: torchvision-layout
state_dict ``.pth`` files (random-init oracle mirrors) -> the SHIPPED
converter CLI (--inception_sd/--vgg_sd) -> MOVAE_INCEPTION_WEIGHTS /
MOVAE_VGG16_WEIGHTS env vars -> merge_pretrained -> FID/KID/IS/LPIPS
through the production surfaces, asserted against the torch side THROUGH
THE CONVERTED FILES (the oracle tests cover the same math in-memory; this
covers the files + env plumbing a real torchvision drop-in uses).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "pretrained_rehearsal.py")


@pytest.fixture(scope="module")
def rehearsal(tmp_path_factory):
    out = tmp_path_factory.mktemp("rehearsal")
    report = out / "report.json"
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--out", str(out), "--cpu_score",
         "--json", str(report)],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:] + proc.stdout[-2000:]
    with open(report) as f:
        return json.load(f)


def test_rehearsal_passes(rehearsal):
    assert rehearsal["ok"], rehearsal


@pytest.mark.parametrize("metric", ["fid", "kid", "inception_score",
                                    "lpips"])
def test_rehearsal_metric_agreement(rehearsal, metric):
    assert rehearsal["rel_delta"][metric] < 5e-2, rehearsal

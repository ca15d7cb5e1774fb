"""Eval-pipeline lockstep vs the UNMODIFIED reference (r4 VERDICT Next #1,
in-suite subset).

Runs scripts/eval_equivalence_study.py in a subprocess (refharness must
never activate inside the shared pytest process): from one weight-synced
checkpoint, the reference's own ``evaluate`` (exact codebook-usage union,
main.py:238-331), ``evaluate_with_recon_metrics`` (main.py:376-463)
through weight-synced random towers (the torchvision shim's
MOVAE_REFHARNESS_TOWER_SEED mode), its evaluate.py HV indicator +
``load_model_from_checkpoint`` reload (evaluate.py:20-106), against
movae_tpu's loop.evaluate / final_metrics / evaluate.py loader — plus an
independent inclusion-exclusion HV oracle inside the study.

One VQ config keeps the in-suite cost down (the full 4-family matrix runs
offline; results in EQUIVALENCE_EVAL.json / BENCH.md).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STUDY = os.path.join(REPO, "scripts", "eval_equivalence_study.py")

pytestmark = pytest.mark.skipif(
    not os.path.isfile("/root/reference/main.py"),
    reason="reference tree not available")


@pytest.fixture(scope="module")
def study_result(tmp_path_factory):
    out = tmp_path_factory.mktemp("eval_equiv") / "eval_equiv.json"
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, STUDY, "--configs", "vq_vae:sum", "--steps", "5",
         "--json", str(out)],
        capture_output=True, text=True, timeout=3600, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(out) as f:
        return json.load(f)["results"][0]


def test_eval_losses_lockstep(study_result):
    assert study_result["max_rel_loss_delta"] < 1e-5, study_result


def test_codebook_usage_union_exact(study_result):
    row = study_result["eval_losses"]["codebook_usage_percentage"]
    assert row["movae"] == row["torch"], row


def test_hv_cross_framework_and_oracle(study_result):
    hv = study_result["hv"]
    assert hv["rel_delta_cross"] < 1e-6, hv
    # the pymoo-shim value must equal the independent inclusion-exclusion
    # oracle computed in the study (de-circularized check)
    assert hv["rel_delta_vs_oracle"] < 1e-12, hv


def test_recon_metrics_lockstep(study_result):
    for k, row in study_result["recon"].items():
        # weight-synced towers + identical inputs: psnr/ssim tight; the
        # lpips/rfid paths stack ~100 f32 convs on two frameworks
        tol = 1e-5 if k in ("psnr", "ssim") else 1e-3
        assert row["rel_delta"] < tol, (k, row)
    assert study_result["fid8"]["rel_delta"] < 1e-2, study_result["fid8"]
    assert study_result["inception_feature_max_rel_delta"] < 1e-4


def test_checkpoint_reloads_reproduce_eval(study_result):
    r = study_result["reload"]
    assert r["movae_max_loss_delta"] == 0.0, r
    assert r["torch_max_loss_delta"] == 0.0, r


def test_single_vs_double_pass_consistent(study_result):
    assert study_result["torch_single_vs_double_pass_max_delta"] == 0.0

"""Training lockstep vs the UNMODIFIED reference pipeline (VERDICT r2
item 1, in-suite subset).

Runs scripts/equivalence_study.py in a subprocess (the reference tree
shadows top-level ``main``/``models``/``utils``, so it must never be
activated inside the shared pytest process): the reference's own
train_epoch/models/loss_function/mtl_backward (through the refharness
torchjd shim, itself anchored by tests/test_refharness.py) against
movae_tpu's jitted train step — same init, same batches, same optimizer.

Residual deltas have a known mechanism: at random init a few VQ argmin
code assignments sit on fp ties and flip between frameworks (0.5%-level
deltas on the tiny embedding/commitment components at step 0, decaying as
assignments sharpen); the total-loss trajectory agrees to <1e-3 and the
aggregation weights to <1e-3 absolute.
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


CONFIGS = ["vq_vae:sum", "vq_vae:upgrad", "vq_vae:pcgrad", "vq_vae:cagrad",
           "vq_vae:nashmtl", "vq_vae:mgda_gn", "vq_vae:comfort",
           "recursive_kl_vae:mgda",
           # r4 family extension: z_prior replay + sphere draw replay
           "cycle_vae:upgrad", "sphere_encoder:upgrad"]


@pytest.fixture(scope="module")
def study_results(tmp_path_factory):
    out = tmp_path_factory.mktemp("equiv") / "equiv.json"
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, STUDY, "--configs", *CONFIGS,
         "--steps", "10", "--optimizer", "rmsprop", "--json", str(out)],
        capture_output=True, text=True, timeout=3600, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(out) as f:
        return {f"{r['arch']}:{r['aggregator']}": r
                for r in json.load(f)["results"]}


@pytest.mark.parametrize("config", CONFIGS)
def test_loss_trajectory_tracks_reference(study_results, config):
    res = study_results[config]
    assert res["max_rel_loss_delta"] < 2e-3, res
    # the trajectory must CONVERGE toward the reference, not drift away
    assert res["last_loss"]["rel_delta"] < 1e-3, res


@pytest.mark.parametrize("config", [
    "vq_vae:upgrad",   # exact active-set dual-cone QP vs scipy NNLS
    "vq_vae:pcgrad",   # replayed random projection order (r4)
    "vq_vae:cagrad",   # exact support enumeration vs multistart SLSQP (r4)
    "vq_vae:mgda_gn",  # loss-normalized Frank-Wolfe (r4)
    "cycle_vae:upgrad",       # z_prior replay (r4)
    "sphere_encoder:upgrad",  # sphere draw replay, 3-objective (r4)
])
def test_weights_track_reference(study_results, config):
    """movae's in-jit solvers vs the reference path's host solvers — two
    unrelated implementations, same alphas. nashmtl is asserted in
    RELATIVE terms separately (zero-Gramian-row tasks carry ~1e6-scale
    weights with zero gradient-space influence)."""
    res = study_results[config]
    assert res["max_abs_weight_delta"] < 1e-3, res


def test_nashmtl_weights_track_reference_relative(study_results):
    res = study_results["vq_vae:nashmtl"]
    assert res["max_rel_weight_delta"] < 1e-2, res


@pytest.mark.parametrize("config", CONFIGS)
def test_params_stay_close(study_results, config):
    res = study_results[config]
    assert res["final_max_param_delta"] < 5e-2, res

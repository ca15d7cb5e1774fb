"""Archive-ingestion rehearsal, in-suite subset (r4 VERDICT Next #5).

Runs scripts/archive_ingestion_rehearsal.py in a subprocess at MB scale:
the same REAL code paths the GB offline run exercises — _ensure_celeba's
download+zip-extraction fed from a file:// mirror through the real
urlretrieve, _load_celeba_folder's crop/resize decode sweep, _hf_images
over a real `datasets` parquet reader — with the warm-run memmap-hit
assertion and a training/loader consumption pass. GB-scale numbers live
in BENCH.md (decode throughput + warm speedup).

Subprocess because the script force-CPUs itself and patches module
globals in movae_tpu.data scoped to its own process.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "archive_ingestion_rehearsal.py")


@pytest.fixture(scope="module")
def rehearsal(tmp_path_factory):
    out = tmp_path_factory.mktemp("arch") / "rehearsal.json"
    work = tmp_path_factory.mktemp("arch_work")
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--target_gb", "0.01", "--work", str(work),
         "--json", str(out)],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-3000:])
    with open(out) as f:
        return json.load(f)["results"]


def test_celeba_zip_ingestion(rehearsal):
    r = rehearsal["celeba"]
    assert r["n_images"] > 0 and r["zip_bytes"] >= 1e7
    assert r["input_size"] == 64
    assert r["n_train"] > 0
    # warm run must not rebuild the memmap (mtime assertion inside the
    # script) and must be much faster than the decode sweep
    assert r["warm_ingest_s"] < r["cold_ingest_s"]


def test_celeba_training_consumes_archive(rehearsal):
    t = rehearsal["celeba"]["train"]
    assert t["steps"] == 10
    import math
    assert math.isfinite(t["last_loss"])


def test_hf_parquet_ingestion(rehearsal):
    r = rehearsal["hf_parquet"]
    # ~0.01 GB target; parquet framing overhead means the on-disk shard
    # bytes land a little under the JPEG-payload-probe estimate
    assert r["shards"] >= 2 and r["shard_bytes"] >= 5e6
    assert r["input_size"] == 256
    assert r["warm_ingest_s"] < r["cold_ingest_s"]
    assert r["loader_img_s"] > 0

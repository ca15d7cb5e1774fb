"""Two-process jax.distributed smoke (SURVEY.md §2.5 DCN row; VERDICT r1
item 9): actually spawns 2 worker processes with gloo collectives and
exercises global batch assembly, train-step lockstep, process-0 IO gating
and the partial-codes-cache re-extract agreement."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_two_process_distributed_smoke():
    env = dict(os.environ)
    # the launcher forces its own CPU/devices env; just make sure the
    # pytest re-exec guard marker doesn't leak confusion into the workers
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts/multihost_smoke.py")],
        env=env, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "multihost smoke: PASS" in proc.stdout

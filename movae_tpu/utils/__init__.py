"""Shared utilities: meters, seeding (reference utils/utils.py:45-109)."""

from __future__ import annotations

import random

import numpy as np


class AverageMeter:
    """Running average tracker (reference utils/utils.py:45-77)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def set_seed(seed: int) -> None:
    """Seed host-side RNGs (reference utils/utils.py:45-60). Device-side
    randomness is explicit jax.random key threading derived from this seed."""
    random.seed(seed)
    np.random.seed(seed)


def require_live_backend(max_retries: int = 20, sleep_s: float = 30.0,
                         probe_timeout_s: float = 90.0) -> None:
    """Wait out a transient accelerator-backend outage until
    ``jax.devices()`` initializes.

    The TPU in this environment is reached over a tunnel with two distinct
    outage modes: backend init can FAIL (RuntimeError, cached for the life
    of the process) or HANG indefinitely (the tunnel accepts the connection
    but never answers — observed 2026-08-18). Against the hang, the parent
    must never be the first process to touch ``jax.devices()``: we probe in
    a killable SUBPROCESS with a timeout and sleep/retry until a probe
    succeeds (bounded: ~``max_retries * (sleep_s + probe_timeout_s)``).
    Against the cached failure, the legacy path re-execs the original
    command line (``MOVAE_BACKEND_RETRY``-bounded). Script entry points
    that own their process (bench.py, scripts/step_cost.py,
    scripts/*_ab.py) call this; __graft_entry__.py deliberately does NOT —
    it is imported as a module by the driver, and re-exec'ing would restart
    the importer."""
    import os
    import subprocess
    import sys
    import time

    for n in range(max_retries + 1):
        try:
            rc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s, capture_output=True).returncode
            why = f"probe rc={rc}"
        except subprocess.TimeoutExpired:
            rc, why = -1, f"probe hung >{probe_timeout_s:.0f}s"
        if rc == 0:
            break
        if n >= max_retries:
            raise RuntimeError(
                f"accelerator backend unreachable after {max_retries} "
                f"probes ({why})")
        print(f"[movae_tpu] backend unavailable ({why}); probe "
              f"{n + 1}/{max_retries} in {sleep_s:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(sleep_s)

    try:
        import jax

        jax.devices()
        os.environ.pop("MOVAE_BACKEND_RETRY", None)
        return
    except RuntimeError as e:
        n = int(os.environ.get("MOVAE_BACKEND_RETRY", "0"))
        if n >= max_retries:
            raise
        print(f"[movae_tpu] backend init failed ({e}); retry {n + 1}/"
              f"{max_retries} in {sleep_s:.0f}s", file=sys.stderr, flush=True)
        os.environ["MOVAE_BACKEND_RETRY"] = str(n + 1)
        time.sleep(sleep_s)
        # sys.orig_argv preserves interpreter flags (-u, -X, -m ...) that
        # sys.argv drops; exec the resolved interpreter path (orig_argv[0]
        # may be a bare 'python')
        orig = list(getattr(sys, "orig_argv", []) or [])
        tail = orig[1:] if len(orig) > 1 else sys.argv
        os.execv(sys.executable, [sys.executable] + tail)


def enable_persistent_compilation_cache(path: str = None) -> None:
    """Turn on the persistent XLA compile cache so repeat runs of the same
    program skip the (multi-minute) first compile — runner.py batch mode
    launches a fresh interpreter per config and benefits most.

    Set via ``jax.config.update`` rather than env vars: some environments
    (e.g. a sitecustomize that registers a TPU plugin) import jax before
    any CLI code runs, which makes env vars set by the CLI too late. The
    ``JAX_COMPILATION_CACHE_DIR`` env var still takes precedence when set
    before interpreter start; set it to "" to opt out entirely."""
    import os

    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env == "":
        return
    if env is None and path is None:
        # default path is fingerprinted by host CPU features: CPU AOT
        # entries from a different host family SIGILL on load (hostfp.py)
        from movae_tpu.utils.hostfp import fingerprinted_cache_dir

        path = fingerprinted_cache_dir(
            os.path.expanduser("~/.cache/movae_tpu_jax"))
    path = env or path
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ.get(
                "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", 2.0)))
    except Exception:  # pragma: no cover - cache is best-effort
        pass

"""Test config: force CPU with 8 virtual devices so sharding tests can
exercise the data-parallel mesh without TPU hardware.

NOTE on this environment: a sitecustomize hook registers the axon TPU PJRT
plugin at *interpreter startup* (before conftest runs) whenever
``PALLAS_AXON_POOL_IPS`` is set, and that registration dials a TPU relay —
CPU-only test runs then intermittently block on it for minutes. Blanking
the variable here is too late, so if it is set we re-exec the interpreter
once with it removed (after suspending pytest's fd capture, which has
already swapped out fd 1/2 by the time conftest code runs).
"""

import os
import sys

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: this host has a single CPU core and some
# jitted graphs (jacrev over full param trees) take minutes to compile —
# cache them across pytest invocations. The dir is fingerprinted by the
# host's CPU feature flags: CPU AOT entries from a different host family
# SIGILL on load (movae_tpu/utils/hostfp.py), so each family gets its own
# namespace.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from movae_tpu.utils.hostfp import fingerprinted_cache_dir  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      fingerprinted_cache_dir("/tmp/jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def pytest_configure(config):
    if not os.environ.get("PALLAS_AXON_POOL_IPS") or os.environ.get(
            "_MOVAE_TESTS_REEXEC"):
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.suspend_global_capture(in_=True)
        except Exception:
            pass
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["_MOVAE_TESTS_REEXEC"] = "1"
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *config.invocation_params.args],
              env)

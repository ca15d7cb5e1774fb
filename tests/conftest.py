"""Test config: force CPU with 8 virtual devices so sharding tests can
exercise the data-parallel mesh without TPU hardware.

NOTE: this environment's axon sitecustomize pins JAX_PLATFORMS=axon and
overrides it at register() time, so ``JAX_PLATFORMS=cpu`` is ignored;
``JAX_PLATFORM_NAME`` still wins. Set both defensively.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

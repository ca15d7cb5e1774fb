"""Host-CPU fingerprint for the persistent XLA compile cache.

XLA's CPU backend AOT-compiles with the build host's vector ISA; loading a
persistent-cache entry produced on a CPU with different features crashes
outright (cpu_aot_loader warns "could lead to execution errors such as
SIGILL" on machine-feature mismatch — observed killing the multichip
dryrun bootstrap, round 2). The jax cache key does NOT include host CPU
features, so a cache directory shared across heterogeneous hosts is
poisoned for every host but the first compiler.

Fix: suffix cache directories with a fingerprint of the CPU feature flags,
so each host family gets its own namespace and cross-host entries are
never even visible. Kept dependency-free (no jax import) so conftest /
bootstrap code can call it before backend init.
"""

from __future__ import annotations

import hashlib
import platform


def host_fingerprint() -> str:
    """Short stable hash of this host's CPU ISA feature set.

    Hashes the sorted ``flags`` field of /proc/cpuinfo (x86) or the
    ``Features`` field (arm), plus the machine arch. Falls back to the
    arch + processor string when /proc/cpuinfo is unavailable (macOS).
    Only ISA-level features go in — core counts, frequencies and cache
    sizes don't affect codegen validity.
    """
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip().lower()
                if key in ("flags", "features"):
                    feats = " ".join(sorted(set(line.split(":", 1)[1].split())))
                    break
    except OSError:  # pragma: no cover - non-Linux
        feats = platform.processor()
    blob = f"{platform.machine()}|{feats}".encode()
    return hashlib.md5(blob).hexdigest()[:10]


def fingerprinted_cache_dir(base: str) -> str:
    """``<base>-<fp>``: per-host-family compile-cache directory.

    One-time migration: if the legacy unfingerprinted ``base`` dir exists
    (pre-r3 layout) and the fingerprinted one doesn't, rename it in —
    entries in the legacy dir were compiled by SOME host, almost always
    this one (the quarantine backstop in __graft_entry__ covers the
    rename-from-a-foreign-host case).
    """
    import os

    path = f"{base.rstrip('/')}-{host_fingerprint()}"
    try:
        if os.path.isdir(base) and not os.path.exists(path):
            os.rename(base, path)
    except OSError:  # pragma: no cover - best-effort
        pass
    return path

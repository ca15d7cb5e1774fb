"""Multi-host lockstep of the VQ code cache's hit/miss decision.

The reference cache is single-process (vq_codes_lmdb.py:182-240); our
multi-host port keys caches per process, so a partial earlier run can leave
host A with a cache and host B without. get_or_extract_codes must then make
every host extract (the sweep runs jitted global-mesh collectives — a
miss-only extraction would deadlock the hitting hosts). These tests pin the
agreement rule single-process by faking process_count/process_allgather.
"""

import numpy as np
import pytest


def _fake_loader(n=6, hw=4):
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(n, 8, 8, 3)).astype(np.float32)
    return [(imgs, np.zeros(n, np.int64), n)]


def _extract_fn(calls):
    def fn(imgs):
        calls.append(len(imgs))
        return np.zeros((len(imgs), 4, 4), np.int32)
    return fn


@pytest.fixture
def two_host(monkeypatch):
    """Pretend to be process 0 of 2; capture the allgather result to set."""
    import jax
    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    state = {"hits": None}

    def fake_allgather(x):
        assert state["hits"] is not None, "test must set per-host hits"
        return np.asarray(state["hits"])

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    return state


def _get(tmp_path, calls):
    from movae_tpu.utils.codes_cache import get_or_extract_codes

    return get_or_extract_codes(
        _extract_fn(calls), _fake_loader(), str(tmp_path), "vq_vae",
        "synthetic-8-6", 16, 8)


def test_partial_hit_forces_all_hosts_to_extract(tmp_path, two_host):
    calls = []
    # first run populates this host's cache (both hosts miss)
    two_host["hits"] = [False, False]
    _, hit = _get(tmp_path, calls)
    assert not hit and calls == [6]

    # this host hits, but the other host's cache is missing -> re-extract
    two_host["hits"] = [True, False]
    _, hit = _get(tmp_path, calls)
    assert not hit and calls == [6, 6]

    # every host hits -> served from cache, no extraction
    two_host["hits"] = [True, True]
    levels, hit = _get(tmp_path, calls)
    assert hit and calls == [6, 6]
    assert np.asarray(levels["codes"]).shape == (6, 4, 4)


def test_cache_key_is_per_process_shard(two_host):
    from movae_tpu.utils.codes_cache import cache_key

    assert cache_key("vq_vae", "cifar10", 512, 32).endswith("_p0of2")

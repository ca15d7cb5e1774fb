"""Multi-host lockstep of the device-resident data plans (data/device.py).

DeviceData promises that every process can compute every other process's
epoch plan from (seed, epoch, shard) alone — step counts, shard layouts,
and the tail walk must agree across processes without communication, or
the jitted global-batch steps deadlock (the same class of hazard as the
code-cache hit/miss agreement). These tests build one DeviceData per fake
process (upload patched out) and assert the plans are identical where they
must be, disjoint-and-complete where they partition the dataset.
"""

import jax
import numpy as np
import pytest

N, B, SEED = 103, 16, 3


def _dataset(n=N):
    from movae_tpu.data import ArrayDataset
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (n, 8, 8, 3), dtype=np.uint8)
    return ArrayDataset(imgs, flip=False, random_resized_crop=None)


def _mk(monkeypatch, pi, pc, n=N):
    from movae_tpu.data.device import DeviceData
    from movae_tpu.parallel.mesh import DataParallel

    monkeypatch.setattr(jax, "process_count", lambda: pc)
    monkeypatch.setattr(jax, "process_index", lambda: pi)
    monkeypatch.setattr(DeviceData, "_upload", lambda self: None)
    return DeviceData(_dataset(n), DataParallel(), B, seed=SEED)


def _gids(dd, idx_local):
    """Map THIS process's (steps, nd_local*b_loc) shard-local index block
    to global dataset ids (process p's column block j covers global shard
    p*nd_local + j)."""
    out = np.empty(idx_local.shape, np.int64)
    for c in range(idx_local.shape[1]):
        s = dd.pi * dd.nd_local + c // dd.b_loc
        out[:, c] = dd._shard_global_ids(s)[idx_local[:, c]]
    return out


def test_plans_agree_and_partition_the_dataset(monkeypatch):
    dds = [_mk(monkeypatch, pi, 2) for pi in (0, 1)]

    # layout bookkeeping is identical on every process
    assert dds[0].steps == dds[1].steps > 0
    assert dds[0].n_shard == dds[1].n_shard
    assert np.array_equal(dds[0].shard_counts, dds[1].shard_counts)
    assert dds[0].tail_len == dds[1].tail_len

    plans = [dd.epoch_plan(epoch=1) for dd in dds]
    # the global tail id list is computed identically everywhere
    assert np.array_equal(plans[0][1], plans[1][1])
    # each process's device-fed rows + the shared tail = every real image
    # exactly once (pads never sampled, no row on two processes)
    sampled = np.concatenate(
        [_gids(dd, idx).ravel() for dd, (idx, _) in zip(dds, plans)])
    all_ids = np.concatenate([sampled, plans[0][1]])
    assert sorted(all_ids.tolist()) == list(range(N))


def test_tail_walk_stays_in_lockstep(monkeypatch):
    dds = [_mk(monkeypatch, pi, 2) for pi in (0, 1)]
    tails = [dd.epoch_plan(epoch=0)[1] for dd in dds]
    walks = [list(dd.tail_batches(t, np.random.default_rng(0)))
             for dd, t in zip(dds, tails)]

    # same number of tail dispatches on every process, same trimmed batch
    # shape per dispatch (a shape mismatch would desync the jitted steps)
    assert len(walks[0]) == len(walks[1]) > 0
    for (img0, _), (img1, _) in zip(walks[0], walks[1]):
        assert img0.shape == img1.shape
    # valid counts over all processes sum to the global tail length
    total_valid = sum(nv for w in walks for _, nv in w)
    assert total_valid == dds[0].tail_len


def test_data_axis_must_divide_by_process_count(monkeypatch):
    with pytest.raises(ValueError, match="divisible by process count"):
        _mk(monkeypatch, 0, 3)  # nd=8, pc=3

"""Disk-backed (memory-mapped) image-store cache for large datasets.

The reference materializes HF datasets in RAM per-item at access time
(utils/utils.py:122-142). Our hot loop wants the whole archive as one
contiguous uint8 array for the fused native gather; for ImageNet-256 that
array is ~250 GB, so it must live on disk and be memory-mapped, not in RAM.
These tests exercise the one-time materialization + reopen path and verify
the Loader/ArrayDataset behave identically over a memmap archive.
"""

import numpy as np

from movae_tpu.data import ArrayDataset, Loader, _materialize_memmap


def _items(n, size=8, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, (n,)).astype(np.int64)
    return imgs, labels


def test_materialize_and_reopen(tmp_path):
    imgs, labels = _items(12)
    path = str(tmp_path / "store.npy")

    calls = []

    def item_fn(i):
        calls.append(i)
        return imgs[i], labels[i]

    out, out_labels = _materialize_memmap(path, 12, item_fn)
    assert isinstance(out, np.memmap)
    assert not out.flags.writeable
    np.testing.assert_array_equal(np.asarray(out), imgs)
    np.testing.assert_array_equal(out_labels, labels)
    assert len(calls) == 12

    # second open must hit the cache: item_fn must not be called again
    def explode(i):
        raise AssertionError("cache miss")

    out2, labels2 = _materialize_memmap(path, 12, explode)
    np.testing.assert_array_equal(np.asarray(out2), imgs)
    np.testing.assert_array_equal(labels2, labels)


def test_materialize_rejects_stale_count(tmp_path):
    imgs, labels = _items(6)
    path = str(tmp_path / "store.npy")
    _materialize_memmap(path, 6, lambda i: (imgs[i], labels[i]))
    # asking for a different count rebuilds rather than serving stale data
    imgs2, labels2 = _items(9, seed=3)
    out, out_labels = _materialize_memmap(path, 9,
                                          lambda i: (imgs2[i], labels2[i]))
    assert len(out) == 9
    np.testing.assert_array_equal(np.asarray(out), imgs2)
    np.testing.assert_array_equal(out_labels, labels2)


def test_materialize_resizes_ragged_items(tmp_path):
    """Items whose spatial dims differ from the first are bicubic-resized to
    the archive shape (mirrors HFImageDataset's per-item transform,
    utils/utils.py:122-142)."""
    imgs, labels = _items(4, size=8)
    big = np.random.default_rng(1).integers(
        0, 256, (16, 16, 3), dtype=np.uint8)

    def item_fn(i):
        return (big if i == 2 else imgs[i]), labels[i]

    out, _ = _materialize_memmap(str(tmp_path / "s.npy"), 4, item_fn)
    assert out.shape == (4, 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(out[0]), imgs[0])


def test_array_dataset_over_memmap_matches_inmemory(tmp_path):
    imgs, labels = _items(20)
    path = str(tmp_path / "store.npy")
    mm, mm_labels = _materialize_memmap(
        path, 20, lambda i: (imgs[i], labels[i]))

    ds_mem = ArrayDataset(imgs, labels, flip=True, normalize=True)
    ds_mm = ArrayDataset(mm, mm_labels, flip=True, normalize=True)

    for raw in (False, True):
        a = Loader(ds_mem, batch_size=8, shuffle=True, seed=7, raw=raw)
        b = Loader(ds_mm, batch_size=8, shuffle=True, seed=7, raw=raw)
        for (xa, ya, na), (xb, yb, nb) in zip(a, b):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)
            assert na == nb


def test_get_dataset_hf_uses_cache(tmp_path, monkeypatch):
    """get_dataset routes HF-backed datasets through the memmap store keyed
    under <data_dir>/movae_cache (so ImageNet-scale archives never need to
    fit in host RAM, and re-runs skip the decode sweep)."""
    import movae_tpu.data as data_mod

    imgs, labels = _items(10, size=8)

    class FakeHF:
        column_names = ["image", "label"]

        def __len__(self):
            return len(imgs)

        def __getitem__(self, i):
            return {"image": imgs[i], "label": int(labels[i])}

    monkeypatch.setattr(data_mod, "_hf_load", lambda repo, split: FakeHF())
    a, la = data_mod._hf_images("fake/repo", "train",
                                data_dir=str(tmp_path))
    assert isinstance(a, np.memmap)
    np.testing.assert_array_equal(np.asarray(a), imgs)
    np.testing.assert_array_equal(la, labels)

    # cache hit: loading again must not touch the HF dataset at all
    monkeypatch.setattr(data_mod, "_hf_load",
                        lambda repo, split: (_ for _ in ()).throw(
                            AssertionError("cache miss")))
    b, lb = data_mod._hf_images("fake/repo", "train",
                                data_dir=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(b), imgs)
    np.testing.assert_array_equal(lb, labels)


def test_native_gather_from_memmap(tmp_path):
    """The fused native assembler reads straight out of the page cache:
    results over a memmap archive match the numpy fallback exactly."""
    from movae_tpu.data import native

    imgs, labels = _items(16, size=8)
    path = str(tmp_path / "store.npy")
    mm, _ = _materialize_memmap(path, 16, lambda i: (imgs[i], labels[i]))

    idx = np.array([3, 0, 15, 7], np.int64)
    fm = np.array([1, 0, 1, 0], np.uint8)
    got = native.assemble_batch(mm, idx, fm, True)
    want = imgs[idx].astype(np.float32) / 255.0
    want[fm.astype(bool)] = want[fm.astype(bool), :, ::-1, :]
    want = (want - 0.5) / 0.5
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)

    got_raw = native.assemble_batch_raw(mm, idx, fm)
    want_raw = imgs[idx].copy()
    want_raw[fm.astype(bool)] = want_raw[fm.astype(bool), :, ::-1, :]
    np.testing.assert_array_equal(got_raw, want_raw)

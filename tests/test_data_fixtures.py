"""Real-data dress rehearsal via on-disk fixtures (VERDICT r2 item 8).

The networked cold paths — CelebA download + zip extraction + partition
split + crop/resize sweep, and the HF image-dataset materialization
(short_side / center_crop / out_size variants, memmap store reuse) — are
exercised end-to-end with tiny synthetic archives, so cold-path bugs
surface here instead of on the first networked run.

Reference surface: utils/utils.py:9-43 (download), 111-142
(MyCelebA/HFImageDataset), 144-426 (get_dataset).
"""

import io
import os
import zipfile

import numpy as np
import pytest
from PIL import Image

from movae_tpu import data as data_mod
from movae_tpu.data import _hf_images, get_dataset


def _fake_celeba_zip() -> bytes:
    """8 jpgs in the torchvision layout, 178x218 like real img_align."""
    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for i in range(8):
            img = Image.fromarray(
                rng.integers(0, 255, (218, 178, 3), dtype=np.uint8))
            ibuf = io.BytesIO()
            img.save(ibuf, format="JPEG")
            zf.writestr(f"img_align_celeba/{i + 1:06d}.jpg",
                        ibuf.getvalue())
    return buf.getvalue()


_PARTITION = "".join(f"{i + 1:06d}.jpg {s}\n"
                     for i, s in enumerate([0, 0, 0, 0, 1, 1, 2, 2]))


def test_celeba_missing_no_network_raises_manual_message(tmp_path,
                                                         monkeypatch):
    monkeypatch.setattr(data_mod, "_network_available", lambda **_: False)
    with pytest.raises(FileNotFoundError, match="drive.google.com"):
        get_dataset("celeba", data_dir=str(tmp_path))


def test_celeba_download_failure_raises_manual_message(tmp_path,
                                                       monkeypatch):
    monkeypatch.setattr(data_mod, "_network_available", lambda **_: True)

    def boom(url, dest):
        raise OSError("connection reset")

    import urllib.request
    monkeypatch.setattr(urllib.request, "urlretrieve", boom)
    with pytest.raises(RuntimeError, match="drive.google.com"):
        get_dataset("celeba", data_dir=str(tmp_path))


def test_celeba_auto_download_end_to_end(tmp_path, monkeypatch):
    """Fake mirror -> zip extraction -> partition split -> crop-148 +
    bicubic-64 sweep -> memmap store; second call must hit the store even
    with the downloader broken."""
    monkeypatch.setattr(data_mod, "_network_available", lambda **_: True)
    payload = {"img_align_celeba.zip": _fake_celeba_zip(),
               "list_eval_partition.txt": _PARTITION.encode()}

    def fake_urlretrieve(url, dest):
        with open(dest, "wb") as f:
            f.write(payload[os.path.basename(url).replace(".part", "")])

    import urllib.request
    monkeypatch.setattr(urllib.request, "urlretrieve", fake_urlretrieve)

    train, test, size = get_dataset("celeba", data_dir=str(tmp_path))
    assert size == 64
    assert len(train) == 4 and len(test) == 2
    assert train.images.shape == (4, 64, 64, 3)
    assert train.images.dtype == np.uint8
    xb, _ = train.get_batch(np.arange(4), rng=np.random.default_rng(0))
    assert xb.shape == (4, 64, 64, 3) and np.isfinite(xb).all()

    # store hit: break the network path entirely, must still load
    monkeypatch.setattr(urllib.request, "urlretrieve", None)
    train2, _, _ = get_dataset("celeba", data_dir=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(train2.images),
                                  np.asarray(train.images))


class _FakeHFSplit:
    """Duck-typed datasets.Dataset: column_names, __len__, __getitem__."""

    def __init__(self, sizes, with_labels=True):
        rng = np.random.default_rng(1)
        self._rows = []
        for i, (w, h) in enumerate(sizes):
            img = Image.fromarray(
                rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
            row = {"image": img}
            if with_labels:
                row["label"] = i % 3
            self._rows.append(row)
        self.column_names = (["image", "label"] if with_labels
                             else ["image"])

    def __len__(self):
        return len(self._rows)

    def __getitem__(self, i):
        return self._rows[i]


def test_hf_images_out_size_and_labels(monkeypatch, tmp_path):
    fake = _FakeHFSplit([(40, 30), (64, 64), (30, 50)])
    monkeypatch.setattr(data_mod, "_hf_load", lambda repo, split: fake)
    imgs, labels = _hf_images("acme/faces", "train", out_size=32,
                              data_dir=str(tmp_path))
    assert imgs.shape == (3, 32, 32, 3) and imgs.dtype == np.uint8
    np.testing.assert_array_equal(labels, [0, 1, 2])
    # memmap store reuse: loader must not be called again
    monkeypatch.setattr(data_mod, "_hf_load",
                        lambda repo, split: pytest.fail("store missed"))
    imgs2, _ = _hf_images("acme/faces", "train", out_size=32,
                          data_dir=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(imgs2), np.asarray(imgs))


def test_hf_images_short_side_center_crop(monkeypatch):
    fake = _FakeHFSplit([(500, 667), (300, 300)], with_labels=False)
    monkeypatch.setattr(data_mod, "_hf_load", lambda repo, split: fake)
    imgs, labels = _hf_images("acme/flowers", "train", short_side=128)
    assert imgs.shape == (2, 128, 128, 3)
    np.testing.assert_array_equal(labels, [0, 0])
    imgs, _ = _hf_images("acme/flowers", "train", center_crop=200,
                         out_size=64)
    assert imgs.shape == (2, 64, 64, 3)


def test_hf_images_limit(monkeypatch):
    fake = _FakeHFSplit([(32, 32)] * 10)
    monkeypatch.setattr(data_mod, "_hf_load", lambda repo, split: fake)
    imgs, labels = _hf_images("acme/faces", "test", out_size=16, limit=4)
    assert imgs.shape == (4, 16, 16, 3) and len(labels) == 4


def test_dataset_input_size_table():
    from movae_tpu.data import dataset_input_size

    assert dataset_input_size("cifar10") == 32
    assert dataset_input_size("celeba") == 64
    assert dataset_input_size("celeba-128") == 128
    assert dataset_input_size("synthetic-48-64") == 48

"""Data layer: datasets + host-side batch pipeline.

Mirrors the reference's dataset surface (/root/reference/utils/utils.py:144-426):
cifar10/cifar100 (32px), imagenet (256px, HF), celeba (64px: center-crop 148
-> bicubic resize), celeba-128, celeba-hq (HF 256px), oxford-flower-102
(random-resized-crop 0.7-1.0), afhq/animal-face — train augmentation is a
random horizontal flip, optional Normalize(0.5, 0.5) to [-1, 1].

TPU-native differences from the reference:
  * torch-free: decoding/augment is numpy/PIL; batches are NHWC float32.
  * static batch shapes for jit: the loader pads the final partial batch by
    wrapping (and reports ``n_valid``) instead of emitting a ragged batch.
  * augmentation randomness is seeded (numpy Generator), not global torch.
  * ``synthetic[-<size>[-<n>]]`` datasets provide deterministic fake data for
    tests/benchmarks (this build environment has no network egress).

HF-backed datasets (imagenet, celeba-hq, flowers, afhq) load from the local
HF cache; downloads are attempted only if the environment allows them.
"""

from __future__ import annotations

import os
import pickle
from typing import Iterator, Optional, Tuple

import numpy as np

Array = np.ndarray


class ArrayDataset:
    """In-memory dataset of uint8 HWC images with lazy per-batch transforms."""

    def __init__(self, images: Array, labels: Optional[Array] = None,
                 flip: bool = False, normalize: bool = False,
                 random_resized_crop: Optional[Tuple[int, float, float]] = None):
        assert images.dtype == np.uint8 and images.ndim == 4
        self.images = images
        self.labels = (labels if labels is not None
                       else np.zeros((len(images),), np.int64))
        self.flip = flip
        self.normalize = normalize
        self.random_resized_crop = random_resized_crop

    def __len__(self) -> int:
        return len(self.images)

    @property
    def input_size(self) -> int:
        return self.images.shape[1]

    def get_batch(self, idx: Array, rng: Optional[np.random.Generator] = None,
                  raw: bool = False) -> Tuple[Array, Array]:
        """``raw=True`` emits uint8 (gather + aug only) so the float cast +
        normalize run on-device inside the jitted step — the host->device
        transfer is then 4x smaller (the hot-loop path)."""
        if self.random_resized_crop is not None and rng is None:
            # the crop is part of the dataset's transform contract (flowers
            # stores 300px archives for a 256px model) — never skip it just
            # because the caller wants a deterministic batch (figure panels)
            rng = np.random.default_rng(0)
        if self.random_resized_crop is None:
            # fused native path: gather (+ f32 + normalize unless raw) + flip
            from movae_tpu.data import native
            flip_mask = None
            if self.flip and rng is not None:
                flip_mask = (rng.random(len(idx)) < 0.5).astype(np.uint8)
            if raw:
                imgs = native.assemble_batch_raw(self.images, np.asarray(idx),
                                                 flip_mask)
            else:
                imgs = native.assemble_batch(self.images, np.asarray(idx),
                                             flip_mask, self.normalize)
            return imgs, self.labels[idx]
        imgs_u8 = _batch_random_resized_crop(
            self.images[idx], rng, *self.random_resized_crop)
        if self.flip and rng is not None:
            mask = rng.random(len(idx)) < 0.5
            imgs_u8[mask] = imgs_u8[mask, :, ::-1, :]
        if raw:
            return imgs_u8, self.labels[idx]
        imgs = imgs_u8.astype(np.float32) / 255.0
        if self.normalize:
            imgs = (imgs - 0.5) / 0.5
        return imgs, self.labels[idx]


def _batch_random_resized_crop(imgs_u8, rng, out_size, scale_lo, scale_hi):
    """RandomResizedCrop (bicubic) per image via PIL (flowers transform,
    utils.py:372-382)."""
    from PIL import Image

    out = np.empty((len(imgs_u8), out_size, out_size, imgs_u8.shape[-1]),
                   np.uint8)
    for i, im in enumerate(imgs_u8):
        h, w = im.shape[:2]
        area = h * w
        for _ in range(10):
            target = area * rng.uniform(scale_lo, scale_hi)
            ar = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
            cw = int(round(np.sqrt(target * ar)))
            ch = int(round(np.sqrt(target / ar)))
            if cw <= w and ch <= h:
                x0 = rng.integers(0, w - cw + 1)
                y0 = rng.integers(0, h - ch + 1)
                crop = im[y0:y0 + ch, x0:x0 + cw]
                break
        else:
            crop = im
        out[i] = np.asarray(Image.fromarray(crop).resize(
            (out_size, out_size), Image.BICUBIC))
    return out


class Loader:
    """Static-shape batch iterator (the DataLoader replacement,
    reference main.py:1140-1157)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False, raw: bool = False,
                 process_index: int = 0, process_count: int = 1):
        """``process_index``/``process_count`` shard the *per-step order*
        across hosts for multi-host (DCN) runs: every process walks the same
        seeded permutation but takes an interleaved slice of each global
        batch, so the union of host batches equals the single-host batch
        stream (pass ``jax.process_index()``/``jax.process_count()``).
        ``batch_size`` is the per-process batch size."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.raw = raw
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        gb = self.batch_size * self.process_count
        if self.drop_last:
            return n // gb
        return (n + gb - 1) // gb

    def __iter__(self) -> Iterator[Tuple[Array, Array, int]]:
        """Yields (images, labels, n_valid); the final batch is padded by
        wrapping to keep shapes static. With process sharding, each host
        takes an interleaved slice of every seeded global batch."""
        n = len(self.dataset)
        rng = np.random.default_rng((self.seed, self.epoch))
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        self.epoch += 1
        bs = self.batch_size
        gb = bs * self.process_count
        for start in range(0, n, gb):
            if self.drop_last and n - start < gb:
                # drop the GLOBAL tail, not the per-process slice: the
                # interleaved shards of a partial tail can differ in length
                # across processes, which would desync multi-host step
                # counts (one host enters a collective the other skipped)
                return
            idx = order[start:start + gb][self.process_index::
                                          self.process_count]
            n_valid = len(idx)
            if n_valid < bs:
                # wrap-pad to the static shape; np.resize repeats the order
                # cyclically so datasets smaller than the pad still fill it
                pad = np.resize(order, bs - n_valid)
                idx = np.concatenate([idx, pad]) if n_valid else pad
            imgs, labels = self.dataset.get_batch(idx, rng, raw=self.raw)
            yield imgs, labels, n_valid


# ---------------------------------------------------------------------------
# Dataset builders
# ---------------------------------------------------------------------------

def _load_cifar10(data_dir: str):
    root = os.path.join(data_dir, "cifar-10-batches-py")
    if not os.path.isdir(root):
        raise FileNotFoundError(
            f"CIFAR-10 not found at {root}. This environment cannot download; "
            "place the standard python-pickle batches there, or use dataset "
            "'synthetic-32' for smoke runs.")

    def load(names):
        xs, ys = [], []
        for name in names:
            with open(os.path.join(root, name), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            xs.append(d[b"data"])
            ys.append(np.asarray(d[b"labels"], np.int64))
        x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        return np.ascontiguousarray(x), np.concatenate(ys)

    train = load([f"data_batch_{i}" for i in range(1, 6)])
    test = load(["test_batch"])
    return train, test


def _load_cifar100(data_dir: str):
    root = os.path.join(data_dir, "cifar-100-python")
    if not os.path.isdir(root):
        raise FileNotFoundError(
            f"CIFAR-100 not found at {root}; use 'synthetic-32' for smoke runs.")

    def load(name):
        with open(os.path.join(root, name), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        return np.ascontiguousarray(x), np.asarray(d[b"fine_labels"], np.int64)

    return load("train"), load("test")


def _synthetic(size: int, n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    # structured fake images (smooth gradients + noise) so recon losses are
    # non-degenerate
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    base = np.stack([xx, yy, 0.5 * (xx + yy)], -1)[None]
    imgs = (base * 255 * rng.uniform(0.3, 1.0, (n, 1, 1, 3))
            + rng.normal(0, 20, (n, size, size, 3)))
    labels = rng.integers(0, 10, n).astype(np.int64)
    return np.clip(imgs, 0, 255).astype(np.uint8), labels


def _materialize_memmap(path: str, n: int, item_fn):
    """Build (or reopen) an on-disk uint8 image archive + int64 labels.

    ``item_fn(i) -> (uint8 HWC image, label)``. The archive is written once
    with constant host RAM (``open_memmap`` + per-item writes) and then
    reopened as a **read-only memory map**: datasets far larger than RAM
    (ImageNet-256 train is ~250 GB as one array) stream through the OS page
    cache, the fused native gather reads straight from it, and repeated runs
    skip the decode sweep entirely. Items whose shape differs from the first
    are bicubic-resized to the archive shape (per-item transform semantics of
    the reference HFImageDataset, utils/utils.py:122-142)."""
    lbl_path = path + ".labels.npy"
    if os.path.exists(path) and os.path.exists(lbl_path):
        imgs = np.load(path, mmap_mode="r")
        labels = np.load(lbl_path)
        if len(imgs) == n and len(labels) == n:
            return imgs, labels
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img0, lbl0 = item_fn(0)
    img0 = np.asarray(img0, np.uint8)
    # per-process tmp names + atomic os.replace: concurrent runner.py
    # subprocesses starting on the same dataset each build their own copy
    # (identical content — item_fn is deterministic) and the cache is only
    # ever visible fully-written; a shared tmp path would interleave writes
    tmp = f"{path}.tmp.{os.getpid()}.npy"
    lbl_tmp = f"{lbl_path}.tmp.{os.getpid()}.npy"
    out = np.lib.format.open_memmap(tmp, mode="w+", dtype=np.uint8,
                                    shape=(n,) + img0.shape)
    labels = np.zeros((n,), np.int64)
    out[0], labels[0] = img0, lbl0
    for i in range(1, n):
        img, lbl = item_fn(i)
        img = np.asarray(img, np.uint8)
        if img.shape != img0.shape:
            from PIL import Image
            img = np.asarray(Image.fromarray(img).resize(
                (img0.shape[1], img0.shape[0]), Image.BICUBIC), np.uint8)
        out[i], labels[i] = img, lbl
    out.flush()
    del out
    np.save(lbl_tmp, labels)
    os.replace(lbl_tmp, lbl_path)
    os.replace(tmp, path)
    return np.load(path, mmap_mode="r"), labels


def _hf_load(repo: str, split: str):
    from datasets import load_dataset
    return load_dataset(repo, split=split)


def _hf_images(repo: str, split: str, out_size: Optional[int] = None,
               center_crop: Optional[int] = None, limit: Optional[int] = None,
               data_dir: Optional[str] = None,
               short_side: Optional[int] = None):
    """Materialize an HF image dataset split into a uint8 array
    (HFImageDataset equivalent, utils.py:122-142). With ``data_dir`` set the
    decoded archive is cached under ``<data_dir>/movae_cache`` and served as
    a read-only memmap (bounded host RAM; instant re-runs).

    ``short_side``: resize the shorter side to N and center-crop an N-square
    — aspect-preserving storage for variable-size sources whose train
    transform crops later (flowers). A plain ``out_size`` square resize would
    squash e.g. a 500x667 photo before RandomResizedCrop ever sees it."""
    from PIL import Image

    cache = None
    if data_dir is not None:
        # keyed by (repo, split, transform) like the reference's md5 LMDB
        # key (vq_codes_lmdb.py:182-240) — a hit never touches HF at all
        cache = os.path.join(
            data_dir, "movae_cache",
            f"{repo.replace('/', '_')}_{split}_{out_size or 0}"
            f"_{center_crop or 0}_{limit or 0}"
            + (f"_ss{short_side}" if short_side else "") + ".npy")
        if os.path.exists(cache) and os.path.exists(cache + ".labels.npy"):
            return np.load(cache, mmap_mode="r"), np.load(
                cache + ".labels.npy")

    ds = _hf_load(repo, split)
    n = len(ds) if limit is None else min(limit, len(ds))
    key = "image" if "image" in ds.column_names else ds.column_names[0]
    has_label = "label" in ds.column_names

    def item_fn(i):
        # fetch the row ONCE: every ds[i] decodes the Image feature, so a
        # second index would double the archive-build decode cost
        row = ds[i]
        im = row[key]
        if not isinstance(im, Image.Image):
            im = Image.fromarray(np.asarray(im))
        im = im.convert("RGB")
        if short_side:
            w, h = im.size
            s = short_side / min(w, h)
            im = im.resize((max(short_side, round(w * s)),
                            max(short_side, round(h * s))), Image.BICUBIC)
            w, h = im.size
            left, top = (w - short_side) // 2, (h - short_side) // 2
            im = im.crop((left, top, left + short_side, top + short_side))
        if center_crop:
            w, h = im.size
            left, top = (w - center_crop) // 2, (h - center_crop) // 2
            im = im.crop((left, top, left + center_crop, top + center_crop))
        if out_size and im.size != (out_size, out_size):
            im = im.resize((out_size, out_size), Image.BICUBIC)
        label = row["label"] if has_label else 0
        return np.asarray(im, np.uint8), label

    if cache is not None:
        return _materialize_memmap(cache, n, item_fn)

    out = None
    labels = np.zeros((n,), np.int64)
    for i in range(n):
        arr, labels[i] = item_fn(i)
        if out is None:
            out = np.empty((n,) + arr.shape, np.uint8)
        out[i] = arr
    return out, labels


def dataset_input_size(dataset_name: str) -> int:
    """Image size for a dataset name WITHOUT loading any files — the sizes
    are fixed per dataset in the reference (utils.py:144-426). Lets offline
    tools (sample generators, checkpoint loaders) rebuild a model on a
    machine that has the checkpoint but not the dataset."""
    name = dataset_name.lower()
    if name.startswith("synthetic") or name.startswith("fake"):
        parts = name.split("-")
        return int(parts[1]) if len(parts) > 1 else 32
    if name in ("cifar10", "cifar100"):
        return 32
    if name == "celeba":
        return 64
    if name == "celeba-128":
        return 128
    return 256


def get_dataset(dataset_name: str, data_dir: str = "./data",
                normalize: bool = False):
    """Return (train_dataset, test_dataset, input_size) — the reference
    contract (utils.py:144-426)."""
    name = dataset_name.lower()

    if name.startswith("synthetic") or name.startswith("fake"):
        parts = name.split("-")
        size = int(parts[1]) if len(parts) > 1 else 32
        n = int(parts[2]) if len(parts) > 2 else 512
        imgs, labels = _synthetic(size, n)
        timgs, tlabels = _synthetic(size, max(n // 4, 8), seed=1)
        return (ArrayDataset(imgs, labels, flip=True, normalize=normalize),
                ArrayDataset(timgs, tlabels, normalize=normalize), size)

    if name == "cifar10":
        (xtr, ytr), (xte, yte) = _load_cifar10(data_dir)
        return (ArrayDataset(xtr, ytr, flip=True, normalize=normalize),
                ArrayDataset(xte, yte, normalize=normalize), 32)

    if name == "cifar100":
        (xtr, ytr), (xte, yte) = _load_cifar100(data_dir)
        return (ArrayDataset(xtr, ytr, flip=True, normalize=normalize),
                ArrayDataset(xte, yte, normalize=normalize), 32)

    if name == "imagenet":
        xtr, ytr = _hf_images("benjamin-paine/imagenet-1k-256x256", "train",
                              data_dir=data_dir)
        xte, yte = _hf_images("benjamin-paine/imagenet-1k-256x256", "test",
                              data_dir=data_dir)
        return (ArrayDataset(xtr, ytr, flip=True, normalize=normalize),
                ArrayDataset(xte, yte, normalize=normalize), 256)

    if name in ("celeba", "celeba-128"):
        input_size = 64 if name == "celeba" else 128
        crop = 148 if name == "celeba" else 178
        xtr, ytr = _load_celeba_folder(data_dir, "train", crop, input_size)
        xte, yte = _load_celeba_folder(data_dir, "test", crop, input_size)
        return (ArrayDataset(xtr, ytr, flip=True, normalize=normalize),
                ArrayDataset(xte, yte, normalize=normalize), input_size)

    if name == "celeba-hq":
        xtr, ytr = _hf_images("korexyz/celeba-hq-256x256", "train",
                              data_dir=data_dir)
        xte, yte = _hf_images("korexyz/celeba-hq-256x256", "validation",
                              data_dir=data_dir)
        return (ArrayDataset(xtr, ytr, flip=True, normalize=normalize),
                ArrayDataset(xte, yte, normalize=normalize), 256)

    if name == "oxford-flower-102":
        # train/val stored aspect-preserved (shorter side 300, center crop)
        # so the RandomResizedCrop below samples undistorted content — the
        # reference crops the original variable-size photos directly
        # (utils.py:372-382); a square out_size resize would squash them
        xtr, ytr = _hf_images("Donghyun99/Oxford-Flower-102", "train",
                              short_side=300, data_dir=data_dir)
        xva, yva = _hf_images("Donghyun99/Oxford-Flower-102", "validation",
                              short_side=300, data_dir=data_dir)
        xte, yte = _hf_images("Donghyun99/Oxford-Flower-102", "test",
                              out_size=256, center_crop=None,
                              data_dir=data_dir)
        xtr = np.concatenate([xtr, xva])
        ytr = np.concatenate([ytr, yva])
        return (ArrayDataset(xtr, ytr, flip=True, normalize=normalize,
                             random_resized_crop=(256, 0.7, 1.0)),
                ArrayDataset(xte, yte, normalize=normalize), 256)

    if name in ("animal-face", "afhq"):
        x, y = _hf_images("huggan/AFHQ", "train", out_size=256,
                          data_dir=data_dir)
        # reference reuses the train split for test (utils.py:420-422); the
        # memmap archive is read-only so sharing it between the two datasets
        # is safe (no .copy(): that would pull the whole archive into RAM)
        return (ArrayDataset(x, y, flip=True, normalize=normalize),
                ArrayDataset(x, np.array(y), normalize=normalize), 256)

    raise ValueError(f"Dataset {dataset_name} not supported")


# CelebA auto-download (reference utils/utils.py:9-43). torchvision pulls
# the archives off Google Drive via gdown; neither is available here, so we
# use the long-standing academic mirror instead. Files land in the same
# torchvision folder layout _load_celeba_folder expects.
_CELEBA_MIRROR = "https://graal.ift.ulaval.ca/public/celeba/"
_CELEBA_FILES = ("img_align_celeba.zip", "list_eval_partition.txt")


def _network_available(host: str = "graal.ift.ulaval.ca",
                       timeout: float = 3.0) -> bool:
    import socket

    try:
        socket.create_connection((host, 443), timeout=timeout).close()
        return True
    except OSError:
        return False


def _celeba_exists(data_dir: str) -> bool:
    return (os.path.isdir(os.path.join(data_dir, "celeba",
                                       "img_align_celeba"))
            and os.path.isfile(os.path.join(data_dir, "celeba",
                                            "list_eval_partition.txt")))


def _ensure_celeba(data_dir: str) -> None:
    """Download + extract CelebA if missing (reference
    utils/utils.py:26-43): best-effort, gated on a network probe, and on
    any failure raises the reference's manual-download instructions."""
    if _celeba_exists(data_dir):
        return
    celeba_dir = os.path.join(data_dir, "celeba")
    manual_msg = (
        f"Failed to download CelebA to {data_dir}. You can manually "
        "download from https://drive.google.com/drive/folders/"
        "0B7EVK8r0v71pWEZsZE9oNnFzTm8 and extract so that "
        "'celeba/img_align_celeba' and 'celeba/list_eval_partition.txt' "
        "exist under the data_dir.")
    if not _network_available():
        raise FileNotFoundError(
            f"CelebA not found under {celeba_dir} and no network is "
            f"available. {manual_msg} (Use 'synthetic-64' for smoke runs.)")
    import urllib.request
    import zipfile

    print(f"CelebA not found at {data_dir}. Downloading CelebA "
          "(this may take a while)...", flush=True)
    os.makedirs(celeba_dir, exist_ok=True)
    try:
        for fname in _CELEBA_FILES:
            dest = os.path.join(celeba_dir, fname)
            if not os.path.exists(dest):
                urllib.request.urlretrieve(_CELEBA_MIRROR + fname,
                                           dest + ".part")
                os.replace(dest + ".part", dest)
        zip_path = os.path.join(celeba_dir, "img_align_celeba.zip")
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(celeba_dir)
        if not _celeba_exists(data_dir):
            raise RuntimeError("CelebA download completed but data "
                               "directory is still missing or invalid.")
        print("CelebA download finished successfully.", flush=True)
    except Exception as e:
        raise RuntimeError(manual_msg) from e


def _load_celeba_folder(data_dir: str, split: str, crop: int, out: int):
    """CelebA from the standard torchvision folder layout (img_align_celeba +
    list_eval_partition.txt); center-crop + bicubic resize at load
    (utils.py:264-275). Auto-downloads when missing and the network allows
    (utils.py:26-43)."""
    from PIL import Image

    img_dir = os.path.join(data_dir, "celeba", "img_align_celeba")
    part_file = os.path.join(data_dir, "celeba", "list_eval_partition.txt")
    if not os.path.isdir(img_dir):
        _ensure_celeba(data_dir)
    split_id = {"train": 0, "valid": 1, "test": 2}[split]
    names = []
    with open(part_file) as f:
        for line in f:
            fname, sid = line.split()
            if int(sid) == split_id:
                names.append(fname)

    def item_fn(i):
        im = Image.open(os.path.join(img_dir, names[i])).convert("RGB")
        w, h = im.size
        left, top = (w - crop) // 2, (h - crop) // 2
        im = im.crop((left, top, left + crop, top + crop))
        return np.asarray(im.resize((out, out), Image.BICUBIC), np.uint8), 0

    cache = os.path.join(data_dir, "movae_cache",
                         f"celeba_{split}_{crop}_{out}_{len(names)}.npy")
    return _materialize_memmap(cache, len(names), item_fn)

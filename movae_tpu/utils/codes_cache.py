"""Pre-extracted VQ code cache for prior training.

Capability-parity port of the reference LMDB cache
(/root/reference/utils/vq_codes_lmdb.py:20-240): a one-time frozen-VQ sweep
over the dataset writes per-sample code arrays keyed by
``md5(arch_dataset_K_inputsize)[:12]``; later prior-training runs read codes
without touching the VQ encoder.

Storage is TPU-host-native instead of LMDB+pickle: codes are fixed-shape
int32 grids, so they live in flat memory-mapped ``.npy`` files (one per
level) + a ``meta.json`` — O(1) random access, zero deserialization, and
trivially shardable across hosts. (The lmdb package is not available in this
environment; for datasets that do have an existing LMDB cache this module
falls back to on-the-fly extraction, mirroring vq_codes_lmdb.py:182-240's
fall-through.)
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from movae_tpu.data import native


def cache_key(arch: str, dataset: str, num_embeddings: int,
              input_size: int) -> str:
    s = f"{arch}_{dataset}_{num_embeddings}_{input_size}"
    key = hashlib.md5(s.encode()).hexdigest()[:12]
    # multi-host: each process sweeps only its loader slice, so its cache
    # holds a shard — key it as such rather than masquerading as the full set
    if jax.process_count() > 1:
        key += f"_p{jax.process_index()}of{jax.process_count()}"
    return key


class CodeCache:
    """Memory-mapped code store; levels are named arrays of (N, h, w) int32."""

    def __init__(self, root: str):
        self.root = root
        self.meta_path = os.path.join(root, "meta.json")

    def exists(self) -> bool:
        return os.path.exists(self.meta_path)

    def write(self, levels: Dict[str, np.ndarray], meta: Optional[dict] = None):
        """Atomic publish: concurrent same-key writers (two runner.py
        subprocesses on the same arch/dataset) or a force_extract rewrite
        under an existing meta.json must never expose torn arrays — each
        file lands via pid-suffixed tmp + os.replace (the same pattern as
        data._materialize_memmap), and meta.json (the exists() marker)
        goes last."""
        os.makedirs(self.root, exist_ok=True)
        info = {"levels": {}, **(meta or {})}
        for name, arr in levels.items():
            arr = np.ascontiguousarray(arr, np.int32)
            path = os.path.join(self.root, f"{name}.npy")
            # keep the .npy suffix on the tmp name or np.save appends one
            tmp = os.path.join(self.root, f".{name}.{os.getpid()}.tmp.npy")
            np.save(tmp, arr)
            os.replace(tmp, path)
            info["levels"][name] = {"shape": list(arr.shape)}
        info["__len__"] = int(next(iter(levels.values())).shape[0])
        tmp = f"{self.meta_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(info, f, indent=2)
        os.replace(tmp, self.meta_path)

    def open(self) -> Dict[str, np.ndarray]:
        with open(self.meta_path) as f:
            info = json.load(f)
        return {name: np.load(os.path.join(self.root, f"{name}.npy"),
                              mmap_mode="r")
                for name in info["levels"]}

    def __len__(self) -> int:
        with open(self.meta_path) as f:
            return json.load(f)["__len__"]


def get_or_extract_codes(
    extract_fn,
    loader,
    save_root: str,
    arch: str,
    dataset: str,
    num_embeddings: int,
    input_size: int,
    is_hierarchical: bool = False,
    force_extract: bool = False,
    use_cache: bool = True,
) -> Tuple[Dict[str, np.ndarray], bool]:
    """Return ``{level_name: (N,h,w) int32}`` codes, extracting + caching on
    first use (reference get_or_extract_codes_lmdb, vq_codes_lmdb.py:182-240).

    ``extract_fn(images) -> codes`` (single level) or ``-> (top, bottom)``.
    """
    key = cache_key(arch, dataset, num_embeddings, input_size)
    cache = CodeCache(os.path.join(save_root, "codes_cache", key))
    hit = use_cache and cache.exists() and not force_extract
    if jax.process_count() > 1:
        # multi-host lockstep: caches are per-process, so a partial earlier
        # run can leave some hosts with a cache and some without — if only
        # the miss hosts ran the jitted global-mesh extraction sweep the
        # job would deadlock on its collectives. All hosts extract unless
        # EVERY host hits.
        from jax.experimental import multihost_utils
        hit = bool(np.all(multihost_utils.process_allgather(
            np.asarray(hit))))
    if hit:
        print(f"Loading cached VQ codes from {cache.root}")
        return cache.open(), True

    names = ("top", "bottom") if is_hierarchical else ("codes",)
    chunks = {n: [] for n in names}
    for imgs, _labels, n_valid in loader:
        out = extract_fn(imgs)
        if is_hierarchical:
            top, bottom = out
            chunks["top"].append(np.asarray(top)[:n_valid])
            chunks["bottom"].append(np.asarray(bottom)[:n_valid])
        else:
            chunks["codes"].append(np.asarray(out)[:n_valid])
    levels = {n: np.concatenate(c).astype(np.int32)
              for n, c in chunks.items()}
    if use_cache:
        cache.write(levels, {"arch": arch, "dataset": dataset,
                             "num_embeddings": num_embeddings,
                             "input_size": input_size})
        print(f"Wrote VQ code cache to {cache.root}")
    return levels, False


class CodeLoader:
    """Static-shape batch iterator over cached codes.

    ``epoch_len`` (multi-host): force every host to yield
    ``ceil(epoch_len / batch_size)`` batches regardless of its local shard
    size — per-host shards can differ by a few samples, and a host running
    extra steps into cross-host collectives would deadlock the others. The
    extra rows wrap over the local shard."""

    def __init__(self, levels: Dict[str, np.ndarray], batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 epoch_len: Optional[int] = None):
        self.levels = levels
        self.n = next(iter(levels.values())).shape[0]
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.epoch_len = max(epoch_len, self.n) if epoch_len else None

    def __len__(self):
        n_eff = self.epoch_len or self.n
        return (n_eff + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        rng = np.random.default_rng((self.seed, self.epoch))
        order = rng.permutation(self.n) if self.shuffle else np.arange(self.n)
        if self.epoch_len and self.epoch_len > self.n:
            order = np.resize(order, self.epoch_len)
        self.epoch += 1
        bs = self.batch_size
        for start in range(0, len(order), bs):
            idx = order[start:start + bs]
            # rows past the local shard size are epoch_len wrap duplicates:
            # report only genuinely-new rows as valid so loss meters don't
            # double-weight them
            n_valid = int(np.clip(self.n - start, 0, len(idx)))
            if len(idx) < bs:
                # np.resize wraps cyclically, so datasets smaller than the
                # pad still fill the static shape
                idx = np.concatenate([idx, np.resize(order, bs - len(idx))])
            # threaded native gather for int32 archives (reads straight
            # from the memory-mapped code store; numpy fallback inside)
            yield ({k: native.gather_codes(v, idx)
                    for k, v in self.levels.items()}, n_valid)

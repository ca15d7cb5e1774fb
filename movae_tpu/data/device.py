"""Device-resident training data (``--device_data``).

The hot training loop's steady-state cost is dominated by host->device
batch transfer, not compute (BENCH.md "End-to-end training loop": ~20 ms
of the 26 ms/step is H2D of the uint8 batch; the reference instead pays a
CUDA DataLoader pipeline per batch, main.py:125-235 + benchmark_workers.py).
On TPU the idiomatic fix is to park the ENTIRE uint8 train set in HBM once
— CIFAR-10 is 150 MB, even CelebA-HQ at 256px is 5.9 GB, well inside a v5e
chip — and assemble every batch on-device with a gather inside the jitted
step. Steady-state host->device traffic drops to the int32 index block
(~kB), and the host loader/augmentation CPU leaves the hot path entirely.

Design:

* The padded ``(N_pad, H, W, C)`` uint8 array is sharded row-block over the
  mesh's ``data`` axis (replicated over ``model``/``seq``/``pipe``). Each
  batch takes ``B/nd`` rows from every shard via a ``shard_map`` local
  gather — no cross-device communication, ever, at any scale.
* Shuffling is per-shard: each epoch every shard draws a fresh seeded
  permutation of ITS real rows (pad rows are never sampled). This is the
  standard sharded-data-parallel shuffle (the multi-host Loader already
  fixes each host's row set); it deviates from the single-host Loader's
  global permutation only in that rows never migrate between shards.
* The horizontal-flip augmentation runs in-jit on the gathered uint8 batch
  (bernoulli mask + reversed W slice); cast/normalize already happen
  in-jit (train.step.preprocess_batch). Datasets whose train transform
  needs RandomResizedCrop (flowers) are rejected — host loader only.
* Epoch leftovers (rows that don't fill a full global batch from every
  shard) run through the ordinary HOST batch path so every image is still
  trained once per epoch, matching the reference's ragged-tail semantics
  (main.py:125-235).

All index bookkeeping is deterministic from ``(seed, epoch, shard)``, so
every process in a multi-host run can compute every other process's plan —
step counts and the tail walk stay in lockstep without communication.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

Array = np.ndarray


def device_gather(mesh, images: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather batch rows from the shard-resident image store.

    ``images``: (N_pad, H, W, C) sharded P('data') on rows.
    ``idx``: shard-LOCAL row indices, (B,) sharded P('data') or a stacked
    (k, B) sharded P(None, 'data'); position ``b`` of a batch belongs to
    shard ``b // (B/nd)`` and its value indexes that shard's local rows.
    Returns idx.shape + images.shape[1:], batch-sharded like ``idx``.
    """
    ispec = P("data") if idx.ndim == 1 else P(None, "data")

    def local(img, ix):
        return jnp.take(img, ix, axis=0)

    return jax.shard_map(local, mesh=mesh, in_specs=(P("data"), ispec),
                         out_specs=ispec)(images, idx)


def random_flip(batch: jax.Array, key: jax.Array) -> jax.Array:
    """In-jit random horizontal flip, p=0.5 per image (the train-transform
    of every non-crop dataset, reference utils.py get_dataset)."""
    mask = jax.random.bernoulli(key, 0.5, batch.shape[:-3])
    return jnp.where(mask[..., None, None, None],
                     batch[..., :, ::-1, :], batch)


def make_device_fed(raw_fn, mesh, flip: bool):
    """Wrap a train-step function ``raw_fn(state, batch, rng)`` (plain,
    scanned, or grad-accumulating — the batch's leading index shape just
    follows along) into ``fed(state, images, idx, rng)`` that assembles the
    batch on-device: gather + in-jit flip, then the unchanged step. Callers
    jit it with ``donate_argnums=(0,)`` (the image store is NOT donated —
    it is reused every dispatch)."""

    def fed(state, images, idx, rng):
        rng, fk = jax.random.split(rng)
        batch = device_gather(mesh, images, idx)
        if flip:
            batch = random_flip(batch, fk)
        return raw_fn(state, batch, rng)

    return fed


# auto-enable budget: the resident store may take at most this fraction of
# a device's HBM (leaves the rest for params/activations/workspace; the
# largest supported set, CelebA-HQ-256 at 5.9 GB, still fits a 16 GB v5e)
AUTO_HBM_FRACTION = 0.4
_DEFAULT_HBM_BYTES = 16 * 1024**3  # v5e; used when memory_stats is absent


def _device_hbm_budget() -> int:
    """Conservative per-device byte budget for the resident image store."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
        in_use = int(stats.get("bytes_in_use", 0))
    except Exception:  # pragma: no cover - backend-dependent
        limit, in_use = 0, 0
    if limit <= 0:
        limit, in_use = _DEFAULT_HBM_BYTES, 0
    return int(AUTO_HBM_FRACTION * limit) - in_use


def resolve_device_data(args, dataset, parallel, batch_size_global: int):
    """``--device_data`` tristate -> a :class:`DeviceData` or ``None``.

    Explicitly requested (``--device_data``): construct it, letting
    unsupported layouts raise. Explicitly refused (``--no_device_data``):
    host loader. Otherwise AUTO: enable when the measured-faster path
    applies — TPU backend (the 4.30x win is H2D-traffic-bound; on the CPU
    backend "HBM" is just host RAM and the gather adds work), a dataset the
    resident store supports (uint8 array, no RandomResizedCrop), and the
    per-device slice inside a conservative HBM budget
    (``AUTO_HBM_FRACTION`` of the device's limit, minus bytes already in
    use). Any layout error in AUTO mode falls back to the host loader with
    a note instead of failing the run.
    """
    if getattr(args, "no_device_data", False):
        return None
    forced = bool(getattr(args, "device_data", False))
    if not forced:
        if jax.default_backend() != "tpu":
            return None
        if getattr(dataset, "random_resized_crop", None) is not None:
            return None
        imgs = getattr(dataset, "images", None)
        if imgs is None or getattr(imgs, "dtype", None) != np.uint8:
            return None
        nd = int(parallel.mesh.shape["data"])
        # ~equal shards + wrap-padding: per-device bytes ~= total/nd
        per_device = int(np.prod(imgs.shape[1:])) * len(dataset) // max(nd, 1)
        budget = _device_hbm_budget()
        if per_device > budget:
            print(f"[device_data] auto: train set needs {per_device/1e9:.2f}"
                  f" GB/device > {budget/1e9:.2f} GB budget — host loader")
            return None
    try:
        dd = DeviceData(dataset, parallel, batch_size_global,
                        seed=getattr(args, "seed", 0) or 0)
    except ValueError:
        if forced:
            raise
        return None
    if not forced and jax.process_index() == 0:
        print("[device_data] auto-enabled: train set fits the HBM budget "
              "(measured 4.30x over the host loader, BENCH.md; opt out "
              "with --no_device_data)")
    return dd


class DeviceData:
    """The resident image store + deterministic per-epoch index plans."""

    def __init__(self, dataset, parallel, batch_size_global: int,
                 seed: int = 0):
        if getattr(dataset, "random_resized_crop", None) is not None:
            raise ValueError(
                "--device_data does not support datasets with a "
                "RandomResizedCrop train transform (flowers); use the host "
                "loader for those")
        self.dataset = dataset
        self.mesh = parallel.mesh
        self.seed = seed
        self.flip = bool(getattr(dataset, "flip", False))
        self.nd = int(self.mesh.shape["data"])
        self.pc = jax.process_count()
        self.pi = jax.process_index()
        if self.nd % self.pc:
            raise ValueError(
                f"data axis ({self.nd}) must be divisible by process count "
                f"({self.pc}) for --device_data")
        self.nd_local = self.nd // self.pc
        self.B = int(batch_size_global)
        if self.B % self.nd:
            raise ValueError(
                f"global batch {self.B} must be divisible by the data-axis "
                f"size {self.nd} for --device_data")
        self.b_loc = self.B // self.nd
        n = len(dataset)
        self.n = n
        # process p owns the interleaved global ids p, p+pc, ... (the same
        # assignment as Loader's multi-host interleave); within a process
        # its rows are ALSO interleaved over its nd_local shards (local
        # shard j owns local positions j, j+nd_local, ...) so real row
        # counts differ by at most 1 across every shard in the job — a
        # row-block split would leave the last shard short and collapse
        # ``steps`` to its count. Shard sizes must be globally equal for
        # the uniform P('data') layout, so short shards wrap-pad (pads are
        # never sampled).
        counts_p = [(n - p + self.pc - 1) // self.pc for p in range(self.pc)]
        self.n_shard = max(1, -(-counts_p[0] // self.nd_local))
        # per-global-shard real row counts, computable on every process
        self.shard_counts = np.array([
            max(0, (counts_p[s // self.nd_local] - (s % self.nd_local)
                    + self.nd_local - 1) // self.nd_local)
            for s in range(self.nd)], np.int64)
        if (self.shard_counts // self.b_loc).min() == 0 and n >= 2 * self.B:
            # degenerate layout (a shard owns < one batch slice of real
            # rows) would push everything to the host tail
            raise ValueError(
                f"--device_data layout degenerate: a data shard holds "
                f"{int(self.shard_counts.min())} rows < B/nd={self.b_loc}")
        self.steps = int((self.shard_counts // self.b_loc).min())
        self.images_dev = self._upload()
        self.epoch = 0

    # -- layout ------------------------------------------------------------
    def _shard_global_ids(self, s: int) -> Array:
        """Global dataset ids of shard ``s``'s real rows, in local order."""
        p, j = divmod(s, self.nd_local)
        local_pos = j + np.arange(self.shard_counts[s]) * self.nd_local
        return p + local_pos * self.pc

    def _upload(self) -> jax.Array:
        imgs = self.dataset.images
        blocks = []
        for j in range(self.nd_local):
            s = self.pi * self.nd_local + j
            ids = self._shard_global_ids(s)
            if len(ids) < self.n_shard:  # wrap-pad; pads are never sampled
                pad = np.resize(ids if len(ids) else np.arange(self.n),
                                self.n_shard - len(ids))
                ids = np.concatenate([ids, pad])
            blocks.append(ids)
        local_rows = imgs[np.concatenate(blocks)]
        sharding = NamedSharding(self.mesh, P("data"))
        nbytes = local_rows.nbytes * self.pc
        print(f"[device_data] uploading {nbytes / 1e9:.2f} GB "
              f"({self.n} images) to HBM, {self.nd} shard(s) of "
              f"{self.n_shard} rows")
        if self.pc > 1:
            return jax.make_array_from_process_local_data(
                sharding, local_rows)
        return jax.device_put(local_rows, sharding)

    # -- per-epoch plans ---------------------------------------------------
    def _perm(self, epoch: int, s: int) -> Array:
        return np.random.default_rng(
            (self.seed, epoch, s)).permutation(self.shard_counts[s])

    def epoch_plan(self, epoch: int) -> Tuple[Array, Array]:
        """(idx_local, tail_global_ids) for ``epoch``.

        ``idx_local``: (steps, nd_local * b_loc) int32 — THIS process's
        columns of the global (steps, B) index block, shard-local values.
        ``tail_global_ids``: the GLOBAL leftover ids of every shard
        (identical on all processes), walked by :meth:`tail_batches`.
        """
        cols, tails = [], []
        take = self.steps * self.b_loc
        for s in range(self.nd):
            perm = self._perm(epoch, s)
            if s // self.nd_local == self.pi:
                cols.append(perm[:take].reshape(self.steps, self.b_loc))
            tails.append(self._shard_global_ids(s)[perm[take:]])
        idx_local = (np.concatenate(cols, axis=1).astype(np.int32)
                     if cols else
                     np.zeros((self.steps, 0), np.int32))
        return idx_local, np.concatenate(tails)

    def put_idx(self, idx_local: Array, stacked: bool) -> jax.Array:
        """Upload a (steps?, local_B) int32 block with batch-position
        sharding matching :func:`device_gather`'s expectations."""
        spec = P(None, "data") if stacked else P("data")
        sharding = NamedSharding(self.mesh, spec)
        if self.pc > 1:
            return jax.make_array_from_process_local_data(
                sharding, np.ascontiguousarray(idx_local))
        return jax.device_put(np.ascontiguousarray(idx_local), sharding)

    def tail_batches(self, tail_global_ids: Array, rng: np.random.Generator
                     ) -> Iterator[Tuple[Array, int]]:
        """Walk the epoch leftovers as ordinary HOST batches (the ragged
        tail keeps the reference's every-image-once epoch semantics). Each
        process takes the Loader-style interleaved slice of every global
        tail batch, wrap-padded then trimmed to the smallest data-axis
        multiple covering the valid rows (same trim as loop._trim_tail)."""
        L = len(tail_global_ids)
        bs = self.B // self.pc
        for start in range(0, L, self.B):
            ids = tail_global_ids[start:start + self.B][self.pi::self.pc]
            n_valid = len(ids)
            if n_valid < bs:
                pad = np.resize(tail_global_ids, bs - n_valid)
                ids = np.concatenate([ids, pad]) if n_valid else pad
            gv = min(self.B, L - start)
            keep_g = ((gv + self.nd - 1) // self.nd) * self.nd
            if keep_g % self.pc == 0 and 0 < keep_g // self.pc <= len(ids):
                ids = ids[: keep_g // self.pc]
            imgs, _ = self.dataset.get_batch(ids, rng, raw=True)
            yield imgs, n_valid

    # -- bookkeeping -------------------------------------------------------
    @property
    def tail_len(self) -> int:
        return int(self.n - self.steps * self.B)

    @property
    def tail_steps(self) -> int:
        return -(-self.tail_len // self.B) if self.tail_len else 0

    def optimizer_steps_per_epoch(self, accum_k: int = 1) -> int:
        """Optimizer updates per epoch (lr/comfort cadence): full device
        batches (grouped by A under --grad_accum, leftovers as singles)
        plus the host tail singles — mirrors train/loop.py's accum math."""
        if accum_k > 1:
            dev = self.steps // accum_k + self.steps % accum_k
        else:
            dev = self.steps
        return max(1, dev + self.tail_steps)

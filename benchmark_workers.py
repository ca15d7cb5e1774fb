#!/usr/bin/env python3
"""Input-pipeline throughput benchmark.

Rebuild of the reference dataloader-worker sweep
(/root/reference/benchmark_workers.py:14-336). The torch DataLoader's
num_workers knob maps onto the worker-thread count of the native batch
assembly library (--workers sweeps it at a fixed batch size); with no
--workers the sweep axis is batch size. The harness reports mean +/- std
seconds per batch and the resulting images/sec, with a warmup pass, matching
the reference's methodology (warmup, N timed runs, speedup table).

Usage:
  python benchmark_workers.py --dataset synthetic-32 --batch_sizes 64 128 256
  python benchmark_workers.py --dataset synthetic-32 --batch_size 256 \
      --workers 1 2 4 0   # 0 = hardware concurrency
"""

import argparse

# persistent XLA compile cache: repeat runs skip the first-compile cost
# (set via jax.config — env vars are too late when a sitecustomize has
# already imported jax). Opt out with JAX_COMPILATION_CACHE_DIR="".
from movae_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
import time

import numpy as np

from movae_tpu.data import Loader, get_dataset


def benchmark(dataset_name: str, data_dir: str, batch_sizes, num_batches: int,
              num_runs: int, normalize: bool, shuffle: bool = True,
              warmup: int = 2, workers=None):
    """Sweep either batch size (workers=None) or the native assembly
    worker-thread count at a fixed batch size — the direct analog of the
    reference's DataLoader num_workers sweep (benchmark_workers.py:14-165)."""
    from movae_tpu.data import native

    train_ds, _, input_size = get_dataset(dataset_name, data_dir,
                                          normalize=normalize)
    print(f"dataset={dataset_name} n={len(train_ds)} input_size={input_size}")
    if workers:
        if not native.available():
            print("native batch assembly unavailable; worker sweep reflects "
                  "the single-threaded numpy fallback")
        cells = [(batch_sizes[0], w) for w in workers]
    else:
        cells = [(bs, None) for bs in batch_sizes]
    results = []
    for bs, nw in cells:
        if nw is not None:
            native.set_num_threads(nw)
        loader = Loader(train_ds, bs, shuffle=shuffle, seed=0)
        if warmup > 0:
            # consume exactly `warmup` batches (the iterator yields before
            # the count check, so guard the loop for warmup == 0)
            for i, _ in enumerate(loader):
                if i + 1 >= warmup:
                    break
        times = []
        for _run in range(num_runs):
            t0 = time.perf_counter()
            n = 0
            for i, (imgs, labels, n_valid) in enumerate(loader):
                n += 1
                if n >= num_batches:
                    break
            dt = (time.perf_counter() - t0) / max(n, 1)
            times.append(dt)
        mean, std = float(np.mean(times)), float(np.std(times))
        results.append((bs if nw is None else nw, mean, std, bs / mean))
    if workers:
        native.set_num_threads(0)  # restore the hardware default
    return results


def print_results(results, axis="batch"):
    base = results[0][3]
    print(f"\n{axis:>8} {'s/batch':>12} {'std':>10} {'img/s':>12} "
          f"{'speedup':>8}")
    for cell, mean, std, ips in results:
        print(f"{cell:>8} {mean:>12.6f} {std:>10.6f} {ips:>12.1f} "
              f"{ips / base:>8.2f}x")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="synthetic-32")
    p.add_argument("--data_dir", type=str, default="./data")
    # reference spellings (benchmark_workers.py:170-200): --batch_size,
    # --runs, --warmup, --workers map onto this harness; --device/pin-memory
    # are no-ops (in-process loader feeding the TPU directly)
    p.add_argument("--batch_size", type=int, default=None,
                   help="bench a single batch size (reference spelling)")
    p.add_argument("--runs", type=int, default=None, dest="runs")
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--workers", type=int, nargs="*", default=None,
                   help="sweep native assembly worker-thread counts at a "
                        "fixed batch size (the reference's num_workers "
                        "sweep; 0 = hardware concurrency)")
    p.add_argument("--device", type=str, default=None, help="(ignored)")
    p.add_argument("--no_pin_memory", action="store_true", help="(ignored)")
    p.add_argument("--no_shuffle", action="store_true")
    p.add_argument("--batch_sizes", type=int, nargs="+",
                   default=[32, 64, 128, 256])
    p.add_argument("--num_batches", type=int, default=20)
    p.add_argument("--num_runs", type=int, default=3)
    p.add_argument("--normalize_inputs", action="store_true")
    a = p.parse_args()
    sizes = [a.batch_size] if a.batch_size else a.batch_sizes
    runs = a.runs if a.runs else a.num_runs
    print_results(benchmark(a.dataset, a.data_dir, sizes,
                            a.num_batches, runs, a.normalize_inputs,
                            shuffle=not a.no_shuffle, warmup=a.warmup,
                            workers=a.workers),
                  axis="workers" if a.workers else "batch")


if __name__ == "__main__":
    main()

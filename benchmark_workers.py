#!/usr/bin/env python3
"""Input-pipeline throughput benchmark.

Rebuild of the reference dataloader-worker sweep
(/root/reference/benchmark_workers.py:14-336). The torch DataLoader's
num_workers knob has no direct analog in the in-memory host pipeline, so the
sweep axis here is batch size; the harness reports mean +/- std seconds per
batch and the resulting images/sec, with a warmup pass, matching the
reference's methodology (warmup, N timed runs, speedup table).

Usage: python benchmark_workers.py --dataset synthetic-32 --batch_sizes 64 128 256
"""

import argparse
import time

import numpy as np

from movae_tpu.data import Loader, get_dataset


def benchmark(dataset_name: str, data_dir: str, batch_sizes, num_batches: int,
              num_runs: int, normalize: bool):
    train_ds, _, input_size = get_dataset(dataset_name, data_dir,
                                          normalize=normalize)
    print(f"dataset={dataset_name} n={len(train_ds)} input_size={input_size}")
    results = []
    for bs in batch_sizes:
        loader = Loader(train_ds, bs, shuffle=True, seed=0)
        # warmup
        for i, _ in enumerate(loader):
            if i >= 2:
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
        results.append((bs, mean, std, bs / mean))
    return results


def print_results(results):
    base = results[0][3]
    print(f"\n{'batch':>8} {'s/batch':>12} {'std':>10} {'img/s':>12} "
          f"{'speedup':>8}")
    for bs, mean, std, ips in results:
        print(f"{bs:>8} {mean:>12.6f} {std:>10.6f} {ips:>12.1f} "
              f"{ips / base:>8.2f}x")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="synthetic-32")
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--batch_sizes", type=int, nargs="+",
                   default=[32, 64, 128, 256])
    p.add_argument("--num_batches", type=int, default=20)
    p.add_argument("--num_runs", type=int, default=3)
    p.add_argument("--normalize_inputs", action="store_true")
    a = p.parse_args()
    print_results(benchmark(a.dataset, a.data_dir, a.batch_sizes,
                            a.num_batches, a.num_runs, a.normalize_inputs))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Interleaved A/B: raster incremental-cache PixelCNN sampler vs the
skew-diagonal wavefront sampler (identical codes — tested; this measures
speed only). The sampler is per-step-latency bound, so collapsing H*W
raster steps to s*(H-1)+W fronts should win roughly by the step-count
ratio (3.4x at 16x16, 13x at 64x64).

    python scripts/wavefront_ab.py --batch_size 256 --grid 16 --rounds 5
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movae_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--grid", type=int, default=16)
    p.add_argument("--rounds", type=int, default=5)
    args = p.parse_args()

    from movae_tpu.models.pixelcnn import (PixelCNN, sample_fast,
                                           sample_wavefront)

    b, h, w = args.batch_size, args.grid, args.grid
    model = PixelCNN(num_embeddings=512, embedding_dim=64,
                     hidden_channels=128, num_layers=15)
    x0 = jnp.zeros((2, h, w), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]

    arms = {
        "raster": jax.jit(lambda r: sample_fast(model, params, r, b, h, w)),
        "wavefront": jax.jit(lambda r: sample_wavefront(
            model, params, r, b, h, w)),
    }

    rng = jax.random.PRNGKey(1)
    times = {k: [] for k in arms}
    for name, fn in arms.items():  # compile + warm
        int(fn(rng)[0, 0, 0])
    for rnd in range(args.rounds):
        for name, fn in arms.items():
            rng, sub = jax.random.split(rng)
            t0 = time.perf_counter()
            out = fn(sub)
            int(out[0, 0, 0])  # host-fetch sync
            times[name].append(time.perf_counter() - t0)
            print(f"round {rnd} {name}: {times[name][-1]*1e3:.1f} ms")

    px = b * h * w
    med = {k: float(np.median(v)) for k, v in times.items()}
    for k, m in med.items():
        print(f"{k}: median {m*1e3:.1f} ms/batch = {px/m:,.0f} px/s")
    print(f"speedup wavefront vs raster: {med['raster']/med['wavefront']:.3f}x")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Interleaved sweep of SNAIL_KV_SEGMENTS for the PixelSNAIL sampler.

The sampler splits its raster loop into S segments, each compiled with a
static KV-prefix of the shortest covering length; mean KV-read traffic is
~(1 + 1/S)/2 of full-L. S=4 measured 1.26x over S=1 (BENCH.md); this sweeps
S in one process to find the knee (S=8 cuts reads another ~10% but doubles
the number of compiled loop bodies).

    python scripts/snail_segments_ab.py --batch_size 256 --grid 16 \
        --segments 1 4 8 16
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movae_tpu.utils import (enable_persistent_compilation_cache,
                             require_live_backend)

enable_persistent_compilation_cache()
require_live_backend()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--grid", type=int, default=16)
    p.add_argument("--segments", type=int, nargs="+", default=[1, 4, 8, 16])
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    from movae_tpu.models import pixelcnn as pc

    model = pc.PixelSNAIL(num_embeddings=512, embedding_dim=64,
                          hidden_channels=128, num_blocks=8,
                          num_res_blocks_per_layer=2, num_heads=8,
                          dropout=0.0)
    h = w = args.grid
    z = jnp.zeros((2, h, w), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), z)["params"]

    fns = {}
    saved = pc.SNAIL_KV_SEGMENTS
    try:
        for s in args.segments:
            eff = max(1, min(s, (h * w) // 32))  # 32-px segment floor
            if eff != s:
                print(f"note: S={s} capped to {eff} by the 32-px "
                      f"segment floor at L={h*w}")
            pc.SNAIL_KV_SEGMENTS = s
            fn = jax.jit(lambda r, _s=s: pc.sample_fast_snail(
                model, params, r, args.batch_size, h, w))
            np.asarray(fn(jax.random.PRNGKey(1)))  # compile under this S
            fns[s] = fn
    finally:
        pc.SNAIL_KV_SEGMENTS = saved

    times = {s: [] for s in args.segments}
    rng = jax.random.PRNGKey(2)
    for rep in range(args.reps):
        for s in args.segments:
            rng, sub = jax.random.split(rng)
            t0 = time.perf_counter()
            np.asarray(fns[s](sub))
            times[s].append(time.perf_counter() - t0)
    px = args.batch_size * h * w
    for s in args.segments:
        dt = sorted(times[s])[len(times[s]) // 2]
        print(f"S={s:3d}: {dt*1e3:8.1f} ms/batch  ({px/dt:,.0f} px/s)")


if __name__ == "__main__":
    main()

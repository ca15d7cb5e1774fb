#!/usr/bin/env python3
"""Interleaved A/B: PixelSNAIL KV-cache dtype (f32 vs bf16 vs int8 +
per-row scales) in the incremental-cache sampler.

The per-pixel PixelSNAIL step is HBM-bound on reading the full static-L
KV caches (masked attention still reads all L keys): at bs 256, L=256,
8 blocks the f32 caches cost ~536 MB of reads per pixel. bf16 halves it.

Tunnel throughput is noisy (CLAUDE.md), so both arms run interleaved in ONE
process with per-rep host-fetch sync; medians compared.

    python scripts/snail_sampler_ab.py --batch_size 256 --grid 16 --rounds 5
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
    p.add_argument("--arms", type=str, nargs="+",
                   default=["f32-seg1", "bf16-seg1", "bf16-seg4",
                            "int8-seg4"],
                   help="each arm is <dtype>-seg<N>, dtype in f32/bf16/int8")
    args = p.parse_args()

    from movae_tpu.models.pixelcnn import PixelSNAIL, sample_fast_snail

    b, h, w = args.batch_size, args.grid, args.grid
    model = PixelSNAIL(num_embeddings=512, embedding_dim=64,
                       hidden_channels=128, num_blocks=8,
                       num_res_blocks_per_layer=2, num_heads=8, dropout=0.0)
    x0 = jnp.zeros((2, h, w), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]

    import movae_tpu.models.pixelcnn as pix

    # arm name <dtype>-seg<N>: (cache_dtype, SNAIL_KV_SEGMENTS);
    # seg1 = full-L prefix (pre-segmentation behavior).
    dtypes = {"f32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}
    arm_cfg = {}
    for name in args.arms:
        dt_name, seg = name.split("-seg")
        arm_cfg[name] = (dtypes[dt_name], int(seg))
    arms = {}
    rng = jax.random.PRNGKey(1)
    saved_segments = pix.SNAIL_KV_SEGMENTS
    try:
        for name, (dt, nseg) in arm_cfg.items():
            eff = max(1, min(nseg, (h * w) // 32))  # 32-px segment floor
            if eff != nseg:
                print(f"note: {name} capped to seg{eff} by the 32-px "
                      f"segment floor at L={h*w}")
            pix.SNAIL_KV_SEGMENTS = nseg  # read at trace time
            fn = jax.jit(lambda r, dt=dt: sample_fast_snail(
                model, params, r, b, h, w, cache_dtype=dt))
            int(fn(rng)[0, 0, 0])  # compile + warm with the global set
            arms[name] = fn
    finally:
        pix.SNAIL_KV_SEGMENTS = saved_segments

    times = {k: [] for k in arms}
    for rnd in range(args.rounds):
        for name, fn in arms.items():
            rng, sub = jax.random.split(rng)
            t0 = time.perf_counter()
            out = fn(sub)
            int(out[0, 0, 0])  # host-fetch sync (block_until_ready lies here)
            times[name].append(time.perf_counter() - t0)
            print(f"round {rnd} {name}: {times[name][-1]*1e3:.1f} ms")

    px = b * h * w
    med = {k: float(np.median(v)) for k, v in times.items()}
    names = list(med)
    for k, m in med.items():
        print(f"{k}: median {m*1e3:.1f} ms/batch = {px/m:,.0f} px/s")
    for prev, cur in zip(names, names[1:]):
        print(f"speedup {cur} vs {prev}: {med[prev]/med[cur]:.3f}x")
    if len(names) > 1:
        print(f"total {names[-1]} vs {names[0]}: "
              f"{med[names[0]]/med[names[-1]]:.3f}x")


if __name__ == "__main__":
    main()

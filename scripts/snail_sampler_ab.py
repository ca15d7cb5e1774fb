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
    args = p.parse_args()

    from movae_tpu.models.pixelcnn import PixelSNAIL, sample_fast_snail

    b, h, w = args.batch_size, args.grid, args.grid
    model = PixelSNAIL(num_embeddings=512, embedding_dim=64,
                       hidden_channels=128, num_blocks=8,
                       num_res_blocks_per_layer=2, num_heads=8, dropout=0.0)
    x0 = jnp.zeros((2, h, w), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]

    import movae_tpu.models.pixelcnn as pix

    # (cache_dtype, SNAIL_KV_SEGMENTS) per arm; seg1 = full-L prefix
    # (pre-segmentation behavior), seg4 = the production default.
    arm_cfg = {
        "f32-seg1": (jnp.float32, 1),
        "bf16-seg1": (jnp.bfloat16, 1),
        "bf16-seg4": (jnp.bfloat16, 4),
        "int8-seg4": (jnp.int8, 4),
    }
    arms = {}
    rng = jax.random.PRNGKey(1)
    for name, (dt, nseg) in arm_cfg.items():
        pix.SNAIL_KV_SEGMENTS = nseg  # read at trace time
        fn = jax.jit(lambda r, dt=dt: sample_fast_snail(
            model, params, r, b, h, w, cache_dtype=dt))
        int(fn(rng)[0, 0, 0])  # compile + warm with the global set
        arms[name] = fn
    pix.SNAIL_KV_SEGMENTS = 4

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
    for k, m in med.items():
        print(f"{k}: median {m*1e3:.1f} ms/batch = {px/m:,.0f} px/s")
    print(f"speedup bf16-seg1 vs f32-seg1: "
          f"{med['f32-seg1']/med['bf16-seg1']:.3f}x")
    print(f"speedup bf16-seg4 vs bf16-seg1: "
          f"{med['bf16-seg1']/med['bf16-seg4']:.3f}x")
    print(f"speedup int8-seg4 vs bf16-seg4: "
          f"{med['bf16-seg4']/med['int8-seg4']:.3f}x")
    print(f"total vs f32-seg1: {med['f32-seg1']/med['int8-seg4']:.3f}x")


if __name__ == "__main__":
    main()

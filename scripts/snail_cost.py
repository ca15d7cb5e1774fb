#!/usr/bin/env python3
"""Roofline + HLO diagnosis for the PixelSNAIL incremental sampler.

The sampler's irreducible HBM traffic is the KV-prefix reads (the causal
attention must read keys 0..t each pixel). This script TPU-compiles
``sample_fast_snail`` at a given shape, dumps XLA cost_analysis, derives
the theoretical KV-read roofline for the configured segment count, and
scans the optimized HLO for standalone (non-fused) dynamic-slice ops on
the cache arrays — the failure mode where XLA materializes a copy of the
KV prefix before each attention einsum, tripling the traffic.

    python scripts/snail_cost.py --batch_size 256 --grid 16 [--measure]
"""

import argparse
import os
import re
import sys

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
    p.add_argument("--blocks", type=int, default=8)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--cache_dtype", type=str, default="int8",
                   choices=["f32", "bf16", "int8"])
    p.add_argument("--segments", type=int, default=None,
                   help="override SNAIL_KV_SEGMENTS (default: module value)")
    p.add_argument("--measure", action="store_true")
    args = p.parse_args()

    import movae_tpu.models.pixelcnn as pix
    from movae_tpu.models.pixelcnn import (KV_CACHE_DTYPES, PixelSNAIL,
                                           sample_fast_snail)

    if args.segments is not None:
        pix.SNAIL_KV_SEGMENTS = args.segments

    model = PixelSNAIL(num_embeddings=512, embedding_dim=64,
                       hidden_channels=args.hidden, num_blocks=args.blocks,
                       num_res_blocks_per_layer=2, num_heads=8, dropout=0.0)
    h = w = args.grid
    L = h * w
    b = args.batch_size
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((2, h, w), jnp.int32))["params"]
    dt = KV_CACHE_DTYPES[args.cache_dtype]

    fn = jax.jit(lambda r: sample_fast_snail(model, params, r, b, h, w,
                                             cache_dtype=dt))
    compiled = fn.lower(rng).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)
    print(f"flops          : {flops/1e9:10.2f} G")
    print(f"bytes accessed : {bytes_acc/1e9:10.3f} GB  (cost_analysis; "
          f"while-loops may be counted once, treat as relative)")

    # theoretical KV traffic: per pixel per block, K+V prefix reads of
    # kv_len rows (bs, nh, kv_len, hd) at the cache dtype + scales (int8)
    nh, hd = model.num_heads, args.hidden // model.num_heads
    itemsize = np.dtype(dt).itemsize
    n_seg = max(1, min(pix.SNAIL_KV_SEGMENTS, L // 32))
    chunk = -(-L // n_seg)
    kv_bytes = 0.0
    for lo in range(0, L, chunk):
        hi = min(lo + chunk, L)
        kv_bytes += (hi - lo) * 2 * b * nh * hi * hd * itemsize
        if args.cache_dtype == "int8":   # f32 scale rows
            kv_bytes += (hi - lo) * 2 * b * nh * hi * 4
    kv_bytes *= args.blocks
    t_kv = kv_bytes / 819e9
    print(f"theoretical KV reads/batch: {kv_bytes/1e9:.3f} GB "
          f"-> roofline {t_kv*1e3:.1f} ms/batch "
          f"({b*L/t_kv:,.0f} px/s) at 819 GB/s")

    # HLO scan: standalone dynamic-slice ops over cache-sized operands that
    # are NOT fused into a dot — each one is a materialized prefix copy
    txt = compiled.as_text()
    big = re.compile(r"dynamic-slice\(")
    n_ds = n_fused_ds = 0
    for line in txt.splitlines():
        ls = line.strip()
        if " = " not in ls:
            continue
        if big.search(ls):
            if ls.lstrip("%").split(" ")[0].startswith(
                    ("fused", "loop_dynamic")):
                n_fused_ds += 1
            else:
                n_ds += 1
    # census of top-level (non-fused) op kinds inside the while bodies
    import collections
    census = collections.Counter()
    for line in txt.splitlines():
        m = re.match(r"\s*(%?\S+)\s*=\s*\S+\s+(\w[\w-]*)\(", line)
        if m:
            census[m.group(2)] += 1
    print(f"dynamic-slice ops: {n_ds} standalone-named, "
          f"{n_fused_ds} in fusions (names are heuristic)")
    print("hlo op census:", dict(census.most_common(12)))
    n_fusion_lines = sum(1 for l in txt.splitlines() if " fusion(" in l)
    print(f"fusion count (whole program): {n_fusion_lines}")

    if args.measure:
        import time
        for _ in range(2):
            int(fn(rng)[0, 0, 0])
        times = []
        for i in range(5):
            r = jax.random.PRNGKey(i)
            t0 = time.perf_counter()
            int(fn(r)[0, 0, 0])
            times.append(time.perf_counter() - t0)
        dtm = sorted(times)[len(times) // 2]
        print(f"measured: {dtm*1e3:.1f} ms/batch = {b*L/dtm:,.0f} px/s "
              f"[kv-roofline eff {t_kv/dtm*100:.1f}%]")


if __name__ == "__main__":
    main()

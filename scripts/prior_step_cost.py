#!/usr/bin/env python3
"""Roofline accounting for PRIOR TRAINING steps (VERDICT r3 item 6).

The VQ train step has cost_analysis rooflines (scripts/step_cost.py) and
the PixelSNAIL *sampler* has a full post-mortem (scripts/snail_cost.py),
but prior training — the one SURVEY §2.6 hot path previously quoted only
as px/s — had no %-of-peak number. This dumps XLA cost_analysis for the
production PixelCNN / PixelSNAIL train steps (the same loss_function +
clip(1.0)+adam chain train/prior.py builds, reference loop
main.py:890-1051) and derives the flops/HBM roofline bounds; --measure
times the step with per-rep host-fetch sync medians (CLAUDE.md tunnel
rules).

    python scripts/prior_step_cost.py --prior pixelsnail --measure
    python scripts/prior_step_cost.py --prior pixelcnn --measure
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

# v5e peaks (same constants as step_cost.py)
PEAK_BF16 = 197e12
PEAK_HBM = 819e9


def build(prior_kind, batch_size, grid, blocks, layers, dtype):
    import optax

    from movae_tpu.models.pixelcnn import PixelCNN, PixelSNAIL

    if prior_kind == "pixelsnail":
        model = PixelSNAIL(num_embeddings=512, embedding_dim=64,
                           hidden_channels=128, num_blocks=blocks,
                           num_res_blocks_per_layer=2, num_heads=8,
                           dropout=0.1, dtype=dtype)
    else:
        model = PixelCNN(num_embeddings=512, embedding_dim=64,
                         hidden_channels=128, num_layers=layers,
                         dtype=dtype)
    z = jnp.asarray(np.random.default_rng(1).integers(
        0, 512, (batch_size, grid, grid)).astype(np.int32))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, z[:2],
                        train=False)["params"]
    # the production chain (train/prior.py:362-364)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-4))
    opt_state = tx.init(params)

    def step(params, opt_state, z, rng):
        def loss(p):
            return model.apply({"params": p}, z, train=True,
                               method="loss_function",
                               rngs={"dropout": rng})["total_loss"]

        l, g = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    compiled = jax.jit(step, donate_argnums=(0, 1)).lower(
        params, opt_state, z, rng).compile()
    return compiled, params, opt_state, z, rng


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prior", default="pixelsnail",
                   choices=["pixelcnn", "pixelsnail"])
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--grid", type=int, default=16)
    p.add_argument("--blocks", type=int, default=8,
                   help="pixelsnail blocks")
    p.add_argument("--layers", type=int, default=15,
                   help="pixelcnn gated layers")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--measure", action="store_true")
    p.add_argument("--reps", type=int, default=30)
    args = p.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    px = args.batch_size * args.grid * args.grid
    depth = args.blocks if args.prior == "pixelsnail" else args.layers
    print(f"== {args.prior} train step (bs {args.batch_size}, "
          f"{args.grid}x{args.grid}, depth {depth}, {args.dtype}) ==",
          flush=True)

    compiled, params, opt_state, z, rng = build(
        args.prior, args.batch_size, args.grid, args.blocks, args.layers,
        dtype)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)
    t_flop = flops / PEAK_BF16
    t_hbm = bytes_acc / PEAK_HBM
    print(f"flops          : {flops / 1e9:10.2f} G")
    print(f"bytes accessed : {bytes_acc / 1e9:10.3f} GB")
    print(f"roofline (mxu) : {t_flop * 1e3:10.3f} ms "
          f"({px / t_flop / 1e3:,.0f}k px/s)")
    print(f"roofline (hbm) : {t_hbm * 1e3:10.3f} ms "
          f"({px / t_hbm / 1e3:,.0f}k px/s)")
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"peak temp      : "
              f"{getattr(mem, 'temp_size_in_bytes', 0) / 1e9:.3f} GB")

    if args.measure:
        pp, oo = params, opt_state
        for _ in range(5):
            pp, oo, l = compiled(pp, oo, z, rng)
        float(l)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            pp, oo, l = compiled(pp, oo, z, rng)
            float(l)  # per-rep host-fetch sync (CLAUDE.md)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        # per-rep sync pays one tunnel round trip per step (~20 ms RTT,
        # CLAUDE.md) that steady-state training amortizes over its queued
        # dispatch; measure the null round trip in the SAME process and
        # report the device-time estimate alongside
        tiny = jax.jit(lambda s: s + 1).lower(jnp.int32(0)).compile()
        s = tiny(jnp.int32(0))
        rtts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            s = tiny(s)
            int(s)
            rtts.append(time.perf_counter() - t0)
        rtt = sorted(rtts)[len(rtts) // 2]
        dev = max(dt - rtt, 1e-9)
        bound = max(t_flop, t_hbm)
        print(f"null round trip: {rtt * 1e3:10.3f} ms")
        print(f"measured       : {dt * 1e3:10.3f} ms "
              f"({px / dt / 1e3:,.0f}k px/s)  "
              f"[roofline {bound / dt * 100:.1f}%]")
        print(f"minus RTT      : {dev * 1e3:10.3f} ms "
              f"({px / dev / 1e3:,.0f}k px/s)  "
              f"[mxu-eff {t_flop / dev * 100:.1f}%, "
              f"hbm-eff {t_hbm / dev * 100:.1f}%, "
              f"roofline {bound / dev * 100:.1f}%]")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Interleaved A/B: PixelSNAIL prior train step f32 vs bf16 compute.

--compute_dtype now reaches the prior stage (train/prior.py build_prior);
this measures what that buys on hardware at the standard prior shape
(bs 256, 16x16 grid, 8 blocks x 2 res, heads 8, hidden 128). Both arms are
interleaved in ONE process with per-round host-fetch sync and medians
(tunnel noise, CLAUDE.md).

    python scripts/prior_dtype_ab.py [--batch_size 256] [--rounds 7]
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


def build_step(batch_size, grid, dtype, blocks, dropout):
    import optax

    from movae_tpu.models.pixelcnn import PixelSNAIL

    model = PixelSNAIL(num_embeddings=512, embedding_dim=64,
                       hidden_channels=128, num_blocks=blocks,
                       num_res_blocks_per_layer=2, num_heads=8,
                       dropout=dropout, dtype=dtype)
    z = jnp.asarray(np.random.default_rng(1).integers(
        0, 512, (batch_size, grid, grid)).astype(np.int32))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, z[:2],
                        train=False)["params"]
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    def step(params, opt_state, z, rng):
        def loss(p):
            return model.apply({"params": p}, z, train=True,
                               method="loss_function",
                               rngs={"dropout": rng})["total_loss"]

        l, g = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    step = jax.jit(step).lower(params, opt_state, z, rng).compile()
    return step, params, opt_state, z


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--grid", type=int, default=16)
    p.add_argument("--blocks", type=int, default=8)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--rounds", type=int, default=7)
    p.add_argument("--steps_per_round", type=int, default=10)
    args = p.parse_args()
    px = args.batch_size * args.grid * args.grid

    print(f"== PixelSNAIL train step (bs {args.batch_size}, "
          f"{args.grid}x{args.grid}, {args.blocks} blocks) ==", flush=True)
    arms = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        arms[name] = build_step(args.batch_size, args.grid, dt,
                                args.blocks, args.dropout)
    rng = jax.random.PRNGKey(2)
    states = {k: (p0, o0) for k, (s, p0, o0, z) in arms.items()}
    # warmup
    for k, (s, p0, o0, z) in arms.items():
        pp, oo = states[k]
        pp, oo, l = s(pp, oo, z, rng)
        states[k] = (pp, oo)
        float(l)

    times = {k: [] for k in arms}
    for r in range(args.rounds):
        for k, (s, p0, o0, z) in arms.items():
            pp, oo = states[k]
            reps = []
            for _ in range(args.steps_per_round):
                # per-rep host-fetch sync (CLAUDE.md: enqueue-N-then-fetch-
                # once AND block_until_ready both mislead over the tunnel)
                t0 = time.perf_counter()
                pp, oo, l = s(pp, oo, z, rng)
                float(l)
                reps.append(time.perf_counter() - t0)
            states[k] = (pp, oo)
            times[k].extend(reps)
            dt = median(reps)
            print(f"  round {r} {k}: {dt * 1e3:.2f} ms/step "
                  f"({px / dt / 1e3:.0f}k px/s)", flush=True)

    mf, mb = median(times["f32"]), median(times["bf16"])
    print(f"f32  median: {mf * 1e3:.2f} ms/step ({px / mf / 1e3:.0f}k px/s)")
    print(f"bf16 median: {mb * 1e3:.2f} ms/step ({px / mb / 1e3:.0f}k px/s)")
    print(f"bf16 speedup: {mf / mb:.2f}x")


if __name__ == "__main__":
    main()

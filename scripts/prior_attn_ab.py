#!/usr/bin/env python3
"""Interleaved A/B: PixelSNAIL TRAIN-step attention paths at short L.

The r1 dropout-semantics study (BENCH.md) proved attention-OUTPUT dropout
is quality-equivalent to the reference's attention-WEIGHT dropout (delta
inside the seed spread). This measures what the dense weight-dropout path
COSTS at the production prior shape — the dense path materializes the
B x H x L x L matrix and burns threefry bits for every attention weight
(134M draws/step at bs 256 / 16x16 / 8 blocks), while the flash path
streams KV tiles and draws only B x L x C output-mask bits (16x fewer).

Arms (interleaved in ONE process, per-rep host-fetch sync — CLAUDE.md):
  dense-wdrop : dropout 0.1 on attention weights (reference semantics)
  flash-odrop : dropout 0.1 on attention output (flash approximation)
  flash-nodrop: dropout 0.0 (lower bound, no RNG at all)

    python scripts/prior_attn_ab.py [--batch_size 256] [--rounds 7]
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


def build_step(batch_size, grid, blocks, dropout, mode, force_flash=False):
    import functools

    import optax

    import movae_tpu.models.pixelcnn as pcx
    import movae_tpu.ops.attention as attn_ops

    base = attn_ops.causal_attention
    if force_flash:
        # experiment arm: route even short L through the pallas flash
        # kernel instead of the XLA dense matrix (dense_threshold=0);
        # restored after compile — the compiled executable keeps the
        # traced behavior
        attn_ops.causal_attention = functools.partial(
            base, dense_threshold=0)

    model = pcx.PixelSNAIL(num_embeddings=512, embedding_dim=64,
                           hidden_channels=128, num_blocks=blocks,
                           num_res_blocks_per_layer=2, num_heads=8,
                           dropout=dropout, dtype=jnp.bfloat16,
                           attn_dropout_mode=mode)
    z = jnp.asarray(np.random.default_rng(1).integers(
        0, 512, (batch_size, grid, grid)).astype(np.int32))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, z[:2],
                        train=False)["params"]
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

    try:
        compiled = jax.jit(step).lower(params, opt_state, z,
                                       rng).compile()
    finally:
        attn_ops.causal_attention = base
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return compiled, params, opt_state, z, ca.get("bytes accessed", 0.0)


def median(xs):
    return sorted(xs)[len(xs) // 2]


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

    print(f"== PixelSNAIL train-step attention A/B (bs {args.batch_size}, "
          f"{args.grid}x{args.grid}, {args.blocks} blocks, bf16) ==",
          flush=True)
    specs = {
        "dense-wdrop": (args.dropout, "weights", False),
        "flash-odrop": (args.dropout, "output", False),
        "flash-nodrop": (0.0, "output", False),
        "pallas-odrop": (args.dropout, "output", True),
    }
    arms = {}
    for name, (drop, mode, ff) in specs.items():
        try:
            arms[name] = build_step(args.batch_size, args.grid,
                                    args.blocks, drop, mode,
                                    force_flash=ff)
        except Exception as e:
            print(f"  {name}: SKIPPED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
        print(f"  {name}: bytes accessed "
              f"{arms[name][4] / 1e9:.2f} GB/step", flush=True)

    rng = jax.random.PRNGKey(2)
    states = {k: (a[1], a[2]) for k, a in arms.items()}
    for k, a in arms.items():
        pp, oo, l = a[0](*states[k], a[3], rng)
        states[k] = (pp, oo)
        float(l)

    times = {k: [] for k in arms}
    for r in range(args.rounds):
        for k, a in arms.items():
            pp, oo = states[k]
            reps = []
            for _ in range(args.steps_per_round):
                t0 = time.perf_counter()
                pp, oo, l = a[0](pp, oo, a[3], rng)
                float(l)
                reps.append(time.perf_counter() - t0)
            states[k] = (pp, oo)
            times[k].extend(reps)
            dt = median(reps)
            print(f"  round {r} {k}: {dt * 1e3:.2f} ms/step "
                  f"({px / dt / 1e3:.0f}k px/s)", flush=True)

    base = median(times["dense-wdrop"])
    for k in arms:
        dt = median(times[k])
        print(f"{k:13s} median: {dt * 1e3:7.2f} ms/step "
              f"({px / dt / 1e3:.0f}k px/s)  {base / dt:.2f}x vs dense")


if __name__ == "__main__":
    main()

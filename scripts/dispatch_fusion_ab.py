#!/usr/bin/env python3
"""Interleaved A/B: plain per-step dispatch vs k-fused dispatch
(`--steps_per_dispatch`) on the headline VQ-VAE train-step bench shape.

Tunnel throughput is noisy (CLAUDE.md: +-30% across processes), so both
arms run interleaved in ONE process with per-round host-fetch sync, and the
medians over rounds are compared. Usage:

    python scripts/dispatch_fusion_ab.py --batch_size 256 --k 8 --rounds 7
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
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--rounds", type=int, default=7)
    p.add_argument("--steps_per_round", type=int, default=40)
    p.add_argument("--agg", type=str, default="sum")
    p.add_argument("--input_size", type=int, default=32)
    args = p.parse_args()

    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.parallel.mesh import DataParallel
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import (make_scanned_train_step,
                                      make_train_step)

    model_args = dict(
        arch="vq_vae", embedding_dim=64, num_embeddings=512,
        hidden_dims=(128, 256), num_residual_layers=2,
        batch_size=args.batch_size, dataset_size=50000,
        recons_objective="mse",
        compute_dtype="bfloat16" if jax.default_backend() != "cpu"
        else "float32",
    )
    model = get_network(args.input_size, 3, model_args)
    params, bstats = init_model(model, jax.random.PRNGKey(0),
                                args.input_size, 3, batch_size=2)
    cfg = AggregatorConfig(name=args.agg,
                           num_objectives=len(model.objective_names))
    tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
    parallel = DataParallel()

    def fresh_state():
        # deep-copy leaves: both arms donate their state, so sharing param
        # buffers between the two TrainStates would let arm A's donation
        # delete arm B's arrays
        own = jax.tree_util.tree_map(jnp.array, (params, bstats))
        return parallel.replicate(
            TrainState.create(model.apply, own[0], own[1], tx,
                              init_state(cfg)))

    raw_step = make_train_step(model, cfg, 1, 1)
    step_fn = jax.jit(raw_step, donate_argnums=(0,))
    scan_fn = jax.jit(make_scanned_train_step(raw_step, args.k),
                      donate_argnums=(0,))

    rng = np.random.default_rng(0)
    x_np = rng.uniform(-1, 1, (args.batch_size, args.input_size,
                               args.input_size, 3)).astype(np.float32)
    batch = parallel.shard_batch(jnp.asarray(x_np))
    stacked = parallel.shard_batch_stacked(
        np.broadcast_to(x_np, (args.k,) + x_np.shape).copy())
    key = jax.random.PRNGKey(1)

    n_plain = args.steps_per_round
    n_fused = max(args.steps_per_round // args.k, 1)

    def run_plain(state, key):
        t0 = time.perf_counter()
        for _ in range(n_plain):
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, batch, sub)
        float(metrics["total_loss"])
        return time.perf_counter() - t0, state, key

    def run_fused(state, key):
        t0 = time.perf_counter()
        for _ in range(n_fused):
            key, sub = jax.random.split(key)
            state, metrics = scan_fn(state, stacked, sub)
        tl = metrics["total_loss"]
        float(tl[-1])
        return time.perf_counter() - t0, state, key

    sa, sb = fresh_state(), fresh_state()
    # compile both arms up front
    _, sa, key = run_plain(sa, key)
    _, sb, key = run_fused(sb, key)

    plain_t, fused_t = [], []
    for r in range(args.rounds):
        dt, sa, key = run_plain(sa, key)
        plain_t.append(dt)
        dt, sb, key = run_fused(sb, key)
        fused_t.append(dt)

    mp = sorted(plain_t)[len(plain_t) // 2]
    mf = sorted(fused_t)[len(fused_t) // 2]
    ips_p = n_plain * args.batch_size / mp
    ips_f = n_fused * args.k * args.batch_size / mf
    print(f"bs={args.batch_size} agg={args.agg} rounds={args.rounds}")
    print(f"  plain  (k=1):        {ips_p:10.1f} img/s  (median of "
          f"{[round(t, 3) for t in plain_t]})")
    print(f"  fused  (k={args.k}):        {ips_f:10.1f} img/s  (median of "
          f"{[round(t, 3) for t in fused_t]})")
    print(f"  fused/plain = {ips_f / ips_p:.3f}")


if __name__ == "__main__":
    main()

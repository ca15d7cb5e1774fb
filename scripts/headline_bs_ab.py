#!/usr/bin/env python3
"""Interleaved A/B: headline VQ-VAE train-step throughput at two batch
sizes (default 256 vs 512), both with fused k-step dispatch. Decides the
bench.py default shape honestly: same process, alternating rounds,
per-round host-fetch sync, median img/s per arm.

    python scripts/headline_bs_ab.py --k 8 --rounds 7
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


def build_arm(batch_size, k, steps_per_round):
    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import (make_scanned_train_step,
                                      make_train_step)

    model_args = dict(
        arch="vq_vae", embedding_dim=64, num_embeddings=512,
        hidden_dims=(128, 256), num_residual_layers=2,
        batch_size=batch_size, dataset_size=50000,
        recons_objective="mse", compute_dtype="bfloat16")
    model = get_network(32, 3, model_args)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), 32, 3,
                                     batch_size=2)
    cfg = AggregatorConfig(name="sum",
                           num_objectives=len(model.objective_names))
    tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
    state = TrainState.create(model.apply, params, batch_stats, tx,
                              init_state(cfg))
    raw_step = make_train_step(model, cfg, 1, 1)
    step_fn = jax.jit(make_scanned_train_step(raw_step, k),
                      donate_argnums=(0,))
    x_np = np.random.default_rng(2).uniform(
        -1, 1, (batch_size, 32, 32, 3)).astype(np.float32)
    x = jnp.asarray(np.broadcast_to(x_np, (k,) + x_np.shape).copy())
    rng0 = jax.random.PRNGKey(3)
    n_dispatch = max(1, steps_per_round // k)

    def run(state):
        rng = rng0
        t0 = time.perf_counter()
        for _ in range(n_dispatch):
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, x, sub)
        float(metrics["total_loss"][-1])  # host-fetch sync
        dt = time.perf_counter() - t0
        return state, (n_dispatch * k * batch_size) / dt

    return state, run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs_a", type=int, default=256)
    p.add_argument("--bs_b", type=int, default=512)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--rounds", type=int, default=7)
    p.add_argument("--steps_per_round", type=int, default=48)
    args = p.parse_args()

    state_a, run_a = build_arm(args.bs_a, args.k, args.steps_per_round)
    state_b, run_b = build_arm(args.bs_b, args.k, args.steps_per_round)
    state_a, _ = run_a(state_a)  # compile+warm
    state_b, _ = run_b(state_b)

    res = {args.bs_a: [], args.bs_b: []}
    for rnd in range(args.rounds):
        state_a, ips_a = run_a(state_a)
        state_b, ips_b = run_b(state_b)
        res[args.bs_a].append(ips_a)
        res[args.bs_b].append(ips_b)
        print(f"round {rnd}: bs{args.bs_a} {ips_a:,.0f} img/s | "
              f"bs{args.bs_b} {ips_b:,.0f} img/s")

    ma = float(np.median(res[args.bs_a]))
    mb = float(np.median(res[args.bs_b]))
    print(f"median: bs{args.bs_a} {ma:,.0f} | bs{args.bs_b} {mb:,.0f} "
          f"({mb/ma:.3f}x)")


if __name__ == "__main__":
    main()

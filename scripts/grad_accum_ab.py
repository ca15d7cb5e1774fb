#!/usr/bin/env python3
"""Interleaved A/B: direct big-batch step vs --grad_accum A at the SAME
effective batch (A microbatches of E/A, averaged grads, one update).

Accumulation is the memory lever (activations scale with the microbatch,
not the effective batch); this measures its throughput cost. Both arms run
interleaved in ONE process with per-round host-fetch sync (tunnel noise is
+-30% across processes — CLAUDE.md), medians over rounds.

    python scripts/grad_accum_ab.py --effective 256 --accum 4
    python scripts/grad_accum_ab.py --arch vq_vae2 --input_size 256 \
        --effective 64 --accum 4 --agg upgrad
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movae_tpu.utils import (enable_persistent_compilation_cache,
                             require_live_backend)

enable_persistent_compilation_cache()
require_live_backend()  # tunnel outages HANG backend init — probe first

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--effective", type=int, default=256,
                   help="effective batch size (both arms)")
    p.add_argument("--accum", type=int, default=4)
    p.add_argument("--rounds", type=int, default=7)
    p.add_argument("--updates_per_round", type=int, default=10)
    p.add_argument("--agg", type=str, default="sum")
    p.add_argument("--arch", type=str, default="vq_vae")
    p.add_argument("--input_size", type=int, default=32)
    args = p.parse_args()
    assert args.effective % args.accum == 0
    micro = args.effective // args.accum

    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.parallel.mesh import DataParallel
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step

    model_args = dict(
        arch=args.arch, embedding_dim=64, num_embeddings=512,
        hidden_dims=(128, 256), num_residual_layers=2,
        batch_size=args.effective, dataset_size=50000,
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
        own = jax.tree_util.tree_map(jnp.array, (params, bstats))
        return parallel.replicate(
            TrainState.create(model.apply, own[0], own[1], tx,
                              init_state(cfg)))

    direct_fn = jax.jit(make_train_step(model, cfg, 1, 1),
                        donate_argnums=(0,))
    accum_fn = jax.jit(make_train_step(model, cfg, 1, 1,
                                       grad_accum=args.accum),
                       donate_argnums=(0,))

    rng = np.random.default_rng(0)
    x_np = rng.uniform(-1, 1, (args.effective, args.input_size,
                               args.input_size, 3)).astype(np.float32)
    big = parallel.shard_batch(jnp.asarray(x_np))
    stacked = parallel.shard_batch_stacked(
        x_np.reshape(args.accum, micro, *x_np.shape[1:]).copy())
    key = jax.random.PRNGKey(1)
    n = args.updates_per_round

    def run(fn, batch, state, key):
        t0 = time.perf_counter()
        for _ in range(n):
            key, sub = jax.random.split(key)
            state, metrics = fn(state, batch, sub)
        float(metrics["total_loss"])  # host-fetch sync barrier
        return time.perf_counter() - t0, state, key

    sa, sb = fresh_state(), fresh_state()
    _, sa, key = run(direct_fn, big, sa, key)  # compile
    _, sb, key = run(accum_fn, stacked, sb, key)

    dt_d, dt_a = [], []
    for _ in range(args.rounds):
        t, sa, key = run(direct_fn, big, sa, key)
        dt_d.append(t)
        t, sb, key = run(accum_fn, stacked, sb, key)
        dt_a.append(t)

    md = sorted(dt_d)[len(dt_d) // 2]
    ma = sorted(dt_a)[len(dt_a) // 2]
    ips_d = n * args.effective / md
    ips_a = n * args.effective / ma
    print(f"arch={args.arch} {args.input_size}px agg={args.agg} "
          f"effective={args.effective} accum={args.accum} (micro={micro})")
    print(f"  direct bs={args.effective}:   {ips_d:10.1f} img/s  "
          f"({[round(t, 3) for t in dt_d]})")
    print(f"  accum  {args.accum}x{micro}:      {ips_a:10.1f} img/s  "
          f"({[round(t, 3) for t in dt_a]})")
    print(f"  accum/direct = {ips_a / ips_d:.3f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Interleaved A/B: scatter vs scatter-free VQ/prior hot paths on hardware.

Arm A (naive): jnp.take codebook lookup (VJP = scatter-add), .at[].set
usage masks, optax integer CE (take_along_axis VJP = scatter), nn.Embed.
Arm B (production): ops.vq.gather_rows one-hot-matmul VJP,
used_codes_mask compare-any, objectives.integer_cross_entropy.

Interleaves both arms in ONE process (tunnel noise makes cross-process
comparisons meaningless, CLAUDE.md) with per-round host-fetch sync and
reports medians.

    python scripts/scatter_ab.py [--batch_size 1024] [--rounds 7]
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


def build_vq_step(batch_size, naive, arch="vq_vae", input_size=32):
    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.ops import vq as vq_mod
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step

    saved = (vq_mod.vq_lookup, vq_mod.used_codes_mask)
    if naive:
        def naive_lookup(z_flat, codebook, use_pallas=None):
            inds = vq_mod.nearest_code_indices(z_flat, codebook, use_pallas)
            return jnp.take(codebook, inds, axis=0), inds

        def naive_mask(inds, k):
            return jnp.zeros((k,), jnp.bool_).at[inds.reshape(-1)].set(True)

        vq_mod.vq_lookup = naive_lookup
        vq_mod.used_codes_mask = naive_mask
    try:
        model_args = dict(
            arch=arch, embedding_dim=64, num_embeddings=512,
            hidden_dims=(128, 256), num_residual_layers=2,
            batch_size=batch_size, dataset_size=50000,
            recons_objective="mse", compute_dtype="bfloat16")
        model = get_network(input_size, 3, model_args)
        params, bs = init_model(model, jax.random.PRNGKey(0), input_size, 3,
                                batch_size=2)
        cfg = AggregatorConfig(name="sum",
                               num_objectives=len(model.objective_names))
        tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
        state = TrainState.create(model.apply, params, bs, tx,
                                  init_state(cfg))
        step = jax.jit(make_train_step(model, cfg, 1, 1))
        x = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (batch_size, input_size, input_size, 3)
        ).astype(np.float32))
        # trace now, while the patch is active
        step = step.lower(state, x, jax.random.PRNGKey(1)).compile()
    finally:
        vq_mod.vq_lookup, vq_mod.used_codes_mask = saved
    return step, state, x


def build_prior_step(batch_size, naive):
    import optax
    from flax import linen as nn

    from movae_tpu.models import pixelcnn as pc

    saved = (pc.GatherEmbed, pc.integer_cross_entropy)
    if naive:
        pc.GatherEmbed = nn.Embed
        pc.integer_cross_entropy = (
            lambda lg, lb: optax.softmax_cross_entropy_with_integer_labels(
                lg, lb).mean())
    try:
        model = pc.PixelCNN(num_embeddings=512, embedding_dim=64,
                            hidden_channels=128, num_layers=15)
        z = jnp.asarray(np.random.default_rng(1).integers(
            0, 512, (batch_size, 16, 16)).astype(np.int32))
        params = model.init(jax.random.PRNGKey(0), z)["params"]
        import optax as ox
        tx = ox.adam(3e-4)
        opt_state = tx.init(params)

        def step(params, opt_state, z):
            def loss(p):
                return model.apply({"params": p}, z, train=False,
                                   method="loss_function")["total_loss"]
            l, g = jax.value_and_grad(loss)(params)
            updates, opt_state = tx.update(g, opt_state, params)
            return ox.apply_updates(params, updates), opt_state, l

        step = jax.jit(step).lower(params, opt_state, z).compile()
    finally:
        pc.GatherEmbed, pc.integer_cross_entropy = saved
    return step, params, opt_state, z


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--arch", type=str, default="vq_vae")
    p.add_argument("--input_size", type=int, default=32)
    p.add_argument("--prior_batch_size", type=int, default=256)
    p.add_argument("--rounds", type=int, default=7)
    p.add_argument("--steps_per_round", type=int, default=20)
    p.add_argument("--skip_prior", action="store_true")
    args = p.parse_args()

    print(f"== {args.arch} train step ({args.input_size}px, "
          f"bs {args.batch_size}) ==", flush=True)
    a_step, a_state, x = build_vq_step(args.batch_size, True,
                                       args.arch, args.input_size)
    b_step, b_state, _ = build_vq_step(args.batch_size, False,
                                       args.arch, args.input_size)
    key = jax.random.PRNGKey(2)
    # warmup both
    for _ in range(3):
        a_state, am = a_step(a_state, x, key)
        b_state, bm = b_step(b_state, x, key)
    float(am["total_loss"]); float(bm["total_loss"])

    ta, tb = [], []
    for r in range(args.rounds):
        for arm in ("a", "b"):
            t0 = time.perf_counter()
            for _ in range(args.steps_per_round):
                if arm == "a":
                    a_state, m = a_step(a_state, x, key)
                else:
                    b_state, m = b_step(b_state, x, key)
            float(m["total_loss"])
            (ta if arm == "a" else tb).append(time.perf_counter() - t0)
    da, db = median(ta), median(tb)
    n = args.steps_per_round * args.batch_size
    print(f"scatter (naive)   : {da/args.steps_per_round*1e3:8.2f} ms/step "
          f"({n/da:,.0f} img/s)")
    print(f"scatter-free      : {db/args.steps_per_round*1e3:8.2f} ms/step "
          f"({n/db:,.0f} img/s)")
    print(f"speedup           : {da/db:.3f}x")

    if args.skip_prior:
        return
    print("== PixelCNN prior train step ==", flush=True)
    pa, a_params, a_opt, z = build_prior_step(args.prior_batch_size, True)
    pb, b_params, b_opt, _ = build_prior_step(args.prior_batch_size, False)
    for _ in range(3):
        a_params, a_opt, la = pa(a_params, a_opt, z)
        b_params, b_opt, lb = pb(b_params, b_opt, z)
    float(la); float(lb)
    ta, tb = [], []
    for r in range(args.rounds):
        for arm in ("a", "b"):
            t0 = time.perf_counter()
            for _ in range(args.steps_per_round):
                if arm == "a":
                    a_params, a_opt, l = pa(a_params, a_opt, z)
                else:
                    b_params, b_opt, l = pb(b_params, b_opt, z)
            float(l)
            (ta if arm == "a" else tb).append(time.perf_counter() - t0)
    da, db = median(ta), median(tb)
    print(f"scatter (naive)   : {da/args.steps_per_round*1e3:8.2f} ms/step")
    print(f"scatter-free      : {db/args.steps_per_round*1e3:8.2f} ms/step")
    print(f"speedup           : {da/db:.3f}x")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Interleaved A/B: host-loader feeding (uint8 batch H2D every dispatch)
vs device-resident data (`--device_data`: whole train set in HBM, batches
gathered in-jit, only an int32 index block crosses the link).

Both arms run the REAL feeding path of their mode — arm A assembles host
batches with the native gather+flip and ships them via
``shard_batch_stacked`` exactly like ``train_epoch``; arm B uploads the
per-dispatch index block and runs the fed scan exactly like
``train_epoch_device``. Interleaved in ONE process (tunnel noise,
CLAUDE.md), per-round host-fetch sync, medians compared.

    python scripts/device_data_ab.py --batch_size 256 --k 8 --rounds 7
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movae_tpu.utils import enable_persistent_compilation_cache, \
    require_live_backend

enable_persistent_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--rounds", type=int, default=7)
    p.add_argument("--dispatches_per_round", type=int, default=6)
    p.add_argument("--agg", type=str, default="sum")
    p.add_argument("--input_size", type=int, default=32)
    p.add_argument("--n_images", type=int, default=20000)
    args = p.parse_args()
    require_live_backend()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from movae_tpu.data import ArrayDataset
    from movae_tpu.data.device import DeviceData, make_device_fed
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
        batch_size=args.batch_size, dataset_size=args.n_images,
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

    host_rng = np.random.default_rng(0)
    imgs = host_rng.integers(
        0, 256, (args.n_images, args.input_size, args.input_size, 3),
        dtype=np.uint8)
    ds = ArrayDataset(imgs, flip=True, normalize=True)
    dd = DeviceData(ds, parallel, args.batch_size, seed=0)

    def fresh_state():
        own = jax.tree_util.tree_map(jnp.array, (params, bstats))
        return parallel.replicate(
            TrainState.create(model.apply, own[0], own[1], tx,
                              init_state(cfg)))

    raw_step = make_train_step(model, cfg, 1, 1, normalize_inputs=True)
    raw_scan = make_scanned_train_step(raw_step, args.k)
    scan_fn = jax.jit(raw_scan, donate_argnums=(0,))
    fed_scan = jax.jit(make_device_fed(raw_scan, parallel.mesh, dd.flip),
                       donate_argnums=(0,))

    key = jax.random.PRNGKey(1)
    D = args.dispatches_per_round
    idx_plan, _ = dd.epoch_plan(0)

    def run_host(state, key):
        """train_epoch's feed: k host batches assembled + stacked + H2D."""
        t0 = time.perf_counter()
        for d in range(D):
            bufs = []
            for _ in range(args.k):
                ids = host_rng.integers(0, args.n_images, args.batch_size)
                b, _lab = ds.get_batch(ids, host_rng, raw=True)
                bufs.append(np.asarray(b))
            stacked = parallel.shard_batch_stacked(np.stack(bufs))
            key, sub = jax.random.split(key)
            state, metrics = scan_fn(state, stacked, sub)
        float(metrics["total_loss"][-1])
        return time.perf_counter() - t0, state, key

    def run_device(state, key):
        """train_epoch_device's feed: index block H2D + in-jit gather."""
        t0 = time.perf_counter()
        for d in range(D):
            rows = (np.arange(d * args.k, (d + 1) * args.k)
                    % idx_plan.shape[0])
            idx_dev = dd.put_idx(idx_plan[rows], stacked=True)
            key, sub = jax.random.split(key)
            state, metrics = fed_scan(state, dd.images_dev, idx_dev, sub)
        float(metrics["total_loss"][-1])
        return time.perf_counter() - t0, state, key

    sa, sb = fresh_state(), fresh_state()
    _, sa, key = run_host(sa, key)     # compile
    _, sb, key = run_device(sb, key)   # compile

    th, td = [], []
    for r in range(args.rounds):
        dt, sa, key = run_host(sa, key)
        th.append(dt)
        dt, sb, key = run_device(sb, key)
        td.append(dt)

    mh = sorted(th)[len(th) // 2]
    md = sorted(td)[len(td) // 2]
    n_img = D * args.k * args.batch_size
    print(f"bs={args.batch_size} k={args.k} agg={args.agg} "
          f"n={args.n_images} rounds={args.rounds}")
    print(f"  host loader : {n_img / mh:10.1f} img/s  "
          f"({[round(t, 3) for t in th]})")
    print(f"  device data : {n_img / md:10.1f} img/s  "
          f"({[round(t, 3) for t in td]})")
    print(f"  device/host = {mh / md:.3f}x")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dump XLA cost_analysis for the headline train step (bench.py config) and
derive roofline bounds: min time from bf16 MXU flops vs min time from HBM
bytes. Tells us whether the remaining gap to peak is compute or bandwidth.

    python scripts/step_cost.py --batch_size 1024 [--agg sum]
"""

import argparse
import os
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
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--agg", type=str, default="sum")
    p.add_argument("--arch", type=str, default="vq_vae",
                   help="vq_vae (headline) or vq_vae2 --input_size 256 "
                        "(the CelebA-HQ/ImageNet acceptance shape)")
    p.add_argument("--input_size", type=int, default=32)
    p.add_argument("--measure", action="store_true",
                   help="also run + time the step (per-rep sync median, "
                        "RTT-subtracted)")
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args()

    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step

    model_args = dict(
        arch=args.arch, embedding_dim=64, num_embeddings=512,
        hidden_dims=(128, 256), num_residual_layers=2,
        batch_size=args.batch_size, dataset_size=50000,
        recons_objective="mse",
        compute_dtype="bfloat16" if jax.default_backend() != "cpu"
        else "float32",
    )
    model = get_network(args.input_size, 3, model_args)
    params, bs = init_model(model, jax.random.PRNGKey(0), args.input_size, 3,
                            batch_size=2)
    m = len(model.objective_names)
    cfg = AggregatorConfig(name=args.agg, num_objectives=m)
    tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
    state = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    step = jax.jit(make_train_step(model, cfg, 1, 1), donate_argnums=(0,))

    x = jnp.zeros((args.batch_size, args.input_size, args.input_size, 3),
                  jnp.float32)
    key = jax.random.PRNGKey(1)
    lowered = step.lower(state, x, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)
    out_bytes = ca.get("bytes accessed output", 0.0)
    transcend = ca.get("transcendentals", 0.0)
    print(f"flops                : {flops/1e9:10.2f} G")
    print(f"transcendentals      : {transcend/1e9:10.2f} G")
    print(f"bytes accessed       : {bytes_acc/1e9:10.3f} GB")
    print(f"bytes accessed output: {out_bytes/1e9:10.3f} GB")
    # v5e: 197 TFLOP/s bf16 MXU, ~819 GB/s HBM
    t_flop = flops / 197e12
    t_hbm = bytes_acc / 819e9
    print(f"roofline min (flops) : {t_flop*1e3:10.3f} ms "
          f"({args.batch_size/t_flop:,.0f} img/s)")
    print(f"roofline min (HBM)   : {t_hbm*1e3:10.3f} ms "
          f"({args.batch_size/t_hbm:,.0f} img/s)")
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"peak temp allocation : "
              f"{getattr(mem, 'temp_size_in_bytes', 0)/1e9:.3f} GB")

    # per-hlo breakdown of the biggest cost contributors
    try:
        import collections
        txt = compiled.as_text()
        # crude fusion census: count conv/dot/fusion ops
        census = collections.Counter()
        for line in txt.splitlines():
            ls = line.strip()
            for tag in ("convolution", "dot(", "fusion", "scatter",
                        "gather", "reduce(", "transpose("):
                if ls.startswith("%") or " = " in ls:
                    if tag.rstrip("(") in ls.split("=")[-1][:60]:
                        census[tag.rstrip("(")] += 1
                        break
        print("hlo census:", dict(census.most_common(10)))
        for line in txt.splitlines():
            ls = line.strip()
            if "scatter(" in ls:
                print("SCATTER:", ls[:200])
    except Exception as e:  # pragma: no cover
        print("hlo census unavailable:", e)

    if args.measure:
        import time
        x = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, x.shape).astype(np.float32))
        for _ in range(5):
            state, metrics = step(state, x, key)
        float(metrics["total_loss"])
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, metrics = step(state, x, key)
            float(metrics["total_loss"])  # per-rep host-fetch sync
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        # per-rep sync pays one tunnel round trip per step that
        # steady-state training amortizes over queued dispatch; measure
        # the null round trip in the SAME process and report the
        # RTT-subtracted device time + %-of-floor (the same "floor-beaten"
        # accounting the r4 prior rooflines used, scripts/prior_step_cost)
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
        print(f"null round trip      : {rtt*1e3:10.3f} ms")
        print(f"measured             : {dt*1e3:10.3f} ms "
              f"({args.batch_size/dt:,.0f} img/s)  "
              f"[roofline {bound/dt*100:.1f}%]")
        print(f"minus RTT            : {dev*1e3:10.3f} ms "
              f"({args.batch_size/dev:,.0f} img/s)  "
              f"[mxu-eff {t_flop/dev*100:.1f}%, "
              f"hbm-eff {t_hbm/dev*100:.1f}%, "
              f"roofline {bound/dev*100:.1f}%]")


if __name__ == "__main__":
    main()

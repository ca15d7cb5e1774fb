#!/usr/bin/env python3
"""Interleaved A/B: live jitted inference vs the AOT serving artifact.

Sanity-checks that the deserialized jax.export artifact
(movae_tpu/serving.py) pays no throughput tax over the live flax model
for the serving surface (reconstruct / encode_codes / decode_codes) —
both arms are the same XLA program modulo the export round-trip, so the
expected result is parity; a regression here means the export path lost
a fusion or added a layout change. Both arms interleave in ONE process
with per-rep host-fetch sync and medians (tunnel noise, CLAUDE.md).

    python scripts/serving_ab.py [--batch_size 256] [--input_size 32]
                                 [--rounds 7]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from movae_tpu.utils import (enable_persistent_compilation_cache,
                             require_live_backend)

enable_persistent_compilation_cache()
require_live_backend()

import jax
import jax.numpy as jnp
import numpy as np


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--input_size", type=int, default=32)
    p.add_argument("--hidden_dims", type=int, nargs="+", default=[128, 256])
    p.add_argument("--rounds", type=int, default=7)
    p.add_argument("--reps_per_round", type=int, default=10)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    from movae_tpu.models import get_network, init_model
    from movae_tpu.serving import export_serving, load_serving
    from movae_tpu.train.step import preprocess_batch

    size = args.input_size
    # compute_dtype reaches the module dtype through get_network (the same
    # plumbing bench.py uses), so BOTH arms run the bf16 program
    margs = dict(arch="vq_vae", embedding_dim=64, num_embeddings=512,
                 hidden_dims=tuple(args.hidden_dims),
                 num_residual_layers=2, batch_size=args.batch_size,
                 dataset_size=50000, compute_dtype=args.compute_dtype)
    model = get_network(size, 3, margs)
    params, bstats = init_model(model, jax.random.PRNGKey(0), size, 3,
                                batch_size=2)

    out_dir = tempfile.mkdtemp(prefix="movae_serving_ab_")
    export_serving(model, params, bstats, out_dir,
                   platforms=[jax.default_backend()],
                   sample_batch=2, image_batch=args.batch_size,
                   input_size=size)
    art = load_serving(out_dir)

    variables = {"params": params, "batch_stats": bstats}

    def live_reconstruct(x):
        xf = preprocess_batch(x, False)
        return model.apply(variables, xf, train=False,
                           rngs={"sample": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(0)}
                           )["recons"].astype(jnp.float32)

    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (args.batch_size, size, size, 3)).astype(np.uint8))
    arms = {"live": jax.jit(live_reconstruct),
            "artifact": art["reconstruct"]}
    # warmup + equality sanity
    outs = {k: np.asarray(f(x)) for k, f in arms.items()}
    np.testing.assert_allclose(outs["live"], outs["artifact"],
                               rtol=2e-2, atol=2e-2)

    print(f"== reconstruct (bs {args.batch_size}, {size}px, "
          f"{args.compute_dtype}) ==", flush=True)
    times = {k: [] for k in arms}
    for r in range(args.rounds):
        for k, f in arms.items():
            reps = []
            for _ in range(args.reps_per_round):
                t0 = time.perf_counter()
                float(jnp.sum(f(x)))  # per-rep host-fetch sync
                reps.append(time.perf_counter() - t0)
            times[k].extend(reps)
            dt = median(reps)
            print(f"  round {r} {k}: {dt * 1e3:.2f} ms/batch "
                  f"({args.batch_size / dt / 1e3:.1f}k img/s)", flush=True)

    ml, ma = median(times["live"]), median(times["artifact"])
    print(f"live     median: {ml * 1e3:.2f} ms "
          f"({args.batch_size / ml / 1e3:.1f}k img/s)")
    print(f"artifact median: {ma * 1e3:.2f} ms "
          f"({args.batch_size / ma / 1e3:.1f}k img/s)")
    print(f"artifact/live: {ma / ml:.3f}x")


if __name__ == "__main__":
    main()

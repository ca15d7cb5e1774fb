#!/usr/bin/env python3
"""int8 KV-cache sampling quality at production shapes (r2 VERDICT weak 4).

The PixelSNAIL incremental sampler's production default is the int8-seg8
KV cache (movae_tpu/models/pixelcnn.py sample_fast_snail, 697k px/s on
v5e). Its quality evidence so far was a 5x5 grid with a 70% match-fraction
threshold. This script measures, at production shapes (16x16 bs 256 and
64x64) on a briefly-TRAINED prior (random init has near-uniform logits —
quantization effects would be unrepresentative):

1. **Per-pixel KL(f32 || cache_dtype)** on a fixed teacher-forced code
   sequence: the dense forward gives the exact f32 per-pixel conditionals
   (bitwise-equal to the f32 incremental path, tested in
   tests/test_pixelcnn.py), and the forced-mode incremental sampler gives
   the conditionals the lossy cache actually produces. This isolates the
   distributional perturbation from sampling stochasticity. Reference
   sampler semantics: pixelcnn_prior.py:334-349 (full f32 forward/pixel).

2. **Prior CE of sampled codes** per cache dtype (same rng), against the
   seed-noise band of the f32 arm across independent rngs: if int8
   sampling skewed the sample distribution, its samples' dense-forward CE
   would sit outside the f32 seed band.

3. Exact-match fraction vs the f32 sampler at the same rng (the old 5x5
   metric, now at production shape) — for continuity, not as the bar.

Run on chip:
    python scripts/kv_quality_study.py --json /tmp/kv_quality.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movae_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax


def structured_codes(rng, n, size, num_embeddings):
    """Smooth low-frequency random fields quantized to the codebook —
    learnable structure so a short training run sharpens the prior."""
    freq = rng.normal(size=(n, 4, 4)) * 2.0
    up = np.array(jax.image.resize(jnp.asarray(freq), (n, size, size),
                                   "bicubic"))
    up = up + 0.15 * rng.normal(size=up.shape)
    lo, hi = np.percentile(up, [1, 99])
    q = np.clip((up - lo) / max(hi - lo, 1e-6), 0, 1)
    return (q * (num_embeddings - 1)).round().astype(np.int32)


def train_prior(model, size, steps, batch, seed=0):
    rng = np.random.default_rng(seed)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, size, size), jnp.int32))["params"]
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb):
        def loss_fn(p):
            return model.apply({"params": p}, xb, train=False,
                               method="loss_function")["total_loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    data = structured_codes(rng, 2048, size, model.num_embeddings)
    loss = None
    for i in range(steps):
        xb = jnp.asarray(data[rng.integers(0, len(data), batch)])
        params, opt_state, loss = step(params, opt_state, xb)
        if i % 50 == 0 or i == steps - 1:
            print(f"  train step {i}: CE {float(loss):.4f}", flush=True)
    return params


_DENSE_CE_CHUNK = 64  # at 64x64 the flash kernel's dk=16 operands pad
# 8x onto T(8,128) tiles (f32[B,4096,8,16] -> 4 GB at B=256): score in
# fixed-size chunks so the temps stay ~1 GB.
_dense_ce_fns = {}


def dense_ce(model, params, codes):
    """Teacher-forced dense-forward CE (nats/pixel) of a code batch,
    averaged over fixed-size chunks (one compiled program per shape)."""
    key = (id(model), codes.shape[1:])
    if key not in _dense_ce_fns:
        _dense_ce_fns[key] = jax.jit(lambda x: model.apply(
            {"params": params}, x, train=False,
            method="loss_function")["total_loss"])
    fn = _dense_ce_fns[key]
    codes = np.asarray(codes)
    n = len(codes)
    tot, cnt = 0.0, 0
    for i in range(0, n, _DENSE_CE_CHUNK):
        chunk = codes[i:i + _DENSE_CE_CHUNK]
        if len(chunk) < _DENSE_CE_CHUNK and i > 0:
            break  # drop ragged tail rather than recompile (CE is a mean)
        tot += float(fn(jnp.asarray(chunk))) * len(chunk)
        cnt += len(chunk)
    return tot / cnt


@jax.jit
def _kl_stats(logits_p, logits_q):
    """KL(p||q) per pixel in nats; returns (mean, p99, max) scalars."""
    lp = jax.nn.log_softmax(logits_p, axis=-1)
    lq = jax.nn.log_softmax(logits_q, axis=-1)
    kl = jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1)   # (B, H, W)
    flat = kl.reshape(-1)
    return (jnp.mean(flat), jnp.percentile(flat, 99), jnp.max(flat))


def study_shape(model, params, size, batch, n_batches, seeds):
    from movae_tpu.models.pixelcnn import KV_CACHE_DTYPES, sample_fast_snail

    out = dict(grid=size, batch=batch, n_batches=n_batches)
    rngs = [jax.random.PRNGKey(100 + s) for s in range(n_batches)]

    # --- sample each arm with the same rng stream ---------------------
    samples = {}
    for name, dt in KV_CACHE_DTYPES.items():
        fn = jax.jit(lambda r, dt=dt: sample_fast_snail(
            model, params, r, batch, size, size, cache_dtype=dt))
        samples[name] = np.concatenate(
            [np.asarray(fn(r)) for r in rngs])
        print(f"  sampled {name} ({samples[name].shape})", flush=True)

    # --- 3. exact-match fraction vs f32, same rng ---------------------
    for name in samples:
        if name != "f32":
            out[f"match_frac_{name}"] = float(
                np.mean(samples[name] == samples["f32"]))

    # --- 2. dense CE of each arm's samples + f32 seed band ------------
    for name, codes in samples.items():
        out[f"sample_ce_{name}"] = dense_ce(model, params,
                                            jnp.asarray(codes))
    band = []
    fn32 = jax.jit(lambda r: sample_fast_snail(
        model, params, r, batch, size, size, cache_dtype=jnp.float32))
    for s in range(seeds):
        r = jax.random.PRNGKey(900 + s)
        band.append(dense_ce(model, params, fn32(r)))
    out["f32_seed_band_ce"] = band
    out["f32_seed_band_std"] = float(np.std(band))

    # --- 1. per-pixel KL on a fixed forced sequence -------------------
    # reference arm = the f32-cache forced incremental run: bitwise the
    # f32 sampler's conditionals (the dense forward switches to flash
    # attention at L >= 1024, whose online softmax is not bitwise-equal)
    forced = jnp.asarray(samples["f32"][:batch])

    def forced_logits(dt):
        _, lg = jax.jit(lambda r: sample_fast_snail(
            model, params, r, batch, size, size, cache_dtype=dt,
            forced=forced, return_logits=True))(rngs[0])
        return lg

    ref_logits = forced_logits(jnp.float32)
    for name, dt in KV_CACHE_DTYPES.items():
        if name == "f32":
            continue
        q_logits = forced_logits(dt)
        mean, p99, mx = _kl_stats(ref_logits, q_logits)
        out[f"kl_{name}"] = dict(mean=float(mean), p99=float(p99),
                                 max=float(mx))
        print(f"  KL(f32||{name}): mean {float(mean):.2e} "
              f"p99 {float(p99):.2e} max {float(mx):.2e}", flush=True)
        del q_logits
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_steps", type=int, default=300)
    p.add_argument("--train_batch", type=int, default=64)
    p.add_argument("--seeds", type=int, default=4)
    p.add_argument("--json", default=None)
    p.add_argument("--skip64", action="store_true")
    args = p.parse_args()

    from movae_tpu.models.pixelcnn import PixelSNAIL

    model = PixelSNAIL(num_embeddings=512, embedding_dim=64,
                       hidden_channels=128, num_blocks=8,
                       num_res_blocks_per_layer=2, num_heads=8, dropout=0.0)
    print(f"training prior ({args.train_steps} steps @ 16x16)...",
          flush=True)
    params = train_prior(model, 16, args.train_steps, args.train_batch)

    results = []
    print("== 16x16, bs 256 ==", flush=True)
    results.append(study_shape(model, params, 16, 256, 1, args.seeds))
    if not args.skip64:
        # bs 128 x 2 rng draws: the f32 arm's KV+activation caches at
        # 64x64 bs 256 (~13.5 GB) don't fit v5e HBM next to temporaries
        print("== 64x64, bs 128 x2 ==", flush=True)
        results.append(study_shape(model, params, 64, 128, 2, args.seeds))

    print(json.dumps(results, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

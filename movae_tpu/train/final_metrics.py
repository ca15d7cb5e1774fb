"""End-of-run metric passes: reconstruction + generative metrics.

Equivalents of the reference's evaluate_with_recon_metrics
(/root/reference/main.py:376-463) and evaluate_generative_metrics
(main.py:695-887): collect test reconstructions -> rFID/PSNR/SSIM/LPIPS;
generate samples (prior-driven for VQ models, latent sampling otherwise) and
matched real images -> gFID/IS/KID with a shared Inception feature pass.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from movae_tpu.metrics import features as feat_lib
from movae_tpu.metrics import pixel as pixel_lib
from movae_tpu.metrics.vgg import make_lpips_fn
from movae_tpu.models.pixelcnn import sample_hierarchical, sample_prior


def collect_recons(model, state, loader, rng, max_samples: int):
    """Returns (real, recons, advanced_rng) — callers must thread the
    returned key onward so later passes don't reuse recon-batch keys."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def recon(batch, rng):
        out = model.apply(variables, batch, train=False,
                          rngs={"sample": rng, "dropout": rng})
        return out["recons"]

    reals, recons = [], []
    n = 0
    for imgs, _labels, n_valid in loader:
        rng, sub = jax.random.split(rng)
        r = recon(jnp.asarray(imgs), sub)
        reals.append(np.asarray(imgs)[:n_valid])
        recons.append(np.asarray(r)[:n_valid])
        n += n_valid
        if n >= max_samples:
            break
    real = np.concatenate(reals)[:max_samples]
    rec = np.concatenate(recons)[:max_samples]
    return real, rec, rng


def evaluate_recon_metrics(model, state, loader, rng,
                           max_samples: int = 10000) -> Dict[str, float]:
    """rFID / PSNR / SSIM / LPIPS over test reconstructions
    (main.py:376-463). Pixel metrics run in batches of 128 with an
    UNWEIGHTED mean over per-batch values, exactly like the reference
    (_compute_recon_metrics_from_tensors, main.py:335-367) — a single call
    over 10k 256px images would materialize tens of GB of SSIM
    intermediates."""
    real, rec, rng = collect_recons(model, state, loader, rng, max_samples)
    out: Dict[str, float] = {}
    bs = 128
    psnr_vals, ssim_vals = [], []
    for i in range(0, len(real), bs):
        a, b = jnp.asarray(real[i:i + bs]), jnp.asarray(rec[i:i + bs])
        psnr_vals.append(float(pixel_lib.psnr(a, b)))
        ssim_vals.append(float(pixel_lib.ssim(a, b)))
    out["psnr"] = float(np.mean(psnr_vals)) if psnr_vals else float("nan")
    out["ssim"] = float(np.mean(ssim_vals)) if ssim_vals else float("nan")
    try:
        lpips_fn = make_lpips_fn()
        vals = []
        for i in range(0, len(real), bs):
            vals.append(float(lpips_fn(jnp.asarray(real[i:i + bs]),
                                       jnp.asarray(rec[i:i + bs]))))
        out["lpips"] = float(np.mean(vals)) if vals else float("nan")
    except Exception as e:  # pragma: no cover
        print(f"lpips failed: {e}")
        out["lpips"] = float("nan")
    try:
        rf = feat_lib.extract_inception_features(real)
        ff = feat_lib.extract_inception_features(rec)
        out["rfid"] = feat_lib.fid_from_features(rf, ff)
    except Exception as e:  # pragma: no cover
        print(f"rfid failed: {e}")
        out["rfid"] = float("nan")
    return out


def generate_samples(model, state, args, prior: Optional[Dict[str, Any]],
                     rng, num: int, batch: int = 64) -> np.ndarray:
    """Batched sample generation: prior-driven for VQ models
    (main.py:738-758, 1054-1085), plain model.sample otherwise.

    Data-parallel over the device mesh: a sample-parallel config
    (parallel/context.py) batch-shards the samplers' canvases/caches so
    the per-pixel loops and the VQ decode run SPMD over 'data' with zero
    collectives — partitionable threefry keeps the draws bitwise identical
    to the single-device sampler (tested). Auto-installed over all GLOBAL
    devices when none is active — on multi-host runs the mesh (and
    _gather_chunk's replicate-reshard) is a cross-process COLLECTIVE, so
    every process must call this; never gate a generate_samples call on
    process 0 (gate only what you do with the returned host array)."""
    import contextlib

    from movae_tpu.parallel.context import (get_sample_parallel,
                                            sample_parallel)

    ctx_mgr = contextlib.nullcontext()
    if get_sample_parallel() is None and jax.device_count() > 1:
        from movae_tpu.parallel.mesh import make_mesh
        ctx_mgr = sample_parallel(make_mesh())
    with ctx_mgr:
        return _generate_samples_impl(model, state, args, prior, rng, num,
                                      batch)


def _gather_chunk(imgs):
    """Host copy of one generated chunk; multi-host, sharded chunks span
    non-addressable devices — re-shard to replicated first (collective:
    every process runs generation, per the callers' contract)."""
    from movae_tpu.parallel.context import get_sample_parallel

    sp = get_sample_parallel()
    if sp is not None and jax.process_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from movae_tpu.parallel.mesh import cached_reshard
        imgs = cached_reshard(NamedSharding(sp.mesh, P()))(imgs)
    return np.asarray(jax.device_get(imgs))


def _generate_samples_impl(model, state, args, prior, rng, num: int,
                           batch: int) -> np.ndarray:
    from movae_tpu.models.pixelcnn import KV_CACHE_DTYPES

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    temperature = getattr(args, "pixelcnn_temperature", 1.0)
    cache_dtype = KV_CACHE_DTYPES[getattr(args, "kv_cache_dtype", "int8")]
    chunks = []
    n = 0
    while n < num:
        need = min(batch, num - n)
        # multi-chunk runs keep ONE static batch shape: a ragged tail
        # chunk would compile a second per-pixel sampler program (minutes
        # over a remote-compile path) and, not dividing the mesh 'data'
        # axis, silently lose the sample-parallel sharding — generate a
        # full batch and slice on the host instead. Single-chunk calls
        # (figures: num <= batch) keep their exact size.
        b = batch if num > batch else need
        rng, sub = jax.random.split(rng)
        if prior is not None:
            pm, pp = prior["model"], prior["params"]
            if prior["hierarchical"]:
                z_top, z_bottom = sample_hierarchical(
                    pm, pp, sub, b,
                    (model.latent_spatial_dim_top,) * 2,
                    (model.latent_spatial_dim_bottom,) * 2,
                    temperature=temperature, cache_dtype=cache_dtype)
                imgs = model.apply(variables, z_top, z_bottom,
                                   method="decode_code")
            else:
                s = model.latent_spatial_dim
                codes = sample_prior(pm, pp, sub, b, s, s,
                                     temperature=temperature,
                                     cache_dtype=cache_dtype)
                imgs = model.apply(variables, codes, method="decode_code")
        else:
            imgs = model.apply(variables, b, method="sample",
                               rngs={"sample": sub, "dropout": sub})
        chunks.append(_gather_chunk(imgs)[:need])
        n += need
    return np.concatenate(chunks)[:num]


def evaluate_generative_metrics(model, state, loader, args,
                                prior: Optional[Dict[str, Any]], rng,
                                max_samples: int = 10000) -> Dict[str, float]:
    """gFID / IS / KID (main.py:695-887).

    The sample count is ``--max_gen_metrics_samples`` (main.py:721 — NOT
    max_fid_samples, which only governs the recon-metrics pass), and real
    vs generated sets are mutually truncated to min(n_real, n_fake)
    before every metric (main.py:811-816). The 'precision'/'recall' keys
    are always present as nan — the reference returns them but keeps the
    computation commented out (main.py:845-846, 876-883)."""
    num = min(max_samples, getattr(args, "max_gen_metrics_samples", 10000))
    out: Dict[str, float] = {k: float("nan") for k in (
        "gfid", "inception_score_mean", "inception_score_std",
        "precision", "recall", "kid")}
    if num <= 0:
        print(f"Warning: max_gen_metrics_samples is {num}, skipping "
              "generative metrics evaluation.")
        return out
    # prior sampling is per-pixel-latency bound: px/s scales ~linearly with
    # batch (see bench.py --mode sampling), so generate at up to 256/batch
    fake = generate_samples(model, state, args, prior, rng, num,
                            batch=min(max(args.batch_size, 64), 256))
    reals = []
    n = 0
    for imgs, _labels, n_valid in loader:
        reals.append(np.asarray(imgs)[:n_valid])
        n += n_valid
        if n >= len(fake):
            break
    real = np.concatenate(reals)[: len(fake)]
    n = min(len(fake), len(real))
    if n < num:
        print(f"Warning: Only {n} samples available (requested {num}). "
              f"Using {n} samples for metrics.")
    fake, real = fake[:n], real[:n]
    try:
        rf = feat_lib.extract_inception_features(real)
        ff = feat_lib.extract_inception_features(fake)
        out["gfid"] = feat_lib.fid_from_features(rf, ff)
        out["kid"] = feat_lib.kid_from_features(rf, ff)
    except Exception as e:  # pragma: no cover
        print(f"gfid/kid failed: {e}")
    try:
        is_mean, is_std = feat_lib.calculate_inception_score(fake)
        out["inception_score_mean"] = is_mean
        out["inception_score_std"] = is_std
    except Exception as e:  # pragma: no cover
        print(f"inception score failed: {e}")
    return out


def run_final_metrics(results: Dict[str, Any], args,
                      prior: Optional[Dict[str, Any]] = None
                      ) -> Dict[str, float]:
    model, state = results["model"], results["state"]
    loader = results["test_loader"]
    rng = results.get("rng", jax.random.PRNGKey(0))
    finals = {}
    # final per-objective eval losses under eval_<key> (reference
    # main.py:1462 logs final/eval_* from the closing evaluate pass)
    for k, v in (results.get("eval_losses") or [{}])[-1].items():
        finals[f"eval_{k}"] = v
    # independent keys up front: evaluate_recon_metrics consumes its key
    # internally without returning the advanced state, so deriving the
    # generative key by re-splitting `rng` would replay the first recon
    # batch's sample key
    recon_key = jax.random.fold_in(rng, 1)
    gen_key = jax.random.fold_in(rng, 2)
    finals.update(evaluate_recon_metrics(
        model, state, loader, recon_key,
        max_samples=getattr(args, "max_fid_samples", 10000)))
    finals.update(evaluate_generative_metrics(
        model, state, loader, args, prior, gen_key,
        max_samples=getattr(args, "max_gen_metrics_samples", 10000)))
    return finals

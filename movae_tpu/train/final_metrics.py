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
    (main.py:376-463)."""
    real, rec, rng = collect_recons(model, state, loader, rng, max_samples)
    out: Dict[str, float] = {}
    out["psnr"] = float(pixel_lib.psnr(jnp.asarray(real), jnp.asarray(rec)))
    out["ssim"] = float(pixel_lib.ssim(jnp.asarray(real), jnp.asarray(rec)))
    try:
        lpips_fn = make_lpips_fn()
        vals = []
        bs = 128
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
    (main.py:738-758, 1054-1085), plain model.sample otherwise."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    temperature = getattr(args, "pixelcnn_temperature", 1.0)
    chunks = []
    n = 0
    while n < num:
        b = min(batch, num - n)
        rng, sub = jax.random.split(rng)
        if prior is not None:
            pm, pp = prior["model"], prior["params"]
            if prior["hierarchical"]:
                z_top, z_bottom = sample_hierarchical(
                    pm, pp, sub, b,
                    (model.latent_spatial_dim_top,) * 2,
                    (model.latent_spatial_dim_bottom,) * 2,
                    temperature=temperature)
                imgs = model.apply(variables, z_top, z_bottom,
                                   method="decode_code")
            else:
                s = model.latent_spatial_dim
                codes = sample_prior(pm, pp, sub, b, s, s,
                                     temperature=temperature)
                imgs = model.apply(variables, codes, method="decode_code")
        else:
            imgs = model.apply(variables, b, method="sample",
                               rngs={"sample": sub, "dropout": sub})
        chunks.append(np.asarray(jax.device_get(imgs)))
        n += b
    return np.concatenate(chunks)[:num]


def evaluate_generative_metrics(model, state, loader, args,
                                prior: Optional[Dict[str, Any]], rng,
                                max_samples: int = 10000) -> Dict[str, float]:
    """gFID / IS / KID (main.py:695-887)."""
    num = min(max_samples, getattr(args, "max_fid_samples", 10000))
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
    out: Dict[str, float] = {}
    try:
        rf = feat_lib.extract_inception_features(real)
        ff = feat_lib.extract_inception_features(fake)
        out["gfid"] = feat_lib.fid_from_features(rf, ff)
        out["kid"] = feat_lib.kid_from_features(rf, ff)
    except Exception as e:  # pragma: no cover
        print(f"gfid/kid failed: {e}")
        out["gfid"] = out["kid"] = float("nan")
    try:
        is_num = min(len(fake), getattr(args, "max_gen_metrics_samples",
                                        10000))
        is_mean, is_std = feat_lib.calculate_inception_score(fake[:is_num])
        out["inception_score_mean"] = is_mean
        out["inception_score_std"] = is_std
    except Exception as e:  # pragma: no cover
        print(f"inception score failed: {e}")
        out["inception_score_mean"] = float("nan")
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
    finals.update(evaluate_recon_metrics(
        model, state, loader, rng,
        max_samples=getattr(args, "max_fid_samples", 10000)))
    rng, sub = jax.random.split(rng)
    finals.update(evaluate_generative_metrics(
        model, state, loader, args, prior, sub,
        max_samples=getattr(args, "max_fid_samples", 10000)))
    return finals

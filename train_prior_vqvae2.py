#!/usr/bin/env python3
"""Standalone hierarchical prior training over a saved VQ-VAE-2 checkpoint.

Rebuild of the reference train_prior_vqvae2.py (/root/reference/
train_prior_vqvae2.py:1-488): load a VQ-VAE-2 checkpoint (the reference
tolerates both ``vq_top.*`` and ``quantize_t.*`` state-dict layouts,
train_prior_vqvae2.py:164-168 — our checkpoints use ``vq_top``/``vq_bottom``),
train a HierarchicalPixelCNN/PixelSNAIL on (z_top, z_bottom) pairs, save
best/final priors, and emit a sample grid decoded through the VQ-VAE-2
codebooks (prior.sample_with_vqvae2 equivalent).

Usage:
  python train_prior_vqvae2.py --model_path <ckpt_dir> --pixelcnn_epochs 50
"""

from __future__ import annotations

import os

# persistent XLA compile cache: repeat runs skip the first-compile cost
# (set via jax.config — env vars are too late when a sitecustomize has
# already imported jax). Opt out with JAX_COMPILATION_CACHE_DIR="".
from movae_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax

from movae_tpu.data import Loader
from movae_tpu.train import prior as prior_lib
from movae_tpu.train.figures import save_sample_grid
from movae_tpu.train.final_metrics import generate_samples
from movae_tpu.utils.logging import ExperimentLogger
from train_prior_vqvae import (build_prior_parser, explicit_cli_args,
                               load_vqvae,
                               merge_cli_over_saved, prior_log_dir,
                               resolve_checkpoint, run_post_prior_metrics)


def main():
    parser = build_prior_parser("vqvae2_checkpoint")
    a = parser.parse_args()

    ckpt_path = resolve_checkpoint(a)
    model, params, batch_stats, vq_args, train_ds, test_ds = load_vqvae(
        ckpt_path, a.dataset, a.data_dir)
    if vq_args.arch.lower() not in ("vq_vae2", "gg_vq_vae2"):
        raise ValueError(
            f"{vq_args.arch} is not hierarchical; use train_prior_vqvae.py")
    save_root = a.save_root or os.path.dirname(
        os.path.dirname(os.path.abspath(ckpt_path)))

    class _State:
        pass

    state = _State()
    state.params = params
    state.batch_stats = batch_stats

    merged = merge_cli_over_saved(vq_args, a,
                                  explicit_cli_args(parser))
    results = {
        "model": model, "state": state, "save_root": save_root,
        # process-sharded like run_training (see train_prior_vqvae.py)
        "train_loader": Loader(
            train_ds,
            merged.batch_size // max(jax.process_count(), 1),
            shuffle=True, seed=merged.seed,
            process_index=jax.process_index(),
            process_count=jax.process_count()),
        # log under the prior's own directory so the original training
        # run's wandb_local/config.json + summary.json stay intact
        "logger": ExperimentLogger(a.use_wandb,
                                   prior_log_dir(save_root, merged),
                                   config=vars(merged)),
    }
    prior = prior_lib.train_prior(results, merged)

    rng = jax.random.PRNGKey(merged.seed + 7)
    imgs = generate_samples(model, state, merged, prior, rng,
                            merged.num_samples)
    png = save_sample_grid(imgs, os.path.join(
        save_root, "figures", "generated", "prior_samples.pdf"),
        getattr(vq_args, "normalize_inputs", False))
    print(f"Saved hierarchical prior samples to {png}")

    if getattr(merged, "max_gen_metrics_samples", 0):
        run_post_prior_metrics(model, state, test_ds, merged, prior, rng,
                               merged, results["logger"])
    results["logger"].finish()


if __name__ == "__main__":
    main()

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

import argparse
import os
from types import SimpleNamespace

import jax

from movae_tpu.data import Loader
from movae_tpu.train import prior as prior_lib
from movae_tpu.train.figures import save_sample_grid
from movae_tpu.train.final_metrics import generate_samples
from movae_tpu.utils.logging import ExperimentLogger
from train_prior_vqvae import load_vqvae


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--save_root", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--prior_type", type=str, default="pixelcnn",
                   choices=["pixelcnn", "pixelsnail"])
    p.add_argument("--pixelcnn_epochs", type=int, default=100)
    p.add_argument("--pixelcnn_hidden_channels", type=int, default=128)
    p.add_argument("--pixelcnn_num_layers", type=int, default=15)
    p.add_argument("--pixelcnn_lr", type=float, default=3e-4)
    p.add_argument("--pixelcnn_temperature", type=float, default=1.0)
    p.add_argument("--pixelsnail_num_blocks", type=int, default=8)
    p.add_argument("--pixelsnail_num_res_blocks", type=int, default=2)
    p.add_argument("--pixelsnail_num_heads", type=int, default=8)
    p.add_argument("--pixelsnail_dropout", type=float, default=0.1)
    p.add_argument("--prior_use_lmdb_codes", action="store_true", default=True)
    p.add_argument("--no_prior_lmdb_codes", action="store_false",
                   dest="prior_use_lmdb_codes")
    p.add_argument("--prior_force_extract_codes", action="store_true")
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--use_wandb", action="store_true")
    a = p.parse_args()

    model, params, batch_stats, vq_args, train_ds, _ = load_vqvae(
        a.model_path, a.dataset, a.data_dir)
    if vq_args.arch.lower() not in ("vq_vae2", "gg_vq_vae2"):
        raise ValueError(
            f"{vq_args.arch} is not hierarchical; use train_prior_vqvae.py")
    save_root = a.save_root or os.path.dirname(
        os.path.dirname(os.path.abspath(a.model_path)))

    class _State:
        pass

    state = _State()
    state.params = params
    state.batch_stats = batch_stats

    merged = SimpleNamespace(**{**vars(vq_args), **vars(a)})
    merged.arch = vq_args.arch
    results = {
        "model": model, "state": state, "save_root": save_root,
        "train_loader": Loader(train_ds, a.batch_size, shuffle=True,
                               seed=a.seed),
        "logger": ExperimentLogger(a.use_wandb, save_root,
                                   config=vars(merged)),
    }
    prior = prior_lib.train_prior(results, merged)

    rng = jax.random.PRNGKey(a.seed + 7)
    imgs = generate_samples(model, state, merged, prior, rng, a.num_samples)
    png = save_sample_grid(imgs, os.path.join(
        save_root, "figures", "generated", "prior_samples.pdf"),
        getattr(vq_args, "normalize_inputs", False))
    print(f"Saved hierarchical prior samples to {png}")


if __name__ == "__main__":
    main()

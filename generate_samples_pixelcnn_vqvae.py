#!/usr/bin/env python3
"""Offline sample generation from a trained VQ-VAE + PixelCNN prior pair.

Rebuild of the reference generate_samples_pixelcnn_vqvae.py
(/root/reference/generate_samples_pixelcnn_vqvae.py:1-208): load the VQ
checkpoint + prior checkpoint, sample codes (compiled incremental-cache
sampler), embed through the codebook, decode, and save either a grid or
per-image PNGs with tanh/sigmoid value-range handling
(generate_samples_pixelcnn_vqvae.py:173).
"""

from __future__ import annotations

import argparse
import os

# persistent XLA compile cache: repeat runs skip the first-compile cost
# (set via jax.config — env vars are too late when a sitecustomize has
# already imported jax). Opt out with JAX_COMPILATION_CACHE_DIR="".
from movae_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
from types import SimpleNamespace

import jax
import numpy as np

from movae_tpu.train import checkpoint as ckpt_lib
from movae_tpu.train import prior as prior_lib
from movae_tpu.train.figures import _to_display, save_sample_grid
from movae_tpu.train.final_metrics import generate_samples
from train_prior_vqvae import load_vqvae


def load_models(model_path: str, prior_path: str, dataset=None,
                data_dir="./data", prior_args=None):
    model, params, batch_stats, vq_args, _, _ = load_vqvae(
        model_path, dataset, data_dir, need_data=False)
    hierarchical = vq_args.arch.lower() in ("vq_vae2", "gg_vq_vae2")
    prior_payload = ckpt_lib.load_checkpoint(prior_path)
    # precedence: VQ-run args < hyperparams echoed in the prior checkpoint
    # < explicitly-passed CLI flags (None = not provided)
    saved = prior_payload.get("prior_args") or {}
    explicit = {k: v for k, v in (prior_args or {}).items() if v is not None}
    merged = SimpleNamespace(**{**vars(vq_args), **saved, **explicit})
    prior_model = prior_lib.build_prior(merged, model.num_embeddings,
                                        hierarchical,
                                        getattr(model, "embedding_dim",
                                                None))
    prior = {"model": prior_model,
             "params": prior_payload["model_state_dict"]["params"],
             "hierarchical": hierarchical,
             "args": merged}  # post-precedence view (incl. echoed prior_args)
    return model, params, batch_stats, vq_args, prior


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", "--vqvae_checkpoint",
                   "--vqvae2_checkpoint", type=str, required=True,
                   dest="model_path")
    p.add_argument("--prior_path", "--prior_checkpoint", type=str,
                   required=True, dest="prior_path")
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--kv_cache_dtype", type=str, default=None,
                   choices=["f32", "bf16", "int8"],
                   help="PixelSNAIL sampler KV-cache dtype (int8 = measured "
                   "fastest, f32 = bitwise naive equality); default None = "
                   "inherit the prior checkpoint's echoed prior_args, "
                   "falling back to int8")
    p.add_argument("--out_dir", "--output_dir", type=str,
                   default="generated_samples",
                   help="output directory (reference spelling: --output_dir)")
    p.add_argument("--grid", "--save_grid", action="store_true", default=True)
    p.add_argument("--individual", action="store_false", dest="grid",
                   help="save per-image PNGs instead of one grid")
    # prior hyperparams: None = take from the prior checkpoint's echoed
    # prior_args (newer checkpoints) or the VQ run args; explicit flags win
    p.add_argument("--prior_type", type=str, default=None)
    p.add_argument("--pixelcnn_hidden_channels", type=int, default=None)
    p.add_argument("--pixelcnn_num_layers", type=int, default=None)
    p.add_argument("--pixelsnail_num_blocks", type=int, default=None)
    p.add_argument("--pixelsnail_num_res_blocks", type=int, default=None)
    p.add_argument("--pixelsnail_num_heads", type=int, default=None)
    p.add_argument("--pixelsnail_dropout", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--grid_nrow", type=int, default=None,
                   help="images per grid row")
    p.add_argument("--device", type=str, default=None, help="(ignored)")
    a = p.parse_args()

    model, params, batch_stats, vq_args, prior = load_models(
        a.model_path, a.prior_path, a.dataset, a.data_dir, vars(a))

    class _State:
        pass

    state = _State()
    state.params = params
    state.batch_stats = batch_stats

    gen_args = SimpleNamespace(**{**vars(vq_args), **vars(a)})
    gen_args.pixelcnn_temperature = a.temperature
    # None = not provided: inherit the post-precedence merge (prior
    # checkpoint's echoed prior_args), falling back to the production int8
    if a.kv_cache_dtype is None:
        gen_args.kv_cache_dtype = getattr(prior["args"], "kv_cache_dtype",
                                          None) or "int8"
    imgs = generate_samples(model, state, gen_args, prior,
                            jax.random.PRNGKey(a.seed), a.num_samples,
                            batch=a.batch_size)
    os.makedirs(a.out_dir, exist_ok=True)
    normalized = getattr(vq_args, "normalize_inputs", False)
    if a.grid:
        png = save_sample_grid(imgs, os.path.join(a.out_dir, "samples.pdf"),
                               normalized, ncols=a.grid_nrow)
        print(f"Saved grid to {png}")
    else:
        from PIL import Image
        for i, img in enumerate(imgs):
            arr = (_to_display(img, normalized) * 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(a.out_dir, f"sample_{i:05d}.png"))
        print(f"Saved {len(imgs)} images to {a.out_dir}")


if __name__ == "__main__":
    main()

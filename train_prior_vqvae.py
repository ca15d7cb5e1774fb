#!/usr/bin/env python3
"""Standalone single-level prior training over a saved VQ-VAE checkpoint.

Rebuild of the reference train_prior_vqvae.py (/root/reference/
train_prior_vqvae.py:1-500): load a VQ-VAE checkpoint from a local path (the
reference can also pull one from a wandb run, train_prior_vqvae.py:118 — here
gated behind --wandb_run and the wandb package), infer K/D from the saved
codebook shape (reference infers from vq_layer.embedding.weight,
train_prior_vqvae.py:158-217), train a PixelCNN/PixelSNAIL prior over
extracted (and cached) codes, and save best/final prior checkpoints.

Usage:
  python train_prior_vqvae.py --model_path <ckpt_dir> --dataset cifar10 \
      --pixelcnn_epochs 50
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

from movae_tpu.data import Loader, get_dataset
from movae_tpu.models import get_network
from movae_tpu.train import checkpoint as ckpt_lib
from movae_tpu.train import prior as prior_lib
from movae_tpu.train.figures import save_sample_grid
from movae_tpu.train.final_metrics import generate_samples
from movae_tpu.utils.logging import ExperimentLogger


def load_vqvae(model_path: str, dataset: str = None, data_dir: str = "./data",
               need_data: bool = True):
    """``need_data=False`` (sample generators) rebuilds the model from the
    checkpoint alone when the dataset files are absent — the reference
    generator also works from checkpoints only
    (generate_samples_pixelcnn_vqvae.py:48-105)."""
    from movae_tpu.data import dataset_input_size

    payload = ckpt_lib.load_checkpoint(model_path)
    saved_args = payload.get("args", {})
    args = SimpleNamespace(**saved_args)
    if dataset:
        args.dataset = dataset
    args.data_dir = data_dir
    normalize = getattr(args, "normalize_inputs", False)
    try:
        train_ds, test_ds, input_size = get_dataset(args.dataset, data_dir,
                                                    normalize)
        args.dataset_size = len(train_ds)
    except FileNotFoundError:
        if need_data:
            raise
        train_ds = test_ds = None
        input_size = dataset_input_size(args.dataset)
        args.dataset_size = getattr(args, "dataset_size", 50000) or 50000
    sd = payload["model_state_dict"]
    params = sd["params"]
    # infer K/D from the saved codebook, as the reference does
    cb = None
    for name in ("vq", "vq_top"):
        if name in params and "embedding" in params[name]:
            cb = np.asarray(params[name]["embedding"])
            break
    if cb is not None:
        args.num_embeddings, args.embedding_dim = cb.shape
    model = get_network(input_size, 3, args)
    return model, params, sd.get("batch_stats", {}), args, train_ds, test_ds


def build_prior_parser(checkpoint_alias: str = "vqvae_checkpoint"
                       ) -> argparse.ArgumentParser:
    """Shared parser for the standalone prior trainers. Accepts both this
    framework's flag spellings and the reference's
    (train_prior_vqvae.py:44-113: --vqvae_checkpoint/--epochs/--lr/
    --hidden_channels/--num_layers/--temperature/--weight_decay/
    --output_dir/--sample_every; --device/--num_workers/
    --prior_lmdb_map_size_gb are accepted no-ops in this in-process,
    device-mesh design)."""
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", f"--{checkpoint_alias}", type=str,
                   default=None, dest="model_path")
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--save_root", "--output_dir", type=str, default=None,
                   dest="save_root",
                   help="defaults to the checkpoint's run directory")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--prior_type", type=str, default="pixelcnn",
                   choices=["pixelcnn", "pixelsnail"])
    p.add_argument("--pixelcnn_epochs", "--epochs", type=int, default=100,
                   dest="pixelcnn_epochs")
    p.add_argument("--pixelcnn_hidden_channels", "--hidden_channels",
                   type=int, default=128, dest="pixelcnn_hidden_channels")
    p.add_argument("--pixelcnn_num_layers", "--num_layers", type=int,
                   default=15, dest="pixelcnn_num_layers")
    p.add_argument("--pixelcnn_lr", "--lr", type=float, default=3e-4,
                   dest="pixelcnn_lr")
    p.add_argument("--pixelcnn_weight_decay", "--weight_decay", type=float,
                   default=0.0, dest="pixelcnn_weight_decay")
    p.add_argument("--pixelcnn_temperature", "--temperature", type=float,
                   default=1.0, dest="pixelcnn_temperature")
    p.add_argument("--kv_cache_dtype", type=str, default="int8",
                   choices=["f32", "bf16", "int8"],
                   help="PixelSNAIL sampler KV-cache dtype (int8 = measured "
                   "fastest, f32 = bitwise naive equality)")
    p.add_argument("--pixelsnail_num_blocks", type=int, default=8)
    p.add_argument("--pixelsnail_num_res_blocks", type=int, default=2)
    p.add_argument("--pixelsnail_num_heads", type=int, default=8)
    p.add_argument("--pixelsnail_dropout", type=float, default=0.1)
    p.add_argument("--attention_dropout", type=str, default="output",
                   choices=["output", "weights"],
                   help="prior attention-dropout semantics: output = flash "
                        "path, 1.73x faster, quality-equivalent (BENCH.md "
                        "A/B); weights = reference-exact "
                        "(pixelcnn_prior.py:126-127)")
    p.add_argument("--context_parallel", type=int, default=1,
                   help="ring-attention sequence partitions over the mesh "
                        "'seq' axis (long-L prior attention)")
    p.add_argument("--pipeline_parallel", type=int, default=1,
                   help="pipeline-parallel stages over the mesh 'pipe' axis "
                        "(GPipe microbatching, per-stage block/optimizer "
                        "sharding)")
    p.add_argument("--pipeline_microbatches", type=int, default=0,
                   help="GPipe microbatches per step (0 = auto)")
    p.add_argument("--fsdp", action="store_true",
                   help="shard prior params + optimizer state over the "
                        "'data' axis (ZeRO-3 placement)")
    p.add_argument("--prior_resume", type=str, default=None,
                   help="resume prior training from a last_prior checkpoint "
                        "(written every epoch and on SIGTERM preemption)")
    p.add_argument("--prior_sample_every", "--sample_every", type=int,
                   default=0, dest="prior_sample_every",
                   help="write a prior sample grid every N epochs")
    p.add_argument("--prior_use_lmdb_codes", action="store_true", default=True)
    p.add_argument("--no_prior_lmdb_codes", action="store_false",
                   dest="prior_use_lmdb_codes")
    p.add_argument("--prior_force_extract_codes", action="store_true")
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--max_gen_metrics_samples", type=int, default=0,
                   help="if >0, compute gFID/IS/KID over this many samples "
                        "after training")
    p.add_argument("--use_wandb", action="store_true")
    # reference-compat no-ops (single-process device-mesh design)
    p.add_argument("--device", type=str, default=None, help="(ignored)")
    p.add_argument("--num_workers", type=int, default=None, help="(ignored)")
    p.add_argument("--prior_lmdb_map_size_gb", type=float, default=None,
                   help="(ignored; the code cache is a memory-mapped npy)")
    # wandb-run checkpoint download (reference train_prior_vqvae.py:118-156)
    p.add_argument("--wandb_id", type=str, default=None)
    p.add_argument("--wandb_project", type=str, default="mo-vae")
    p.add_argument("--wandb_entity", type=str, default=None)
    return p


def explicit_cli_args(parser: argparse.ArgumentParser, argv=None) -> dict:
    """Dests the user actually typed on the command line. Re-parses with all
    defaults suppressed, so untouched flags are absent from the namespace."""
    import copy

    clone = copy.deepcopy(parser)
    for action in clone._actions:
        action.default = argparse.SUPPRESS
    ns, _unknown = clone.parse_known_args(argv)
    return vars(ns)


def merge_cli_over_saved(vq_args, a, explicit: dict = None) -> SimpleNamespace:
    """Precedence: explicitly-typed CLI flags > checkpoint-saved args > CLI
    defaults. Argparse defaults must NOT clobber saved values: losing the
    saved dataset name would mis-key the VQ code cache and force a full
    re-extraction sweep, and losing saved prior hyperparameters
    (prior_type/hidden_channels/...) would silently train a different prior
    architecture than the original run's."""
    if explicit is None:  # best-effort fallback: treat non-None as explicit
        explicit = {k: v for k, v in vars(a).items() if v is not None}
    defaults = {k: v for k, v in vars(a).items() if v is not None}
    merged = SimpleNamespace(**{**defaults, **vars(vq_args), **explicit})
    merged.arch = vq_args.arch
    return merged


def prior_log_dir(save_root: str, a) -> str:
    """The prior stage's log directory (<save_root>/<type>_prior, next to
    its checkpoints)."""
    name = ("pixelsnail_prior"
            if "pixelsnail" in (getattr(a, "prior_type", "") or "").lower()
            else "pixelcnn_prior")
    return os.path.join(save_root, name)


def resolve_checkpoint(a) -> str:
    """model_path directly, or download from a wandb run (--wandb_id)."""
    if a.model_path:
        return a.model_path
    if a.wandb_id:
        import wandb  # raises if unavailable — requires network + package

        api = wandb.Api()
        path = (f"{a.wandb_entity}/{a.wandb_project}/{a.wandb_id}"
                if a.wandb_entity else f"{a.wandb_project}/{a.wandb_id}")
        run = api.run(path)
        dl = os.path.join("wandb_downloads", a.wandb_id)
        os.makedirs(dl, exist_ok=True)
        for f in run.files():
            if "final_checkpoint" in f.name:
                f.download(root=dl, exist_ok=True)
        return os.path.join(dl, "checkpoints", "final_checkpoint")
    raise SystemExit("provide --model_path/--vqvae_checkpoint or --wandb_id")


def main():
    parser = build_prior_parser("vqvae_checkpoint")
    a = parser.parse_args()

    ckpt_path = resolve_checkpoint(a)
    model, params, batch_stats, vq_args, train_ds, test_ds = load_vqvae(
        ckpt_path, a.dataset, a.data_dir)
    save_root = a.save_root or os.path.dirname(
        os.path.dirname(os.path.abspath(ckpt_path)))

    class _State:
        pass

    state = _State()
    state.params = params
    state.batch_stats = batch_stats

    merged = merge_cli_over_saved(vq_args, a, explicit_cli_args(parser))
    results = {
        "model": model, "state": state, "save_root": save_root,
        # process-sharded like run_training: each host extracts its 1/pc
        # code shard (train_prior treats batch_size as the global batch)
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

    # sample grid through the trained prior
    rng = jax.random.PRNGKey(merged.seed + 7)
    imgs = generate_samples(model, state, merged, prior, rng,
                            merged.num_samples)
    png = save_sample_grid(imgs, os.path.join(
        save_root, "figures", "generated", "prior_samples.pdf"),
        getattr(vq_args, "normalize_inputs", False))
    print(f"Saved prior samples to {png}")

    if getattr(merged, "max_gen_metrics_samples", 0):
        # post-training generative metrics refresh (the reference updates
        # the original wandb run's final/* values, train_prior_vqvae.py
        # "After training..."); here they go to the run's logger/summary
        run_post_prior_metrics(model, state, test_ds, merged, prior, rng,
                               merged, results["logger"])
    results["logger"].finish()


def run_post_prior_metrics(model, state, test_ds, merged, prior, rng, a,
                           logger):
    from movae_tpu.train.final_metrics import evaluate_generative_metrics

    # the CLI's count wins over whatever the checkpoint args echoed
    merged.max_gen_metrics_samples = a.max_gen_metrics_samples
    test_loader = Loader(test_ds, a.batch_size, shuffle=False)
    rng, sub = jax.random.split(rng)
    finals = evaluate_generative_metrics(
        model, state, test_loader, merged, prior, sub,
        max_samples=a.max_gen_metrics_samples)
    for k, v in finals.items():
        logger.set_summary(f"final/{k}", v)
        print(f"final/{k}: {v}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Standalone checkpoint evaluation CLI.

Rebuild of the reference evaluate.py (/root/reference/evaluate.py:1-383):
load a checkpoint (model rebuilt from the saved ``args`` dict,
evaluate.py:20-79), run test losses, reconstruction metrics
(rFID/PSNR/SSIM/LPIPS), hypervolume (fixed 1.1 reference point,
evaluate.py:82-106), generative metrics with naive sampling when no prior is
given (evaluate.py:318), and print a tabulated report (evaluate.py:132-207).

Usage: python evaluate.py --model_path <ckpt_dir> [--dataset ... --arch ...]
"""

from __future__ import annotations

import argparse
import json
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
from movae_tpu.metrics.hv import build_hv_indicator
from movae_tpu.models import get_network
from movae_tpu.parallel.mesh import DataParallel
from movae_tpu.train import checkpoint as ckpt_lib
from movae_tpu.train.final_metrics import (
    evaluate_generative_metrics,
    evaluate_recon_metrics,
)
from movae_tpu.train.loop import evaluate as evaluate_losses
from movae_tpu.train.step import make_eval_step

try:
    from tabulate import tabulate
except Exception:  # pragma: no cover
    tabulate = None


def load_model_from_checkpoint(model_path: str, dataset: str = None,
                               data_dir: str = "./data", arch: str = None):
    """Rebuild model + state from a saved checkpoint directory
    (reference evaluate.py:20-79). ``arch`` is used when the checkpoint args
    lack one, and a mismatch against the saved arch is warned about with the
    checkpoint winning (reference evaluate.py:48-59)."""
    payload = ckpt_lib.load_checkpoint(model_path)
    saved_args = payload.get("args", {})
    args = SimpleNamespace(**saved_args)
    if arch is not None:
        saved_arch = getattr(args, "arch", None)
        if saved_arch is not None and saved_arch.lower() != arch.lower():
            print(f"Warning: checkpoint arch ({saved_arch}) does not match "
                  f"provided arch ({arch}); using the checkpoint arch.")
        else:
            args.arch = arch
    if dataset is not None:
        args.dataset = dataset
    args.data_dir = data_dir
    normalize = getattr(args, "normalize_inputs", False)
    train_ds, test_ds, input_size = get_dataset(args.dataset, data_dir,
                                                normalize)
    args.dataset_size = len(train_ds)
    model = get_network(input_size, 3, args)
    state_dict = payload["model_state_dict"]
    params = state_dict["params"]
    batch_stats = state_dict.get("batch_stats", {})
    return model, params, batch_stats, args, train_ds, test_ds, normalize


def print_results_table(results: dict):
    rows = [(k, f"{v:.6g}" if isinstance(v, float) else v)
            for k, v in results.items()]
    if tabulate is not None:
        print(tabulate(rows, headers=["metric", "value"], tablefmt="github"))
    else:  # pragma: no cover
        for k, v in rows:
            print(f"{k:40s} {v}")


# prior auto-load lives in the package (shared with the serving exporter);
# the name is kept for callers of evaluate._find_prior
from movae_tpu.train.prior import find_prior as _find_prior


def evaluate(arch: str = None, dataset: str = None, model_path: str = None,
             data_dir: str = "./data", batch_size: int = 128,
             max_fid_samples: int = 10000, skip_generative: bool = False,
             max_gen_metrics_samples: int = 10000, seed: int = 0):
    model, params, batch_stats, args, train_ds, test_ds, normalize = (
        load_model_from_checkpoint(model_path, dataset, data_dir, arch=arch))
    parallel = DataParallel()
    bs = parallel.pad_to_devices(batch_size)
    test_loader = Loader(test_ds, bs, shuffle=False)

    class _State:
        pass

    state = _State()
    state.params = params
    state.batch_stats = batch_stats

    rng = jax.random.PRNGKey(seed)
    eval_fn = jax.jit(make_eval_step(model))
    loss_meters, rng = evaluate_losses(eval_fn, state, test_loader, parallel,
                                       rng, model.objective_names)
    results = {f"eval/{k}": v.avg for k, v in loss_meters.items()}

    hv = build_hv_indicator(model.objective_names, None)  # fixed 1.1 ref
    if hv is not None:
        pt = np.array([[loss_meters[k].avg for k in model.objective_names]])
        results["eval/hv"] = float(hv(pt))

    results.update({f"recon/{k}": v for k, v in evaluate_recon_metrics(
        model, state, test_loader, rng, max_samples=max_fid_samples).items()})

    if not skip_generative:
        args.batch_size = batch_size
        args.max_gen_metrics_samples = max_gen_metrics_samples
        prior = _find_prior(model_path, model, args)
        rng, sub = jax.random.split(rng)
        results.update({f"gen/{k}": v for k, v in
                        evaluate_generative_metrics(
                            model, state, test_loader, args, prior, sub,
                            max_samples=max_gen_metrics_samples).items()})

    print_results_table(results)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, required=True,
                   help="checkpoint directory (e.g. .../final_checkpoint)")
    p.add_argument("--arch", type=str, default=None)
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--max_fid_samples", type=int, default=10000)
    p.add_argument("--max_gen_metrics_samples", type=int, default=10000)
    p.add_argument("--skip_generative", action="store_true")
    p.add_argument("--out_json", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    # reference-compat no-ops (single-process device-mesh design)
    p.add_argument("--device", type=str, default=None, help="(ignored)")
    p.add_argument("--num_workers", type=int, default=None, help="(ignored)")
    a = p.parse_args()
    results = evaluate(a.arch, a.dataset, a.model_path, a.data_dir,
                       a.batch_size, a.max_fid_samples, a.skip_generative,
                       max_gen_metrics_samples=a.max_gen_metrics_samples,
                       seed=a.seed)
    if a.out_json:
        with open(a.out_json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

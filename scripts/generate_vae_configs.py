"""Generate the full experiment config matrix.

Rebuild of the reference generator
(/root/reference/scripts/generate_vae_configs.py:1-190), widened to the
whole experiment matrix the reference ships under ``configs/``: emits the
``configs/<dataset>/<arch>/<agg>/<objective>/config_<seed>.yaml`` tree plus
``mse_configs.txt`` / ``bce_configs.txt`` run lists consumable by
``runner.py --file-list``.

The matrix itself (which dataset/arch/aggregator/objective/seed cells
exist, and each cell's hyperparameters) is data, not code: the reference
tree accreted over several generator eras with per-cell quirks
(``vae_2.5e-4`` kld-ablation cells, ``upgrad_pref`` with pref_weights,
mgda solver tolerances on some cells, two different gg_vq_vae2 loss-weight
mixes).  It lives in the checked-in ``scripts/config_matrix.json``
(derived once by ``scripts/extract_config_matrix.py``); this script
renders it.  ``find configs | sort`` matches the reference tree exactly.

Default (no flags) reproduces the reference generator's own scope —
cifar100 vae + gg_vae(+v2..v6).  ``--full`` emits every cell.
"""

import argparse
import json
from pathlib import Path

PROJECT_ROOT = Path(__file__).resolve().parent.parent
CONFIGS_ROOT = PROJECT_ROOT / "configs"
MATRIX_PATH = Path(__file__).resolve().parent / "config_matrix.json"

# Reference-era key order for rendering (keys absent from a cell are
# skipped; cell keys not listed are appended in manifest order).
KEY_ORDER = [
    "dataset", "data_dir", "normalize_inputs", "arch", "latent_dim",
    "embedding_dim", "num_embeddings", "hidden_dims", "loss_weights",
    "pref_weights", "recons_objective", "recons_activation", "hv_ref",
    "epochs", "batch_size", "optimizer", "lr", "scheduler",
    "scheduler_lr_min", "wd", "aggregator", "mgda_epsilon",
    "mgda_max_iters", "seed", "save_path", "save_freq", "eval_freq",
    "num_vis_samples", "use_wandb", "wandb_project", "wandb_name",
    "wandb_group",
]


def render(params):
    """Flat dict (raw-string scalars, list/dict containers) -> YAML."""
    order = [k for k in KEY_ORDER if k in params]
    order += [k for k in params if k not in order]
    lines = []
    for k in order:
        v = params[k]
        if isinstance(v, list):
            lines.append(f"{k}:")
            lines.extend(f"- {item}" for item in v)
        elif isinstance(v, dict):
            lines.append(f"{k}:")
            lines.extend(f"  {sk}: {sv}" for sk, sv in v.items())
        else:
            lines.append(f"{k}: {v}")
    return "\n".join(lines) + "\n"


def emit(dataset, arch, entry):
    base_dir = CONFIGS_ROOT / dataset / arch
    per_obj_paths = {"mse": [], "bce": []}
    per_agg_paths = {}  # (agg, obj) -> [relpaths]
    n = 0
    for cell in entry["cells"]:
        agg, obj = cell["agg"], cell["objective"]
        params = dict(entry["base"])
        params.update(cell.get("delta", {}))
        for k in cell.get("drop", []):
            params.pop(k, None)
        params["wandb_group"] = cell["group"]
        for idx, seed_info in sorted(cell["seeds"].items(),
                                     key=lambda kv: int(kv[0])):
            p = dict(params)
            p["seed"] = seed_info["seed"]
            p["wandb_name"] = seed_info["name"]
            cfg = base_dir / agg / obj / f"config_{idx}.yaml"
            cfg.parent.mkdir(parents=True, exist_ok=True)
            cfg.write_text(render(p))
            rel = str(cfg.relative_to(PROJECT_ROOT)).replace("\\", "/")
            per_obj_paths[obj].append(rel)
            per_agg_paths.setdefault((agg, obj), []).append(rel)
            n += 1
    for obj, paths in per_obj_paths.items():
        if paths:
            (base_dir / f"{obj}_configs.txt").write_text(
                "\n".join(paths) + "\n")
    for agg in entry.get("agg_txt", []):
        for obj in ("mse", "bce"):
            paths = per_agg_paths.get((agg, obj), [])
            if paths:
                (base_dir / agg / f"{obj}_configs.txt").write_text(
                    "\n".join(paths) + "\n")
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true",
                   help="emit every dataset/arch cell (default: the "
                        "reference generator's cifar100 vae/gg_vae scope)")
    p.add_argument("--datasets", nargs="*", default=None,
                   help="restrict to these datasets (their full arch lists)")
    args = p.parse_args()

    matrix = json.loads(MATRIX_PATH.read_text())
    if args.datasets:
        cells = [(d, a) for d in args.datasets for a in matrix[d]]
    elif args.full:
        cells = [(d, a) for d, arches in matrix.items() for a in arches]
    else:
        scope = ["vae", "gg_vae"] + [f"gg_vae_v{i}" for i in range(2, 7)]
        cells = [("cifar100", a) for a in scope if a in matrix["cifar100"]]

    total = 0
    for dataset, arch in cells:
        total += emit(dataset, arch, matrix[dataset][arch])
    print(f"Generated {total} configs in {len(cells)} dataset/arch cells "
          f"under {CONFIGS_ROOT}")


if __name__ == "__main__":
    main()

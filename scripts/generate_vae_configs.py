"""Generate the full experiment config matrix.

Rebuild of the reference generator
(/root/reference/scripts/generate_vae_configs.py:1-190), widened to the
whole experiment matrix the reference ships under ``configs/`` (5 datasets,
VAE + GG-VAE + VQ families, ~1.5k YAMLs): emits the
``configs/<dataset>/<arch>/<agg>/<objective>/config_<seed>.yaml`` tree plus
``mse_configs.txt`` / ``bce_configs.txt`` run lists consumable by
``runner.py --file-list``.

Default (no flags) reproduces the reference generator's own scope —
cifar100 vae + gg_vae(+v2..v6). ``--full`` emits every dataset/arch cell of
the matrix (dataset profiles: epochs/batch/lr/latent/figure cadence and the
kld weight = batch/dataset_size per reference models/__init__.py:50-55).
"""

import argparse
from pathlib import Path

PROJECT_ROOT = Path(__file__).resolve().parent.parent
CONFIGS_ROOT = PROJECT_ROOT / "configs"

OBJECTIVES = [
    # (folder, recons_objective, recons_activation, normalize_inputs)
    ("mse", "mse", "none", True),
    ("bce", "bce", "sigmoid", False),
]

SEEDS3 = [(1, 42), (2, 123123), (3, 12341234)]
SEEDS1 = [(1, 42)]

# aggregator folder name -> --aggregator value
AGG_FULL8 = [  # cifar100-style: 8 aggregators incl. plain MGDA
    ("sum", "sum"), ("mgda", "mgda"), ("mgda_ln", "mgda_ln"),
    ("mgda_gn", "mgda_gn"), ("mgda_lgn", "mgda_lgn"), ("upgrad", "upgrad"),
    ("amtl_median", "aligned_mtl_median"), ("amtl_min", "aligned_mtl"),
]
AGG_NO_MGDA7 = [  # large-image datasets drop plain (unnormalized) MGDA
    ("sum", "sum"), ("mgda_ln", "mgda_ln"), ("mgda_gn", "mgda_gn"),
    ("mgda_lgn", "mgda_lgn"), ("upgrad", "upgrad"),
    ("aligned_mtl_median", "aligned_mtl_median"),
    ("aligned_mtl", "aligned_mtl"),
]

# per-dataset training profile:
# (aggs, seeds, epochs, batch, lr_vae, lr_vq, latent_dim, VAE hidden_dims,
#  save/eval freq, num_vis, kld_weight = batch_size / train-set size).
# hidden_dims follow the reference tree per dataset: cifar100 VAE is
# [32,64,128] and celeba-hq [32,64,128,256,512,1024]
# (/root/reference/configs/<ds>/vae/*/mse/config_1.yaml).
DIMS5 = [32, 64, 128, 256, 512]
DATASETS = {
    "cifar100": dict(aggs=AGG_FULL8, seeds=SEEDS3, epochs=200, batch=256,
                     lr_vae="1e-4", lr_vq="1e-3", latent=128,
                     vae_dims=[32, 64, 128], freq=20, vis=9, kld=0.00512),
    "celeba-hq": dict(aggs=AGG_FULL8, seeds=SEEDS1, epochs=400, batch=128,
                      lr_vae="1e-4", lr_vq="1e-4", latent=512,
                      vae_dims=DIMS5 + [1024], freq=50, vis=4, kld=0.004),
    "imagenet": dict(aggs=AGG_FULL8, seeds=SEEDS1, epochs=20, batch=128,
                     lr_vae="1e-4", lr_vq="1e-4", latent=4096,
                     vae_dims=DIMS5, freq=10, vis=4, kld=0.0001),
    "animal-face": dict(aggs=AGG_NO_MGDA7, seeds=SEEDS3, epochs=1000,
                        batch=128, lr_vae="1e-4", lr_vq="1e-4", latent=4096,
                        vae_dims=DIMS5, freq=100, vis=4, kld=0.01587),
    "oxford-flower-102": dict(aggs=AGG_NO_MGDA7, seeds=SEEDS3, epochs=1000,
                              batch=128, lr_vae="1e-4", lr_vq="1e-4",
                              latent=4096, vae_dims=DIMS5, freq=100, vis=4,
                              kld=0.1255),
}

# arch -> (family, extra objective keys beyond the family's base set)
GG_EXTRA = ["gradient_guided_loss", "edge_matching_loss"]
ARCH_FAMILIES = {
    "vae": ("vae", []),
    "gg_vae": ("vae", GG_EXTRA),
    **{f"gg_vae_v{i}": ("vae", GG_EXTRA) for i in range(2, 7)},
    "vq_vae": ("vq", []),
    "gg_vq_vae": ("vq", GG_EXTRA),
    **{f"gg_vq_vae_v{i}": ("vq", GG_EXTRA) for i in range(1, 9)},
    "vq_vae2": ("vq2", []),
    "gg_vq_vae2": ("vq2", ["gradient_guided_loss", "edge_matching_loss"]),
}

# which arches each dataset's matrix covers (mirrors the reference tree)
DATASET_ARCHES = {
    "cifar100": (["vae", "gg_vae"] + [f"gg_vae_v{i}" for i in range(2, 7)]
                 + ["vq_vae", "gg_vq_vae_v1"]
                 + [f"gg_vq_vae_v{i}" for i in range(3, 9)]),
    "celeba-hq": ["vae", "gg_vae", "vq_vae", "vq_vae2", "gg_vq_vae_v3",
                  "gg_vq_vae2"],
    "imagenet": ["vae", "gg_vae", "vq_vae", "gg_vq_vae_v3", "gg_vq_vae2"],
    "animal-face": ["vae", "gg_vae", "vq_vae", "gg_vq_vae", "vq_vae2",
                    "gg_vq_vae2"],
    "oxford-flower-102": ["vae", "gg_vae", "vq_vae", "gg_vq_vae", "vq_vae2",
                          "gg_vq_vae2"],
}

VQ_BASE_WEIGHTS = [("reconstruction_loss", 1.0), ("embedding_loss", 1.0),
                   ("commitment_loss", 0.25)]


def _yaml_weights(pairs):
    return "".join(f"\n  {k}: {v}" for k, v in pairs)


def render(dataset, arch, agg_val, agg_folder, obj, act, norm, seed_val):
    prof = DATASETS[dataset]
    family, extra = ARCH_FAMILIES[arch]
    if family == "vae":
        weights = [("reconstruction_loss", 1.0), ("kld_loss", prof["kld"])]
        dims = "".join(f"\n- {d}" for d in prof["vae_dims"])
        model_lines = f"latent_dim: {prof['latent']}\nhidden_dims:{dims}"
        lr = prof["lr_vae"]
        tag = f"{prof['latent']}d"
    else:  # vq / vq2
        weights = list(VQ_BASE_WEIGHTS)
        model_lines = ("embedding_dim: 64\nnum_embeddings: 512\n"
                       "hidden_dims:\n- 128\n- 256")
        lr = prof["lr_vq"]
        tag = "512k-64d"
    weights += [(k, 1.0) for k in extra]
    hv = [(k, 1.1) for k, _ in weights]
    group = f"{dataset.replace('-', '_')}-{arch}-{tag}-{obj}-{agg_folder}"
    return f"""dataset: {dataset}
data_dir: ../data
normalize_inputs: {str(norm).lower()}
arch: {arch}
{model_lines}
loss_weights:{_yaml_weights(weights)}
recons_objective: {obj}
recons_activation: {act}
hv_ref:{_yaml_weights(hv)}
epochs: {prof['epochs']}
batch_size: {prof['batch']}
optimizer: adam
lr: {lr}
scheduler: cosine
scheduler_lr_min: 1e-6
wd: 0.0
aggregator: {agg_val}
seed: {seed_val}
save_path: logs/
save_freq: {prof['freq']}
eval_freq: {prof['freq']}
num_vis_samples: {prof['vis']}
use_wandb: true
wandb_project: mo-vae
wandb_name: {group}-seed{seed_val}
wandb_group: {group}
"""


def emit(dataset, arch):
    prof = DATASETS[dataset]
    base = CONFIGS_ROOT / dataset
    mse_paths, bce_paths = [], []
    for agg_folder, agg_val in prof["aggs"]:
        for obj_folder, obj, act, norm in OBJECTIVES:
            for seed_idx, seed_val in prof["seeds"]:
                cfg = (base / arch / agg_folder / obj_folder /
                       f"config_{seed_idx}.yaml")
                cfg.parent.mkdir(parents=True, exist_ok=True)
                cfg.write_text(render(dataset, arch, agg_val, agg_folder,
                                      obj, act, norm, seed_val))
                rel = str(cfg.relative_to(PROJECT_ROOT)).replace("\\", "/")
                (mse_paths if obj_folder == "mse" else bce_paths).append(rel)
    (base / arch / "mse_configs.txt").write_text("\n".join(mse_paths) + "\n")
    (base / arch / "bce_configs.txt").write_text("\n".join(bce_paths) + "\n")
    return len(mse_paths) + len(bce_paths)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true",
                   help="emit every dataset/arch cell (default: the "
                        "reference generator's cifar100 vae/gg_vae scope)")
    p.add_argument("--datasets", nargs="*", default=None,
                   help="restrict to these datasets (implies their full "
                        "arch lists)")
    args = p.parse_args()

    if args.datasets:
        cells = [(d, a) for d in args.datasets for a in DATASET_ARCHES[d]]
    elif args.full:
        cells = [(d, a) for d, arches in DATASET_ARCHES.items()
                 for a in arches]
    else:
        cells = [("cifar100", a) for a in
                 ["vae", "gg_vae"] + [f"gg_vae_v{i}" for i in range(2, 7)]]

    total = 0
    for dataset, arch in cells:
        total += emit(dataset, arch)
    print(f"Generated {total} configs in {len(cells)} dataset/arch cells "
          f"under {CONFIGS_ROOT}")


if __name__ == "__main__":
    main()

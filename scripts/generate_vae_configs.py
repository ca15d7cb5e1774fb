"""Generate the VAE / GG-VAE experiment config matrix.

Rebuild of the reference generator
(/root/reference/scripts/generate_vae_configs.py:1-190): emits the
``configs/cifar100/<arch>/<agg>/<objective>/config_<seed>.yaml`` tree for
8 aggregators x {mse, bce} x 3 seeds per arch, plus ``mse_configs.txt`` /
``bce_configs.txt`` run lists consumable by ``runner.py --file-list``.
"""

from pathlib import Path

PROJECT_ROOT = Path(__file__).resolve().parent.parent
CONFIGS_DIR = PROJECT_ROOT / "configs" / "cifar100"
KLD_WEIGHT = 0.00512

AGGREGATORS = [
    ("sum", "sum"),
    ("mgda", "mgda"),
    ("mgda_ln", "mgda_ln"),
    ("mgda_gn", "mgda_gn"),
    ("mgda_lgn", "mgda_lgn"),
    ("upgrad", "upgrad"),
    ("amtl_median", "aligned_mtl_median"),
    ("amtl_min", "aligned_mtl"),
]

OBJECTIVES = [
    ("mse", "mse", "none", True),
    ("bce", "bce", "sigmoid", False),
]

SEEDS = [(1, 42), (2, 123123), (3, 12341234)]


def _common(arch, agg_val, agg_folder, recons_obj, recons_act, norm, seed_val,
            extra_weights="", extra_hv=""):
    name_part = f"cifar100-{arch}-128d-{recons_obj}-{agg_folder}-seed{seed_val}"
    return f"""dataset: cifar100
data_dir: ../data
normalize_inputs: {str(norm).lower()}
arch: {arch}
latent_dim: 128
hidden_dims:
- 32
- 64
- 128
- 256
- 512
loss_weights:
  reconstruction_loss: 1.0
  kld_loss: {KLD_WEIGHT}{extra_weights}
recons_objective: {recons_obj}
recons_activation: {recons_act}
hv_ref:
  reconstruction_loss: 1.1
  kld_loss: 1.1{extra_hv}
epochs: 200
batch_size: 256
optimizer: adam
lr: 1e-4
scheduler: cosine
scheduler_lr_min: 1e-6
wd: 0.0
aggregator: {agg_val}
seed: {seed_val}
save_path: logs/
save_freq: 20
eval_freq: 20
num_vis_samples: 9
use_wandb: true
wandb_project: mo-vae
wandb_name: {name_part}
wandb_group: cifar100-{arch}-128d-{recons_obj}-{agg_folder}
"""


def vae_config(arch, *a):
    return _common(arch, *a)


def gg_vae_config(arch, *a):
    extra_w = "\n  gradient_guided_loss: 1.0\n  edge_matching_loss: 1.0"
    extra_hv = "\n  gradient_guided_loss: 1.1\n  edge_matching_loss: 1.1"
    return _common(arch, *a, extra_weights=extra_w, extra_hv=extra_hv)


def emit(arch, template):
    mse_paths, bce_paths = [], []
    for agg_folder, agg_val in AGGREGATORS:
        for obj_folder, recons_obj, recons_act, norm in OBJECTIVES:
            for seed_idx, seed_val in SEEDS:
                cfg = CONFIGS_DIR / arch / agg_folder / obj_folder / \
                    f"config_{seed_idx}.yaml"
                cfg.parent.mkdir(parents=True, exist_ok=True)
                cfg.write_text(template(arch, agg_val, agg_folder, recons_obj,
                                        recons_act, norm, seed_val))
                rel = str(cfg.relative_to(PROJECT_ROOT)).replace("\\", "/")
                (mse_paths if obj_folder == "mse" else bce_paths).append(rel)
    (CONFIGS_DIR / arch / "mse_configs.txt").write_text(
        "\n".join(mse_paths) + "\n")
    (CONFIGS_DIR / arch / "bce_configs.txt").write_text(
        "\n".join(bce_paths) + "\n")
    for sub in ["amtl_median", "amtl_min"]:
        for obj_folder, *_ in OBJECTIVES:
            paths = [str((CONFIGS_DIR / arch / sub / obj_folder /
                          f"config_{i}.yaml").relative_to(PROJECT_ROOT)
                         ).replace("\\", "/") for i, _ in SEEDS]
            (CONFIGS_DIR / arch / sub / f"{obj_folder}_configs.txt"
             ).write_text("\n".join(paths) + "\n")


def main():
    for arch in ["vae"]:
        emit(arch, vae_config)
    for arch in ["gg_vae"] + [f"gg_vae_v{i}" for i in range(2, 7)]:
        emit(arch, gg_vae_config)
    print("Generated configs for: vae, gg_vae, gg_vae_v2..v6")


if __name__ == "__main__":
    main()

"""Model registry: arch name -> Flax module, with the reference's default
lambda-weight policy (/root/reference/models/__init__.py:18-211), including
the kld-weight override to batch_size/dataset_size for VAE-family models
(models/__init__.py:50-55, 192-197).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from movae_tpu.models.base import MOVAEModel, resolve_lambda_weights
from movae_tpu.models.vae import VAE

__all__ = ["VAE", "get_network", "init_model", "MOVAEModel"]


def resolve_compute_dtype(dt):
    """'float32'/'bfloat16' (or an already-resolved jnp dtype) -> jnp dtype.
    The single resolver for ``--compute_dtype`` (used by get_network and the
    prior stage's build_prior)."""
    if isinstance(dt, str):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dt]
    return dt


def _get(args, name, default=None):
    if args is None:
        return default
    if isinstance(args, Mapping):
        return args.get(name, default)
    return getattr(args, name, default)


def _weights(lambda_weights, names, defaults, kld_key=None, kld_value=None,
             kld_force=True, kld_list_override=None):
    """Normalize user weights; force the KL-type weight to batch/dataset size
    as the reference registry does (models/__init__.py:50-55). With
    ``kld_force=False`` the KL weight is only defaulted, never overridden —
    the reference's setdefault semantics for recursive_cyclic_vae
    (models/__init__.py:77). ``kld_list_override`` controls the positional
    list form separately: the reference overrides the KL slot of a list for
    vae/betatc but passes gg_vae/recursive_kl lists through untouched."""
    if kld_list_override is None:
        kld_list_override = kld_force
    if isinstance(lambda_weights, Mapping):
        lw = dict(lambda_weights)
        if kld_key is not None:
            if kld_force:
                lw[kld_key] = kld_value
            else:
                lw.setdefault(kld_key, kld_value)
        return resolve_lambda_weights(names, lw, defaults)
    if lambda_weights is None:
        d = dict(defaults)
        if kld_key is not None:
            d[kld_key] = kld_value
        return resolve_lambda_weights(names, None, d)
    # list form: positional per objective, validated strictly (the reference
    # models raise on a length mismatch, e.g. vq_vae.py:195-196)
    lw = list(lambda_weights)
    if len(lw) != len(names):
        raise ValueError(
            f"requires {len(names)} lambda_weights {tuple(names)}, "
            f"got {len(lw)}")
    items = dict(zip(names, lw))
    if kld_key is not None and kld_list_override:
        items[kld_key] = kld_value
    return resolve_lambda_weights(names, items, defaults)


def get_network(input_size: int, num_channels: int = 3, args: Any = None
                ) -> MOVAEModel:
    """Build a model module from an args namespace/dict (reference
    models/__init__.py:18-211). The returned module is unbound; initialize
    with :func:`init_model`."""
    arch = (_get(args, "arch", "vae") or "vae").lower()
    latent_dim = _get(args, "latent_dim", 128)
    embedding_dim = _get(args, "embedding_dim", 64) or 64
    num_embeddings = _get(args, "num_embeddings", 512) or 512
    hidden_dims = tuple(_get(args, "hidden_dims", (32, 64, 128, 256, 512)))
    num_residual_layers = _get(args, "num_residual_layers", 2)
    layer_norm = _get(args, "layer_norm", "batch")
    recons_objective = (_get(args, "recons_objective", None)
                        or _get(args, "recons_obj", None))
    if recons_objective is None:
        # Back-compat: old configs/checkpoints carry recons_dist (+ the
        # unused-there recons_reduction) instead of recons_objective
        # (reference models/__init__.py:25-38: bernoulli->bce,
        # gaussian->mse, laplacian->l1, unknown->mse).
        recons_objective = {"bernoulli": "bce", "gaussian": "mse",
                            "laplacian": "l1"}.get(
            _get(args, "recons_dist", "gaussian"), "mse")
    recons_objective = recons_objective.lower()
    recons_activation = _get(args, "recons_activation", None)
    lambda_weights = (_get(args, "loss_weights", None)
                      or _get(args, "lambda_weights", None))
    anneal_steps = _get(args, "anneal_steps", 200) or 200
    dataset_size = _get(args, "dataset_size", 50000)
    batch_size = _get(args, "batch_size", 128)
    kld_w = batch_size / dataset_size
    dtype = resolve_compute_dtype(_get(args, "compute_dtype", jnp.float32))
    vq_ema = bool(_get(args, "vq_ema", False))
    vq_ema_decay = float(_get(args, "vq_ema_decay", 0.99))
    # EMA maintains the codebooks; the gradient-free embedding loss leaves
    # the objective vector for all VQ archs
    emb = () if vq_ema else ("embedding_loss",)

    if recons_activation is None:
        recons_activation = "sigmoid" if recons_objective == "bce" else "tanh"

    def perceptual():
        from movae_tpu.metrics.vgg import make_perceptual_fn
        return make_perceptual_fn()

    perceptual_fn = perceptual() if recons_objective == "perceptual" else None
    use_perceptual = _get(args, "use_perceptual", True)

    if arch == "vae":
        names = ("reconstruction_loss", "kld_loss")
        lw = _weights(lambda_weights, names,
                      {"reconstruction_loss": 1.0, "kld_loss": kld_w},
                      "kld_loss", kld_w)
        return VAE(latent_dim=latent_dim, hidden_dims=hidden_dims,
                   input_size=input_size, in_channels=num_channels,
                   layer_norm=layer_norm, recons_objective=recons_objective,
                   recons_activation=recons_activation, lambda_weights=lw,
                   perceptual_fn=perceptual_fn, dtype=dtype)

    if arch in ("recursive_kl_vae",):
        from movae_tpu.models.recursive_kl_vae import RecursiveKLVAE
        names = ("reconstruction_loss", "recursive_kld_loss")
        # reference overrides the KL weight only for dict input here; a
        # positional list passes through (models/__init__.py:58-65)
        lw = _weights(lambda_weights, names,
                      {"reconstruction_loss": 1.0, "recursive_kld_loss": kld_w},
                      "recursive_kld_loss", kld_w, kld_list_override=False)
        return RecursiveKLVAE(
            latent_dim=latent_dim, hidden_dims=hidden_dims,
            input_size=input_size, in_channels=num_channels,
            layer_norm=layer_norm, recons_objective=recons_objective,
            recons_activation=recons_activation, lambda_weights=lw,
            recursive_kld_anneal_steps=_get(args, "recursive_kld_anneal_steps",
                                            25000),
            dtype=dtype)

    if arch in ("cycle_vae",):
        from movae_tpu.models.cycle_vae import CycleVAE
        names = ("reconstruction_loss", "cycle_loss")
        lw = _weights(lambda_weights, names,
                      {"reconstruction_loss": 1.0, "cycle_loss": kld_w})
        return CycleVAE(latent_dim=latent_dim, hidden_dims=hidden_dims,
                        input_size=input_size, in_channels=num_channels,
                        layer_norm=layer_norm,
                        recons_objective=recons_objective,
                        recons_activation=recons_activation,
                        lambda_weights=lw, dtype=dtype)

    if arch in ("recursive_cyclic_vae", "rc_vae"):
        from movae_tpu.models.recursive_cyclic_vae import RecursiveCyclicVAE
        names = ("reconstruction_loss", "recursive_kld_loss", "cycle_loss")
        # setdefault semantics: a user-supplied recursive_kld weight is
        # honored for this arch (reference models/__init__.py:77)
        lw = _weights(lambda_weights, names,
                      {"reconstruction_loss": 1.0,
                       "recursive_kld_loss": kld_w, "cycle_loss": kld_w},
                      "recursive_kld_loss", kld_w, kld_force=False)
        return RecursiveCyclicVAE(
            latent_dim=latent_dim, hidden_dims=hidden_dims,
            input_size=input_size, in_channels=num_channels,
            layer_norm=layer_norm, recons_objective=recons_objective,
            recons_activation=recons_activation, lambda_weights=lw,
            recursive_kld_anneal_steps=_get(args, "recursive_kld_anneal_steps",
                                            25000),
            dtype=dtype)

    if arch in ("betatc_vae", "btc_vae"):
        from movae_tpu.models.betatc_vae import BetaTCVAE
        names = ("reconstruction_loss", "mi_loss", "tc_loss", "kld")
        lw = _weights(lambda_weights, names,
                      {"reconstruction_loss": 1.0, "mi_loss": 1.0,
                       "tc_loss": 1.0, "kld": kld_w}, "kld", kld_w)
        return BetaTCVAE(latent_dim=latent_dim, hidden_dims=hidden_dims,
                         input_size=input_size, in_channels=num_channels,
                         anneal_steps=anneal_steps, dataset_size=dataset_size,
                         recons_objective=recons_objective,
                         recons_activation=recons_activation,
                         lambda_weights=lw, perceptual_fn=perceptual_fn,
                         dtype=dtype)

    if arch in ("gg_vae", "gg_vae_v2", "gg_vae_v3", "gg_vae_v5", "gg_vae_v6"):
        from movae_tpu.models.gg_vae import GGVAE
        version = 1 if arch == "gg_vae" else int(arch.rsplit("v", 1)[-1])
        names = ("reconstruction_loss", "kld_loss", "gradient_guided_loss",
                 "edge_matching_loss")
        # dict input gets the KL override; positional lists pass through
        # (reference gg_vae branch, models/__init__.py)
        lw = _weights(lambda_weights, names,
                      {"reconstruction_loss": 1.0, "kld_loss": kld_w,
                       "gradient_guided_loss": 1.0,
                       "edge_matching_loss": 1.0}, "kld_loss", kld_w,
                      kld_list_override=False)
        return GGVAE(latent_dim=latent_dim, hidden_dims=hidden_dims,
                     input_size=input_size, in_channels=num_channels,
                     layer_norm=layer_norm, recons_objective=recons_objective,
                     recons_activation=recons_activation, lambda_weights=lw,
                     edge_matching_version=version, dtype=dtype)

    if arch == "vq_vae":
        from movae_tpu.models.vq_vae import VQVAE
        names = ("reconstruction_loss", *emb, "commitment_loss")
        defaults = {"reconstruction_loss": 1.0, "commitment_loss": 0.25}
        if not vq_ema:
            defaults["embedding_loss"] = 1.0
        lw = _weights(lambda_weights, names, defaults)
        return VQVAE(embedding_dim=embedding_dim,
                     num_embeddings=num_embeddings,
                     hidden_dims=hidden_dims,
                     num_residual_layers=num_residual_layers,
                     input_size=input_size, in_channels=num_channels,
                     recons_objective=recons_objective,
                     recons_activation=recons_activation, lambda_weights=lw,
                     vq_ema=vq_ema, vq_ema_decay=vq_ema_decay,
                     dtype=dtype)

    if arch.startswith("gg_vq_vae2") or arch == "gg_vq_vae2":
        from movae_tpu.models.gg_vq_vae2 import GGVQVAE2
        names = ("reconstruction_loss", "commitment_loss", *emb,
                 "gradient_guided_loss", "edge_matching_loss")
        defaults = {"reconstruction_loss": 1.0, "commitment_loss": 1.0,
                    "gradient_guided_loss": 1.0, "edge_matching_loss": 1.0}
        if not vq_ema:
            defaults["embedding_loss"] = 0.25
        lw = _weights(lambda_weights, names, defaults)
        return GGVQVAE2(vq_ema=vq_ema, vq_ema_decay=vq_ema_decay,
                        embedding_dim=embedding_dim,
                        num_embeddings=num_embeddings,
                        hidden_dims=hidden_dims,
                        num_residual_layers=num_residual_layers,
                        input_size=input_size, in_channels=num_channels,
                        recons_objective=recons_objective,
                        recons_activation=recons_activation,
                        lambda_weights=lw, version="v3", dtype=dtype)

    if arch == "vq_vae2":
        from movae_tpu.models.vq_vae2 import VQVAE2
        names = ("reconstruction_loss", "commitment_loss", "embedding_loss")
        # NB: vq_vae2's pre-EMA order keeps embedding last
        names = names[:-1] if vq_ema else names
        # reference REGISTRY default: {recon 1.0, commitment 1.0,
        # embedding 0.25} (models/__init__.py vq_vae2 branch) — every
        # reference run goes through the registry, so its default wins over
        # the VQVAE2 class's all-ones fallback (vq_vae2.py:152)
        defaults = {"reconstruction_loss": 1.0, "commitment_loss": 1.0}
        if not vq_ema:
            defaults["embedding_loss"] = 0.25
        lw = _weights(lambda_weights, names, defaults)
        return VQVAE2(vq_ema=vq_ema, vq_ema_decay=vq_ema_decay,
                      embedding_dim=embedding_dim,
                      num_embeddings=num_embeddings,
                      hidden_dims=hidden_dims,
                      num_residual_layers=num_residual_layers,
                      input_size=input_size, in_channels=num_channels,
                      recons_objective=recons_objective,
                      recons_activation=recons_activation, lambda_weights=lw,
                      dtype=dtype)

    if arch.startswith("gg_vq_vae"):
        from movae_tpu.models.gg_vq_vae import GGVQVAE
        version = "v1" if arch in ("gg_vq_vae", "gg_vq_vae_v1") else arch.replace(
            "gg_vq_vae_", "")
        # reference objective-dict order (gg_vq_vae.py:63-89, list mapping
        # gg_vq_vae.py:100-115): recon, embedding, commitment, gg[, edge]
        names = ("reconstruction_loss", *emb, "commitment_loss",
                 "gradient_guided_loss")
        defaults = {"reconstruction_loss": 1.0, "gradient_guided_loss": 1.0,
                    "commitment_loss": 0.25}
        if not vq_ema:
            defaults["embedding_loss"] = 1.0
        if version != "v1":
            names = names + ("edge_matching_loss",)
            defaults["edge_matching_loss"] = 1.0
        lw = _weights(lambda_weights, names, defaults)
        return GGVQVAE(vq_ema=vq_ema, vq_ema_decay=vq_ema_decay,
                       embedding_dim=embedding_dim,
                       num_embeddings=num_embeddings,
                       hidden_dims=hidden_dims,
                       num_residual_layers=num_residual_layers,
                       input_size=input_size, in_channels=num_channels,
                       recons_objective=recons_objective,
                       recons_activation=recons_activation, lambda_weights=lw,
                       version=version, dtype=dtype)

    if arch == "sphere_encoder":
        from movae_tpu.models.sphere_encoder import SphereEncoder
        l_pr = _get(args, "lambda_pix_recon", 1.0)
        l_pc = _get(args, "lambda_pix_con", 0.5)
        l_lc = _get(args, "lambda_lat_con", 0.1)
        return SphereEncoder(
            latent_dim=latent_dim, hidden_dims=hidden_dims,
            input_size=input_size, in_channels=num_channels,
            recons_objective=recons_objective,
            recons_activation=recons_activation,
            sigma_max_angle_deg=_get(args, "sigma_max_angle_deg", 80.0),
            sigma_mix_prob=_get(args, "sigma_mix_prob", 0.0),
            sigma_mix_angle_min_deg=_get(args, "sigma_mix_angle_min_deg", None),
            sigma_mix_angle_max_deg=_get(args, "sigma_mix_angle_max_deg", None),
            lambda_pix_recon=l_pr, lambda_pix_con=l_pc, lambda_lat_con=l_lc,
            # keep the echoed lambda_weights in sync with the lambda_* args
            # actually applied in loss_terms (run_training persists them
            # into checkpoints/wandb config)
            lambda_weights=(("pix_recon", l_pr), ("pix_con", l_pc),
                            ("lat_con", l_lc)),
            use_perceptual=use_perceptual,
            perceptual_fn=perceptual() if use_perceptual else None,
            dtype=dtype)

    if arch == "sphere_encoder_vit":
        from movae_tpu.models.sphere_encoder_vit import SphereEncoderViT
        patch_size = _get(args, "patch_size", None) or (
            2 if input_size <= 32 else 8)
        num_patches = (input_size // patch_size) ** 2
        if latent_dim % num_patches:
            raise ValueError(
                f"sphere_encoder_vit: latent_dim {latent_dim} must be "
                f"divisible by num_patches {num_patches}")
        return SphereEncoderViT(
            img_size=input_size, patch_size=patch_size,
            in_channels=num_channels,
            embed_dim=_get(args, "vit_embed_dim", 1024),
            depth=_get(args, "vit_depth", 24),
            num_heads=_get(args, "vit_num_heads", 16),
            mixer_depth=_get(args, "vit_mixer_depth", 2),
            latent_channels=latent_dim // num_patches,
            num_classes=_get(args, "num_classes", 0),
            sigma_max_angle_deg=_get(args, "sigma_max_angle_deg", 80.0),
            sigma_mix_prob=_get(args, "sigma_mix_prob", 0.0),
            sigma_mix_angle_min_deg=_get(args, "sigma_mix_angle_min_deg", None),
            sigma_mix_angle_max_deg=_get(args, "sigma_mix_angle_max_deg", None),
            lambda_pix_recon=(l_pr := _get(args, "lambda_pix_recon", 1.0)),
            lambda_pix_con=(l_pc := _get(args, "lambda_pix_con", 0.5)),
            lambda_lat_con=(l_lc := _get(args, "lambda_lat_con", 0.1)),
            lambda_weights=(("pix_recon", l_pr), ("pix_con", l_pc),
                            ("lat_con", l_lc)),
            use_perceptual=use_perceptual,
            perceptual_fn=perceptual() if use_perceptual else None,
            dtype=dtype)

    raise ValueError(f"Network architecture {arch} not supported")


def init_model(model: MOVAEModel, rng: jax.Array, input_size: int,
               in_channels: int = 3, batch_size: int = 2):
    """Initialize variables; returns (params, batch_stats)."""
    x = jnp.zeros((batch_size, input_size, input_size, in_channels),
                  jnp.float32)
    p_key, s_key, d_key = jax.random.split(rng, 3)
    variables = model.init(
        {"params": p_key, "sample": s_key, "dropout": d_key}, x, train=True)
    return variables["params"], variables.get("batch_stats", {})


def total_trainable_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def model_summary(model: MOVAEModel, params) -> str:
    """Per-module parameter table (the reference prints a torchsummary
    table from model.print_model_summary(), vae.py:247-285 / main.py:1279-
    1280; here the table is derived from the params pytree, grouped by the
    top two module-path levels)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    groups = {}
    for path, leaf in flat.items():
        key = "/".join(str(p) for p in path[:2])
        groups[key] = groups.get(key, 0) + int(leaf.size)
    width = max([len(k) for k in groups] + [24])
    lines = [f"{type(model).__name__} parameter summary",
             "-" * (width + 16),
             f"{'module':<{width}} {'params':>14}"]
    for name in sorted(groups):
        lines.append(f"{name:<{width}} {groups[name]:>14,}")
    lines.append("-" * (width + 16))
    lines.append(f"{'total trainable':<{width}} "
                 f"{sum(groups.values()):>14,}")
    return "\n".join(lines)

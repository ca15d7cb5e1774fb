"""Every arch in the zoo: build, forward shapes, one train step, sample.

Covers the registry surface (reference models/__init__.py:18-211) with tiny
configurations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movae_tpu.models import get_network, init_model
from movae_tpu.moo import AggregatorConfig, init_state
from movae_tpu.train.optim import build_optimizer, lr_schedule
from movae_tpu.train.state import TrainState
from movae_tpu.train.step import make_train_step

SIZE = 16

BASE = dict(batch_size=4, dataset_size=64, recons_objective="mse",
            latent_dim=16, hidden_dims=(8, 16), embedding_dim=8,
            num_embeddings=32, num_residual_layers=1, use_perceptual=False,
            anneal_steps=10, recursive_kld_anneal_steps=10,
            vit_embed_dim=32, vit_depth=1, vit_num_heads=2, vit_mixer_depth=1,
            patch_size=4)

ARCHS = [
    "vae", "betatc_vae", "gg_vae", "gg_vae_v3", "gg_vae_v6",
    "vq_vae", "gg_vq_vae", "gg_vq_vae_v3", "gg_vq_vae_v8",
    "vq_vae2", "gg_vq_vae2",
    "recursive_kl_vae", "cycle_vae", "recursive_cyclic_vae",
    "sphere_encoder", "sphere_encoder_vit",
]


def build(arch, agg="upgrad"):
    args = dict(BASE, arch=arch)
    model = get_network(SIZE, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), SIZE, 3)
    m = len(model.objective_names)
    cfg = AggregatorConfig(name=agg, num_objectives=m)
    tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
    state = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    return model, state, cfg


@pytest.mark.parametrize("arch", ARCHS)
def test_arch_forward_and_train_step(arch):
    model, state, cfg = build(arch)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (4, SIZE, SIZE, 3)).astype(np.float32))
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats}, x, train=False,
                      rngs={"sample": jax.random.PRNGKey(1),
                            "dropout": jax.random.PRNGKey(2)})
    assert out["recons"].shape == (4, SIZE, SIZE, 3)
    step_fn = jax.jit(make_train_step(model, cfg, 1, 1))
    state2, metrics = step_fn(state, x, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["total_loss"])), arch
    for k in model.objective_names:
        assert np.isfinite(float(metrics[k])), (arch, k)
    # params changed
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(state2.params)))
    assert changed, arch


@pytest.mark.parametrize("arch", ["vae", "vq_vae", "vq_vae2",
                                  "sphere_encoder"])
def test_arch_sample(arch):
    model, state, _ = build(arch)
    imgs = model.apply({"params": state.params,
                        "batch_stats": state.batch_stats}, 3,
                       method="sample",
                       rngs={"sample": jax.random.PRNGKey(5)})
    assert imgs.shape == (3, SIZE, SIZE, 3)
    assert np.isfinite(np.asarray(imgs)).all()


def test_vqvae2_code_roundtrip():
    model, state, _ = build("vq_vae2")
    x = jnp.zeros((2, SIZE, SIZE, 3))
    v = {"params": state.params, "batch_stats": state.batch_stats}
    ct, cb = model.apply(v, x, method="get_code_indices_pair")
    assert ct.shape == (2, SIZE // 8, SIZE // 8)
    assert cb.shape == (2, SIZE // 4, SIZE // 4)
    imgs = model.apply(v, ct, cb, method="decode_code")
    assert imgs.shape == (2, SIZE, SIZE, 3)


def test_betatc_anneal_counter_advances():
    model, state, cfg = build("betatc_vae", agg="sum")
    step_fn = jax.jit(make_train_step(model, cfg, 1, 1))
    x = jnp.zeros((4, SIZE, SIZE, 3))
    s1, _ = step_fn(state, x, jax.random.PRNGKey(0))
    s2, _ = step_fn(s1, x, jax.random.PRNGKey(1))
    assert float(s2.batch_stats["num_iter"]) == 2.0


def test_lambda_weights_validation():
    with pytest.raises(ValueError):
        get_network(SIZE, 3, dict(BASE, arch="vae",
                                  loss_weights={"bogus": 1.0}))


def test_lambda_weights_list_length_validated():
    """Over/under-length positional lists must raise, as the reference
    models do (vq_vae.py:195-196) — not silently truncate."""
    with pytest.raises(ValueError):
        get_network(SIZE, 3, dict(BASE, arch="vae",
                                  loss_weights=[1.0, 2.0, 3.0]))
    with pytest.raises(ValueError):
        get_network(SIZE, 3, dict(BASE, arch="vq_vae",
                                  loss_weights=[1.0, 2.0]))


def test_recursive_cyclic_kld_setdefault():
    """recursive_cyclic_vae honors a user recursive_kld weight (reference
    models/__init__.py:77 uses setdefault), unlike vae which forces it."""
    m = get_network(SIZE, 3, dict(
        BASE, arch="recursive_cyclic_vae", batch_size=8, dataset_size=80,
        loss_weights={"reconstruction_loss": 1.0,
                      "recursive_kld_loss": 0.5, "cycle_loss": 0.1}))
    assert dict(m.lambda_weights)["recursive_kld_loss"] == pytest.approx(0.5)
    m2 = get_network(SIZE, 3, dict(
        BASE, arch="vae", batch_size=8, dataset_size=80,
        loss_weights={"reconstruction_loss": 1.0, "kld_loss": 0.5}))
    assert dict(m2.lambda_weights)["kld_loss"] == pytest.approx(0.1)


def test_kld_weight_override():
    model = get_network(SIZE, 3, dict(BASE, arch="vae", batch_size=8,
                                      dataset_size=80))
    assert dict(model.lambda_weights)["kld_loss"] == pytest.approx(0.1)


def test_reference_objective_orders_and_defaults():
    """Objective order and default lambda weights must match the reference
    dict-insertion orders: positional loss_weights lists, aggregator task
    indices, and task_i_weight logging all key off them.

    - GGVQVAE (gg_vq_vae.py:63-89): recon, embedding, commitment,
      gradient_guided[, edge_matching]; defaults {1, 1, 0.25, 1[, 1]}.
    - VQVAE2: the reference REGISTRY default (models/__init__.py vq_vae2
      branch) is {recon 1.0, commitment 1.0, embedding 0.25} — every
      reference run goes through the registry, so its default wins over
      the VQVAE2 class's all-ones fallback.
    """
    m = get_network(SIZE, 3, dict(BASE, arch="gg_vq_vae"))
    assert m.objective_names == ("reconstruction_loss", "embedding_loss",
                                 "commitment_loss", "gradient_guided_loss")
    assert dict(m.lambda_weights) == {
        "reconstruction_loss": 1.0, "embedding_loss": 1.0,
        "commitment_loss": 0.25, "gradient_guided_loss": 1.0}

    m = get_network(SIZE, 3, dict(BASE, arch="gg_vq_vae_v3"))
    assert m.objective_names == (
        "reconstruction_loss", "embedding_loss", "commitment_loss",
        "gradient_guided_loss", "edge_matching_loss")

    # positional list form maps in reference order (gg_vq_vae.py:100-115)
    m = get_network(SIZE, 3, dict(BASE, arch="gg_vq_vae",
                                  loss_weights=[1.0, 2.0, 3.0, 4.0]))
    assert dict(m.lambda_weights) == {
        "reconstruction_loss": 1.0, "embedding_loss": 2.0,
        "commitment_loss": 3.0, "gradient_guided_loss": 4.0}

    m = get_network(SIZE, 3, dict(BASE, arch="vq_vae2"))
    assert m.objective_names == ("reconstruction_loss", "commitment_loss",
                                 "embedding_loss")
    assert dict(m.lambda_weights) == {
        "reconstruction_loss": 1.0, "commitment_loss": 1.0,
        "embedding_loss": 0.25}

    # gg_vae: a positional list keeps the user's KL weight (the reference
    # overrides the KL slot only for dict input on this arch)
    m = get_network(SIZE, 3, dict(BASE, arch="gg_vae", batch_size=8,
                                  dataset_size=80,
                                  loss_weights=[1.0, 0.01, 1.0, 1.0]))
    assert dict(m.lambda_weights)["kld_loss"] == pytest.approx(0.01)


def test_hidden_dims_passthrough():
    """The CLI-default tuple must reach VQ models unchanged (the reference
    registry passes args.hidden_dims straight through, models/__init__.py:23,
    168) — it used to be silently rewritten to (128, 256)."""
    m = get_network(64, 3, dict(BASE, arch="vq_vae",
                                hidden_dims=(32, 64, 128, 256, 512)))
    assert tuple(m.hidden_dims) == (32, 64, 128, 256, 512)
    assert m.latent_spatial_dim == 64 // 2 ** 5


def test_recons_dist_backcompat_mapping():
    """Old-style recons_dist(+recons_reduction) configs resolve to the
    mapped objective when recons_objective is unset (reference
    models/__init__.py:25-38)."""
    base = {k: v for k, v in BASE.items() if k != "recons_objective"}
    for dist, reduction, expect in [("bernoulli", "mean", "bce"),
                                    ("bernoulli", "sum", "bce"),
                                    ("gaussian", "mean", "mse"),
                                    ("gaussian", "sum", "mse"),
                                    ("laplacian", "mean", "l1"),
                                    ("laplacian", "sum", "l1"),
                                    ("weibull", "mean", "mse")]:
        m = get_network(SIZE, 3, dict(base, arch="vae", recons_dist=dist,
                                      recons_reduction=reduction))
        assert m.recons_objective == expect, (dist, reduction)
    # explicit recons_objective always wins over recons_dist
    m = get_network(SIZE, 3, dict(base, arch="vae", recons_objective="l1",
                                  recons_dist="bernoulli"))
    assert m.recons_objective == "l1"
    # unset everything -> mse
    m = get_network(SIZE, 3, dict(base, arch="vae"))
    assert m.recons_objective == "mse"


def test_recons_dist_backcompat_cli():
    """main.py accepts --recons_dist and resolves args.recons_objective at
    parse time (so loop-level consumers see a concrete objective)."""
    import main as main_cli
    args = main_cli.parse_args(["--recons_dist", "bernoulli"])
    assert args.recons_objective == "bce"
    args = main_cli.parse_args(["--recons_dist", "laplacian"])
    assert args.recons_objective == "l1"
    args = main_cli.parse_args([])
    assert args.recons_objective == "mse"
    args = main_cli.parse_args(["--recons_dist", "bernoulli",
                                "--recons_objective", "mse"])
    assert args.recons_objective == "mse"

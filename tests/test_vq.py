"""VQ op and VQ-VAE model tests (reference semantics: vq_vae.py:27-64)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movae_tpu.models import get_network, init_model
from movae_tpu.moo import AggregatorConfig, init_state
from movae_tpu.ops import vq as vq_ops
from movae_tpu.train.optim import build_optimizer, lr_schedule
from movae_tpu.train.state import TrainState
from movae_tpu.train.step import make_train_step


def test_vq_lookup_correctness():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(17, 8)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    q, inds = vq_ops.vq_lookup(z, cb, use_pallas=False)
    d = ((np.asarray(z)[:, None, :] - np.asarray(cb)[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(inds), d.argmin(1))
    np.testing.assert_allclose(np.asarray(q), np.asarray(cb)[d.argmin(1)])


def test_vq_gradients_match_reference_semantics():
    """embedding loss moves the codebook; commitment moves the latents;
    straight-through passes decoder grads to the encoder latents."""
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))

    def emb_loss(cb_):
        return vq_ops.vector_quantize(z, cb_, use_pallas=False)["embedding"]

    g_cb = jax.grad(emb_loss)(cb)
    assert np.abs(np.asarray(g_cb)).sum() > 0

    def commit_loss(z_):
        return vq_ops.vector_quantize(z_, cb, use_pallas=False)["commitment"]

    g_z = jax.grad(commit_loss)(z)
    assert np.abs(np.asarray(g_z)).sum() > 0
    # commitment must NOT move the codebook
    g_cb2 = jax.grad(lambda c: vq_ops.vector_quantize(
        z, c, use_pallas=False)["commitment"])(cb)
    np.testing.assert_allclose(np.asarray(g_cb2), 0.0)

    # straight-through: grad of sum(quantized) w.r.t. z is all-ones
    g_st = jax.grad(lambda z_: vq_ops.vector_quantize(
        z_, cb, use_pallas=False)["quantized"].sum())(z)
    np.testing.assert_allclose(np.asarray(g_st), 1.0)


def test_vq_pallas_interpret_matches_xla():
    """Pallas index kernel (interpret mode on CPU) must match the XLA path."""
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    inds_ref = vq_ops.nearest_code_indices(z, cb, use_pallas=False)
    try:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            inds = vq_ops._nearest_inds_pallas(z, cb)
    except Exception as e:  # pragma: no cover - interpret mode unavailable
        pytest.skip(f"pallas interpret unavailable: {e}")
    np.testing.assert_array_equal(np.asarray(inds), np.asarray(inds_ref))


def vq_args(**kw):
    d = dict(arch="vq_vae", embedding_dim=8, num_embeddings=32,
             hidden_dims=(8, 16), num_residual_layers=1, batch_size=4,
             dataset_size=64, recons_objective="mse")
    d.update(kw)
    return d


def test_vqvae_forward_shapes():
    model = get_network(32, 3, vq_args())
    params, bs = init_model(model, jax.random.PRNGKey(0), 32, 3)
    x = jnp.zeros((4, 32, 32, 3))
    out = model.apply({"params": params, "batch_stats": bs}, x, train=False,
                      rngs={"sample": jax.random.PRNGKey(1)})
    assert out["recons"].shape == (4, 32, 32, 3)
    assert out["encoding"].shape == (4, 8, 8, 8)
    assert out["encoding_inds"].shape == (4 * 8 * 8,)


@pytest.mark.parametrize("agg", ["sum", "upgrad", "mgda"])
def test_vqvae_train_step(agg):
    model = get_network(32, 3, vq_args())
    params, bs = init_model(model, jax.random.PRNGKey(0), 32, 3)
    m = len(model.objective_names)
    cfg = AggregatorConfig(name=agg, num_objectives=m)
    tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
    state = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    step_fn = jax.jit(make_train_step(model, cfg, 1, 1))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32))
    state2, metrics = step_fn(state, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert 0.0 < float(metrics["codebook_usage_percentage"]) <= 100.0
    # codebook got a gradient (embedding loss)
    cb0 = np.asarray(state.params["vq"]["embedding"])
    cb1 = np.asarray(state2.params["vq"]["embedding"])
    assert not np.allclose(cb0, cb1)


def test_vqvae_codes_roundtrip():
    model = get_network(32, 3, vq_args())
    params, bs = init_model(model, jax.random.PRNGKey(0), 32, 3)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (2, 32, 32, 3)).astype(np.float32))
    v = {"params": params, "batch_stats": bs}
    codes = model.apply(v, x, method="get_code_indices")
    assert codes.shape == (2, 8, 8)
    imgs = model.apply(v, codes, method="decode_code")
    assert imgs.shape == (2, 32, 32, 3)


def test_vqvae_ema_codebook_training():
    """--vq_ema: codebook lives in batch_stats, moves via EMA (no gradient),
    objectives reduce to recon+commitment, and training stays finite."""
    import numpy as np

    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step

    args = dict(arch="vq_vae", embedding_dim=8, num_embeddings=16,
                hidden_dims=(8,), num_residual_layers=1, batch_size=8,
                dataset_size=64, vq_ema=True, vq_ema_decay=0.9)
    model = get_network(16, 3, args)
    assert model.objective_names == ("reconstruction_loss",
                                     "commitment_loss")
    params, bs = init_model(model, jax.random.PRNGKey(0), 16, 3)
    assert "vq" not in params  # codebook is not a gradient parameter
    cb0 = np.asarray(bs["vq"]["embedding"])

    cfg = AggregatorConfig(name="upgrad", num_objectives=2)
    tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
    state = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    step_fn = jax.jit(make_train_step(model, cfg, 1, 1))

    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (8, 16, 16, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, x, sub)
    assert np.isfinite(float(metrics["total_loss"]))
    assert "embedding_loss" not in metrics
    cb1 = np.asarray(state.batch_stats["vq"]["embedding"])
    assert not np.allclose(cb0, cb1)  # EMA moved the codebook
    # eval path + sampling still work with the stats-resident codebook
    from movae_tpu.train.step import make_eval_step
    em, extras, _ = jax.jit(make_eval_step(model))(
        state.params, state.batch_stats, x, rng)
    assert np.isfinite(float(em["total_loss"]))
    samples = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, 2,
        method="sample", rngs={"sample": rng})
    assert samples.shape == (2, 16, 16, 3)


def test_vqvae2_ema_codebooks_training():
    """--vq_ema on the hierarchy: both codebooks EMA-maintained."""
    import numpy as np

    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step

    args = dict(arch="vq_vae2", embedding_dim=8, num_embeddings=16,
                hidden_dims=(8, 16), num_residual_layers=1, batch_size=8,
                dataset_size=64, vq_ema=True)
    model = get_network(16, 3, args)
    assert model.objective_names == ("reconstruction_loss",
                                     "commitment_loss")
    params, bs = init_model(model, jax.random.PRNGKey(0), 16, 3)
    assert "vq_top" not in params and "vq_bottom" not in params
    cb0 = {k: np.asarray(bs[k]["embedding"]) for k in ("vq_top", "vq_bottom")}

    cfg = AggregatorConfig(name="upgrad", num_objectives=2)
    tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
    state = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    step_fn = jax.jit(make_train_step(model, cfg, 1, 1))
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (8, 16, 16, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(1)
    for i in range(2):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, x, sub)
    assert np.isfinite(float(metrics["total_loss"]))
    for k in ("vq_top", "vq_bottom"):
        assert not np.allclose(cb0[k],
                               np.asarray(state.batch_stats[k]["embedding"]))
    # decode_code works from the stats-resident codebooks
    zt = jnp.zeros((2, 2, 2), jnp.int32)
    zb = jnp.zeros((2, 4, 4), jnp.int32)
    imgs = model.apply({"params": state.params,
                        "batch_stats": state.batch_stats}, zt, zb,
                       method="decode_code")
    assert imgs.shape == (2, 16, 16, 3)


@pytest.mark.parametrize("arch", ["gg_vq_vae_v3", "gg_vq_vae2"])
def test_gg_variants_ema(arch):
    """EMA option on the gradient-guided VQ families."""
    import numpy as np

    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step

    args = dict(arch=arch, embedding_dim=8, num_embeddings=16,
                hidden_dims=(8, 16), num_residual_layers=1, batch_size=8,
                dataset_size=64, vq_ema=True)
    model = get_network(16, 3, args)
    assert "embedding_loss" not in model.objective_names
    params, bs = init_model(model, jax.random.PRNGKey(0), 16, 3)
    m = len(model.objective_names)
    cfg = AggregatorConfig(name="upgrad", num_objectives=m)
    tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
    state = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    step_fn = jax.jit(make_train_step(model, cfg, 1, 1))
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (8, 16, 16, 3)).astype(np.float32))
    state, metrics = step_fn(state, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))

"""The VQ train path must stay scatter-free on the accelerator: XLA:TPU
executes scatters serially per update, so the codebook gradient (a
scatter-add in the naive ``jnp.take`` VJP) is expressed as a one-hot
matmul (ops/vq.py gather_rows) and the codebook-usage masks as a
compare-any reduction (ops/vq.py used_codes_mask). These tests pin the
numerics to the naive forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_gather_rows_matches_take_forward_and_grad():
    from movae_tpu.ops.vq import gather_rows

    rng = np.random.default_rng(0)
    k, d, n = 37, 8, 301
    cb = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32))
    inds = jnp.asarray(rng.integers(0, k, size=(n,)).astype(np.int32))
    cot = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    out = gather_rows(cb, inds)
    ref = jnp.take(cb, inds, axis=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    g_new = jax.grad(lambda c: jnp.vdot(gather_rows(c, inds), cot))(cb)
    g_ref = jax.grad(lambda c: jnp.vdot(jnp.take(c, inds, axis=0), cot))(cb)
    # identical sums in a different (matmul f32-accumulated) order
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_gather_rows_no_scatter_in_vjp_hlo():
    from movae_tpu.ops.vq import gather_rows

    cb = jnp.zeros((16, 4), jnp.float32)
    inds = jnp.zeros((24,), jnp.int32)

    def loss(c):
        return jnp.sum(gather_rows(c, inds) ** 2)

    hlo = jax.jit(jax.grad(loss)).lower(cb).as_text()
    assert "scatter" not in hlo


def test_used_codes_mask_matches_scatter():
    from movae_tpu.ops.vq import used_codes_mask

    rng = np.random.default_rng(1)
    k = 64
    for shape in [(50,), (4, 5, 5), (0,)]:
        inds = jnp.asarray(rng.integers(0, k, size=shape).astype(np.int32))
        got = np.asarray(used_codes_mask(inds, k))
        want = np.zeros((k,), bool)
        want[np.asarray(inds).reshape(-1)] = True
        np.testing.assert_array_equal(got, want)


def test_vq_train_step_hlo_is_scatter_free():
    """The full headline train step (vq_vae, sum) must compile without a
    single scatter: the codebook grad and the usage metric were the only
    two (BENCH.md r2 scatter audit)."""
    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step

    model_args = dict(arch="vq_vae", embedding_dim=8, num_embeddings=32,
                      hidden_dims=(8, 16), num_residual_layers=1,
                      batch_size=4, dataset_size=64)
    model = get_network(16, 3, model_args)
    params, bs = init_model(model, jax.random.PRNGKey(0), 16, 3,
                            batch_size=2)
    cfg = AggregatorConfig(name="sum",
                           num_objectives=len(model.objective_names))
    tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
    state = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    step = make_train_step(model, cfg, 1, 1)
    x = jnp.zeros((4, 16, 16, 3), jnp.float32)
    hlo = jax.jit(step).lower(state, x, jax.random.PRNGKey(1)).as_text()
    assert "scatter" not in hlo

    # the device-data fed wrapper (gather + in-jit flip around the same
    # step, data/device.py) must not reintroduce one either
    from movae_tpu.data.device import make_device_fed
    from movae_tpu.parallel.mesh import DataParallel

    parallel = DataParallel()
    nd = parallel.mesh.shape["data"]
    images = jax.device_put(
        jnp.zeros((8 * nd, 16, 16, 3), jnp.uint8),
        parallel.batch_sharding)
    idx = jax.device_put(jnp.zeros((8,), jnp.int32),
                         parallel.batch_sharding)
    fed = make_device_fed(step, parallel.mesh, flip=True)
    hlo2 = jax.jit(fed).lower(state, images, idx,
                              jax.random.PRNGKey(1)).as_text()
    assert "scatter" not in hlo2


def test_gather_embed_matches_nn_embed():
    """GatherEmbed is a drop-in for nn.Embed: same param tree, identical
    forward, grad equal to the take-based VJP."""
    from flax import linen as nn

    from movae_tpu.models.pixelcnn import GatherEmbed

    k, d = 19, 6
    codes = jnp.asarray(
        np.random.default_rng(2).integers(0, k, size=(3, 4, 4)),
        jnp.int32)
    ge = GatherEmbed(k, d)
    ne = nn.Embed(k, d)
    p = ge.init(jax.random.PRNGKey(0), codes)
    assert set(p["params"].keys()) == {"embedding"}
    assert p["params"]["embedding"].shape == (k, d)

    out_ge = ge.apply(p, codes)
    out_ne = ne.apply(p, codes)
    np.testing.assert_array_equal(np.asarray(out_ge), np.asarray(out_ne))
    assert out_ge.shape == (3, 4, 4, d)

    g_ge = jax.grad(lambda pp: jnp.sum(ge.apply(pp, codes) ** 2))(p)
    g_ne = jax.grad(lambda pp: jnp.sum(ne.apply(pp, codes) ** 2))(p)
    np.testing.assert_allclose(
        np.asarray(g_ge["params"]["embedding"]),
        np.asarray(g_ne["params"]["embedding"]), rtol=1e-5, atol=1e-5)


def test_integer_cross_entropy_matches_optax():
    import optax

    from movae_tpu.objectives import integer_cross_entropy

    rng = np.random.default_rng(3)
    lg = jnp.asarray(rng.normal(size=(96, 48)).astype(np.float32))
    lb = jnp.asarray(rng.integers(0, 48, 96).astype(np.int32))
    ours = integer_cross_entropy(lg, lb)
    ref = optax.softmax_cross_entropy_with_integer_labels(lg, lb).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)

    g1 = jax.grad(lambda l: integer_cross_entropy(l, lb))(lg)
    g2 = jax.grad(lambda l: optax.softmax_cross_entropy_with_integer_labels(
        l, lb).mean())(lg)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-7)

    hlo = jax.jit(jax.grad(lambda l: integer_cross_entropy(l, lb))
                  ).lower(lg).as_text()
    assert "scatter" not in hlo


def test_context_parallel_prior_grad_hlo_is_scatter_free():
    """The ring-attention (zigzag) prior backward must also compile without
    scatters: the stripe remap is a static bijection whose custom VJP is
    the inverse gather (ops/ring_attention.py _make_seq_permute) — a plain
    jnp.take there would transpose to a scatter-add per attention layer."""
    from movae_tpu.models.pixelcnn import PixelSNAIL
    from movae_tpu.parallel.context import context_parallel
    from movae_tpu.parallel.mesh import make_mesh

    prior = PixelSNAIL(num_embeddings=16, embedding_dim=8,
                       hidden_channels=16, num_blocks=1,
                       num_res_blocks_per_layer=1, num_heads=2, dropout=0.0)
    z = jnp.zeros((2, 8, 8), jnp.int32)
    params = prior.init(jax.random.PRNGKey(0), z, train=False)["params"]

    def loss(p):
        return prior.apply({"params": p}, z, train=False,
                           method="loss_function")["total_loss"]

    mesh = make_mesh(num_data=2, num_seq=4, devices=jax.devices()[:8])
    with context_parallel(mesh):
        hlo = jax.jit(jax.grad(loss)).lower(params).as_text()
    assert "scatter" not in hlo


def test_prior_train_grad_hlo_is_scatter_free():
    """PixelCNN prior loss backward (embedding grad + CE grad) must compile
    without scatters."""
    from movae_tpu.models.pixelcnn import PixelCNN

    model = PixelCNN(num_embeddings=32, embedding_dim=8, hidden_channels=16,
                     num_layers=2)
    z = jnp.zeros((2, 4, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), z)["params"]

    def loss(p):
        return model.apply({"params": p}, z, train=False,
                           method="loss_function")["total_loss"]

    hlo = jax.jit(jax.grad(loss)).lower(params).as_text()
    assert "scatter" not in hlo

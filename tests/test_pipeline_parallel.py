"""Pipeline-parallel PixelSNAIL prior (movae_tpu/parallel/pipeline.py) on
the 8-virtual-CPU-device mesh: stacked-param layout round-trip, pipelined
loss/grad parity vs the plain module, and an optimizer-step smoke with the
stage-sharded at-rest layout."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from movae_tpu.models.pixelcnn import PixelCNN, PixelSNAIL
from movae_tpu.parallel.pipeline import (
    BLOCKS_KEY,
    block_prefix,
    default_microbatches,
    make_pipelined_prior_loss,
    make_pipelined_snail_loss,
    shard_pp_params,
    stack_block_params,
    unstack_block_params,
)


def _mesh(dp, pp):
    devs = np.asarray(jax.devices()[: dp * pp]).reshape(dp, 1, 1, pp)
    return Mesh(devs, ("data", "model", "seq", "pipe"))


def _tiny_prior(dropout=0.0):
    return PixelSNAIL(num_embeddings=16, embedding_dim=4, hidden_channels=8,
                      num_blocks=2, num_res_blocks_per_layer=1, num_heads=2,
                      dropout=dropout)


def _init(prior, b=4, h=4, w=4):
    rng = jax.random.PRNGKey(0)
    z = jax.random.randint(jax.random.PRNGKey(1), (b, h, w), 0,
                           prior.num_embeddings)
    params = prior.init({"params": rng, "dropout": rng}, z[:2],
                        train=False)["params"]
    return params, z


def test_stack_unstack_roundtrip():
    prior = _tiny_prior()
    params, _ = _init(prior)
    stacked = stack_block_params(params)
    assert BLOCKS_KEY in stacked and "block_0" not in stacked
    lead = jax.tree_util.tree_leaves(stacked[BLOCKS_KEY])[0].shape[0]
    assert lead == prior.num_blocks
    back = unstack_block_params(stacked)
    assert set(back) == set(params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_default_microbatches():
    assert default_microbatches(8, 2) == 4
    assert default_microbatches(6, 2) == 3
    assert default_microbatches(7, 4) == 7
    assert default_microbatches(1, 4) == 1


@pytest.mark.parametrize("dp,pp,m", [(2, 2, 2), (1, 2, 4), (2, 1, 2)])
def test_pipelined_loss_and_grads_match_plain(dp, pp, m):
    prior = _tiny_prior(dropout=0.0)
    params, z = _init(prior)
    mesh = _mesh(dp, pp)
    loss_fn = make_pipelined_snail_loss(prior, mesh, m, train=True)

    def plain(p):
        return prior.apply({"params": p}, z, train=True,
                           method="loss_function")["total_loss"]

    def piped(p):
        return loss_fn(p, z, jax.random.PRNGKey(2))["total_loss"]

    l0, g0 = jax.jit(jax.value_and_grad(plain))(params)
    stacked = shard_pp_params(stack_block_params(params), mesh)
    with mesh:
        l1, g1 = jax.jit(jax.value_and_grad(piped))(stacked)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    g1u = unstack_block_params(jax.device_get(g1))
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1u))
    assert len(flat0) == len(flat1)
    for path, a in flat0:
        np.testing.assert_allclose(np.asarray(a), np.asarray(flat1[path]),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))


def test_pipelined_train_step_sharded_smoke():
    """One adam step on the at-rest P('pipe') layout: optimizer state
    inherits the stage sharding; loss finite; dropout path exercised."""
    prior = _tiny_prior(dropout=0.1)
    params, z = _init(prior, b=8)
    mesh = _mesh(2, 2)
    loss_fn = make_pipelined_snail_loss(prior, mesh, 2, train=True)
    stacked = shard_pp_params(stack_block_params(params), mesh)
    tx = optax.adam(1e-3)
    opt_state = tx.init(stacked)

    def step(p, o, z, rng):
        def lf(p):
            return loss_fn(p, z, rng)["total_loss"]

        loss, g = jax.value_and_grad(lf)(p)
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o, loss

    with mesh:
        p1, o1, loss = jax.jit(step)(stacked, opt_state, z,
                                     jax.random.PRNGKey(3))
        loss = float(loss)
    assert np.isfinite(loss)
    # stage sharding preserved through the update
    sh = p1[BLOCKS_KEY]["attention"]["q_proj"]["kernel"].sharding
    assert "pipe" in str(sh.spec)


@pytest.mark.parametrize("dp,pp,m", [(2, 2, 2), (1, 4, 2)])
def test_pipelined_pixelcnn_loss_and_grads_match_plain(dp, pp, m):
    """The default (PixelCNN) prior pipelines too: 'res_i' stack, no
    positional channels, block-internal residual."""
    prior = PixelCNN(num_embeddings=16, embedding_dim=4, hidden_channels=8,
                     num_layers=4)
    params, z = _init(prior)
    mesh = _mesh(dp, pp)
    assert block_prefix(prior) == "res_"
    loss_fn = make_pipelined_prior_loss(prior, mesh, m, train=True)

    def plain(p):
        return prior.apply({"params": p}, z, train=True,
                           method="loss_function")["total_loss"]

    def piped(p):
        return loss_fn(p, z, jax.random.PRNGKey(2))["total_loss"]

    l0, g0 = jax.jit(jax.value_and_grad(plain))(params)
    stacked = shard_pp_params(stack_block_params(params, "res_"), mesh)
    with mesh:
        l1, g1 = jax.jit(jax.value_and_grad(piped))(stacked)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    g1u = unstack_block_params(jax.device_get(g1), "res_")
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1u))
    assert len(flat0) == len(flat1)
    for path, a in flat0:
        np.testing.assert_allclose(np.asarray(a), np.asarray(flat1[path]),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))


def test_pipeline_rejects_bad_configs():
    prior = _tiny_prior()
    params, z = _init(prior)
    mesh = _mesh(1, 2)
    with pytest.raises(ValueError):  # 3 stages can't split 2 blocks
        make_pipelined_snail_loss(
            PixelSNAIL(num_embeddings=16, num_blocks=3), _mesh(1, 4), 2)
    loss_fn = make_pipelined_snail_loss(prior, mesh, 3)
    with pytest.raises(ValueError):  # batch 4 not divisible by M=3
        with mesh:
            loss_fn(shard_pp_params(stack_block_params(params), mesh), z)


def _vq_prior_setup(tmp_path):
    """(results, args-factory) for train_prior-level pp tests: a tiny
    frozen VQ model + loader + save root, and pp-enabled prior args."""
    from types import SimpleNamespace

    from movae_tpu.data import Loader, get_dataset
    from movae_tpu.models import get_network, init_model

    train, _, _ = get_dataset("synthetic-16-32")
    margs = dict(arch="vq_vae", embedding_dim=8, num_embeddings=32,
                 hidden_dims=(8, 16), num_residual_layers=1, batch_size=8,
                 dataset_size=32)
    model = get_network(16, 3, margs)
    params, bs = init_model(model, jax.random.PRNGKey(0), 16, 3,
                            batch_size=2)
    results = {"model": model,
               "state": SimpleNamespace(params=params, batch_stats=bs),
               "save_root": str(tmp_path),
               "train_loader": Loader(train, 8, shuffle=True, seed=0)}

    def args(**kw):
        d = dict(arch="vq_vae", dataset="synthetic-16-32", batch_size=8,
                 seed=0, prior_type="pixelsnail", pixelcnn_epochs=2,
                 pixelcnn_hidden_channels=8, pixelsnail_num_blocks=2,
                 pixelsnail_num_res_blocks=1, pixelsnail_num_heads=2,
                 pixelsnail_dropout=0.1, pipeline_parallel=2,
                 pixelcnn_lr=3e-4, dataset_size=32)
        d.update(kw)
        return SimpleNamespace(**d)

    return results, args


def test_pp_prior_trains_and_resumes(tmp_path):
    """train_prior end-to-end under --pipeline_parallel 2: code extraction,
    stacked/stage-sharded training, unstacked checkpoints, and a resume
    that grafts the stacked opt_state back onto the live placement."""
    from movae_tpu.train.prior import train_prior

    results, args = _vq_prior_setup(tmp_path)
    prior1 = train_prior(results, args())
    # sampler/checkpoint layout is UNSTACKED (reference-compatible)
    assert "block_0" in prior1["params"] and BLOCKS_KEY not in prior1["params"]
    import os
    last = os.path.join(str(tmp_path), "pixelsnail_prior", "checkpoints",
                        "last_prior")
    assert os.path.exists(last)

    prior2 = train_prior(results, args(pixelcnn_epochs=3, prior_resume=last))
    assert "block_0" in prior2["params"]
    for leaf in jax.tree_util.tree_leaves(prior2["params"]):
        assert np.isfinite(np.asarray(leaf)).all()


def test_pipelined_bf16_matches_plain_bf16():
    """pp composes with --compute_dtype bfloat16: same bf16 compute as the
    plain module (loose tolerance — bf16 accumulation order differs)."""
    prior = PixelSNAIL(num_embeddings=16, embedding_dim=4,
                       hidden_channels=8, num_blocks=2,
                       num_res_blocks_per_layer=1, num_heads=2,
                       dropout=0.0, dtype=jnp.bfloat16)
    params, z = _init(prior)
    mesh = _mesh(2, 2)
    loss_fn = make_pipelined_prior_loss(prior, mesh, 2, train=True)
    l0 = prior.apply({"params": params}, z, train=True,
                     method="loss_function")["total_loss"]
    stacked = shard_pp_params(stack_block_params(params), mesh)
    with mesh:
        l1 = jax.jit(lambda p: loss_fn(p, z)["total_loss"])(stacked)
    assert l1.dtype == jnp.float32
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-2)


def test_pp_composes_with_steps_per_dispatch(tmp_path):
    """shard_map pipeline inside the k-step lax.scan dispatch fusion
    (train_prior scan path) compiles and trains."""
    from movae_tpu.train.prior import train_prior

    results, args = _vq_prior_setup(tmp_path)
    prior = train_prior(results, args(pixelcnn_epochs=1,
                                      steps_per_dispatch=2))
    assert "block_0" in prior["params"]
    for leaf in jax.tree_util.tree_leaves(prior["params"]):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("cls", ["snail", "cnn"])
def test_pipelined_hierarchical_loss_and_grads_match_plain(cls):
    """Both hierarchical priors pipeline BOTH level stacks (top then
    bottom, with the conditioning path in the prologue) and match the
    plain module's loss and grads at dropout=0."""
    from movae_tpu.models.pixelcnn import (HierarchicalPixelCNN,
                                           HierarchicalPixelSNAIL)
    from movae_tpu.parallel.pipeline import (
        make_pipelined_hierarchical_loss,
        stack_prior_params,
        unstack_prior_params,
    )

    if cls == "snail":
        prior = HierarchicalPixelSNAIL(
            num_embeddings=16, embedding_dim=4, hidden_channels=8,
            num_blocks_top=2, num_res_blocks_per_layer=1, num_heads=2,
            num_layers_bottom=2, dropout=0.0)
    else:
        prior = HierarchicalPixelCNN(num_embeddings=16, embedding_dim=4,
                                     hidden_channels=8, num_layers=2)
    rng = jax.random.PRNGKey(0)
    zt = jax.random.randint(jax.random.PRNGKey(1), (4, 2, 2), 0, 16)
    zb = jax.random.randint(jax.random.PRNGKey(2), (4, 4, 4), 0, 16)
    params = prior.init({"params": rng, "dropout": rng}, zt[:2], zb[:2],
                        train=False)["params"]
    mesh = _mesh(2, 2)
    loss_fn = make_pipelined_hierarchical_loss(prior, mesh, 2, train=True)

    def plain(p):
        return prior.apply({"params": p}, zt, zb, train=True,
                           method="loss_function")["total_loss"]

    def piped(p):
        return loss_fn(p, zt, zb, jax.random.PRNGKey(3))["total_loss"]

    l0, g0 = jax.jit(jax.value_and_grad(plain))(params)
    stacked = shard_pp_params(stack_prior_params(prior, params), mesh)
    with mesh:
        l1, g1 = jax.jit(jax.value_and_grad(piped))(stacked)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    g1u = unstack_prior_params(prior, jax.device_get(g1))
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1u))
    assert len(flat0) == len(flat1)
    for path, a in flat0:
        np.testing.assert_allclose(np.asarray(a), np.asarray(flat1[path]),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))

"""Data-parallel mesh tests on 8 virtual CPU devices (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np

from movae_tpu.models import get_network, init_model
from movae_tpu.moo import AggregatorConfig, init_state
from movae_tpu.parallel.mesh import DataParallel, make_mesh
from movae_tpu.train.optim import build_optimizer, lr_schedule
from movae_tpu.train.state import TrainState
from movae_tpu.train.step import make_train_step


def test_mesh_has_8_devices():
    assert jax.device_count() >= 8
    mesh = make_mesh()
    assert mesh.shape["data"] == jax.device_count()
    assert mesh.shape["model"] == 1


def test_dp_train_step_matches_single_device():
    """The sharded step must produce the same loss as an unsharded run
    (XLA inserts psum; math is identical)."""
    args = dict(arch="vae", latent_dim=8, hidden_dims=(8,), batch_size=8,
                dataset_size=64, layer_norm="none")
    model = get_network(16, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), 16, 3)
    cfg = AggregatorConfig(name="upgrad", num_objectives=2)
    tx = build_optimizer("sgd", lr_schedule(1e-2, None, 1, 1), momentum=0.0)

    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (8, 16, 16, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(1)
    step = make_train_step(model, cfg, 1, 1)

    # single device
    s0 = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    s1, m1 = jax.jit(step)(s0, x, rng)

    # 8-device data-parallel
    parallel = DataParallel()
    s0d = parallel.replicate(
        TrainState.create(model.apply, params, bs, tx, init_state(cfg)))
    xd = parallel.shard_batch(x)
    s1d, m2 = jax.jit(step)(s0d, xd, rng)

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s1d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 32, 32, 3)


def test_dp_tp_train_step_matches_single_device():
    """4x2 (data x model) mesh with tensor-parallel weights must match the
    unsharded step numerically."""
    from movae_tpu.parallel.mesh import make_mesh

    args = dict(arch="vae", latent_dim=8, hidden_dims=(8,), batch_size=8,
                dataset_size=64, layer_norm="none")
    model = get_network(16, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), 16, 3)
    cfg = AggregatorConfig(name="upgrad", num_objectives=2)
    tx = build_optimizer("sgd", lr_schedule(1e-2, None, 1, 1), momentum=0.0)

    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (8, 16, 16, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(1)
    step = make_train_step(model, cfg, 1, 1)

    s0 = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    s1, m1 = jax.jit(step)(s0, x, rng)

    parallel = DataParallel(make_mesh(num_data=4, num_model=2))
    sp = parallel.shard_params(params, min_elems=0)
    # at least one leaf must actually be split over 'model'
    specs = jax.tree_util.tree_leaves(
        parallel.param_shardings(params, min_elems=0),
        is_leaf=lambda l: hasattr(l, "spec"))
    assert any("model" in str(s.spec) for s in specs)
    s0d = TrainState.create(model.apply, sp, bs, tx, init_state(cfg))
    s0d = s0d.replace(batch_stats=parallel.replicate(s0d.batch_stats),
                      agg_state=parallel.replicate(s0d.agg_state))
    with parallel.mesh:
        s1d, m2 = jax.jit(step)(s0d, parallel.shard_batch(x), rng)

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s1d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_fsdp_train_step_matches_single_device():
    """fsdp=True (ZeRO-3 placement: params + moments sharded over 'data')
    must be a pure layout change — identical numerics to the unsharded
    step, with at least one leaf actually split over 'data'."""
    from movae_tpu.parallel.mesh import make_mesh

    args = dict(arch="vae", latent_dim=8, hidden_dims=(8,), batch_size=8,
                dataset_size=64, layer_norm="none")
    model = get_network(16, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), 16, 3)
    cfg = AggregatorConfig(name="upgrad", num_objectives=2)
    tx = build_optimizer("sgd", lr_schedule(1e-2, None, 1, 1), momentum=0.0)

    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (8, 16, 16, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(1)
    step = make_train_step(model, cfg, 1, 1)

    s0 = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    s1, m1 = jax.jit(step)(s0, x, rng)

    parallel = DataParallel(make_mesh(num_data=8), fsdp=True)
    sp = parallel.shard_params(params, min_elems=0)
    specs = jax.tree_util.tree_leaves(
        parallel.param_shardings(params, min_elems=0),
        is_leaf=lambda l: hasattr(l, "spec"))
    assert any("data" in str(s.spec) for s in specs)
    s0d = TrainState.create(model.apply, sp, bs, tx, init_state(cfg))
    s0d = s0d.replace(batch_stats=parallel.replicate(s0d.batch_stats),
                      agg_state=parallel.replicate(s0d.agg_state))
    with parallel.mesh:
        s1d, m2 = jax.jit(step)(s0d, parallel.shard_batch(x), rng)
    # optimizer moments inherit the fsdp layout via tx.init on placed params
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s1d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_fsdp_composes_with_tp():
    """fsdp + tensor parallelism: a (4 data x 2 model) mesh where a 2-D
    kernel gets BOTH axes (P('data', 'model')-style 2-D sharding)."""
    from movae_tpu.parallel.mesh import make_mesh

    parallel = DataParallel(make_mesh(num_data=4, num_model=2), fsdp=True)
    params = {"w": jnp.zeros((8, 16)), "b": jnp.zeros((16,))}
    sh = parallel.param_shardings(params, min_elems=0)
    assert "model" in str(sh["w"].spec) and "data" in str(sh["w"].spec)
    # bias: 16 % 4 == 0 -> fsdp-sharded over data on its only dim
    assert "data" in str(sh["b"].spec)


def test_fsdp_vq_train_step_matches_single_device():
    """fsdp parity for the flagship VQ path: the codebook + gather_rows
    custom VJP under a 'data'-sharded at-rest layout."""
    from movae_tpu.parallel.mesh import make_mesh

    args = dict(arch="vq_vae", embedding_dim=8, num_embeddings=32,
                hidden_dims=(8, 16), num_residual_layers=1, batch_size=8,
                dataset_size=64)
    model = get_network(16, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), 16, 3,
                            batch_size=2)
    cfg = AggregatorConfig(name="upgrad",
                           num_objectives=len(model.objective_names))
    tx = build_optimizer("sgd", lr_schedule(1e-2, None, 1, 1), momentum=0.0)

    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (8, 16, 16, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(1)
    step = make_train_step(model, cfg, 1, 1)

    s0 = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    s1, m1 = jax.jit(step)(s0, x, rng)

    parallel = DataParallel(make_mesh(num_data=8), fsdp=True)
    sp = parallel.shard_params(params, min_elems=0)
    # the codebook itself must be sharded over 'data' for this to test
    # the custom-VJP path under fsdp
    vq_leaf = [l for p, l in jax.tree_util.tree_leaves_with_path(
        parallel.param_shardings(params, min_elems=0),
        is_leaf=lambda l: hasattr(l, "spec"))
        if "vq" in jax.tree_util.keystr(p)]
    assert any("data" in str(s.spec) for s in vq_leaf)
    s0d = TrainState.create(model.apply, sp, bs, tx, init_state(cfg))
    s0d = s0d.replace(batch_stats=parallel.replicate(s0d.batch_stats),
                      agg_state=parallel.replicate(s0d.agg_state))
    with parallel.mesh:
        s1d, m2 = jax.jit(step)(s0d, parallel.shard_batch(x), rng)
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s1d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_cached_reshard_reuses_wrapper_per_sharding():
    """cached_reshard must return the SAME jitted wrapper for equal
    shardings (lru_cache keyed on NamedSharding value equality) so repeated
    host_copy/_gather_chunk calls hit jit's dispatch cache instead of
    retracing a fresh lambda per call."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from movae_tpu.parallel.mesh import cached_reshard, make_mesh

    mesh = make_mesh(num_data=8)
    a = NamedSharding(mesh, P())
    b = NamedSharding(mesh, P())  # distinct instance, equal value
    assert cached_reshard(a) is cached_reshard(b)
    assert cached_reshard(a) is not cached_reshard(NamedSharding(mesh,
                                                                 P("data")))

    x = jnp.arange(16, dtype=jnp.float32).reshape(8, 2)
    y = cached_reshard(NamedSharding(mesh, P("data")))(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    assert y.sharding == NamedSharding(mesh, P("data"))
    z = cached_reshard(a)(y)  # replicate back
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))
    assert z.sharding.is_fully_replicated

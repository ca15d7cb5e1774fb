"""--grad_accum: A microbatches -> averaged gradients -> ONE optimizer update.

The reference has no gradient accumulation (single-GPU hot loop,
/root/reference/main.py:125-235); this is the TPU-native memory-scaling
lever for 256px configs alongside --remat/--fsdp. Each microbatch runs the
full multi-objective aggregation (its own Gramian + alpha — exactly what a
torchjd user calling backward per microbatch and stepping every A batches
would get), gradients are averaged across the A microbatches inside one
lax.scan dispatch, and a single optimizer update is applied.

Exactness oracle: with plain SGD (no momentum / no clipping) the accumulated
update from params p equals the average of the A independent single-step
updates taken from p, because each microbatch's gradient is computed at the
same p.
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


def tiny_args(**kw):
    d = dict(arch="vq_vae", latent_dim=8, hidden_dims=(8,),
             embedding_dim=4, num_embeddings=16, num_residual_layers=1,
             batch_size=4, dataset_size=64, recons_objective="mse")
    d.update(kw)
    return d


def build(agg_name, grad_accum, lr=1e-2, optimizer="sgd", momentum=0.0,
          max_grad_norm=None, size=16, args=None):
    args = args or tiny_args()
    model = get_network(size, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), size, 3)
    m = len(model.objective_names)
    cfg = AggregatorConfig(name=agg_name, num_objectives=m)
    sched = lr_schedule(lr, None, 2, 2)
    tx = build_optimizer(optimizer, sched, momentum=momentum,
                         max_grad_norm=max_grad_norm)
    state = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    step_fn = jax.jit(make_train_step(model, cfg, 2, 2,
                                      grad_accum=grad_accum))
    return model, state, step_fn


def microbatches(a=2, n=4, size=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.uniform(-1, 1, (a, n, size, size, c)).astype(np.float32))


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


@pytest.mark.parametrize("agg", ["sum", "upgrad"])
def test_accum_equals_mean_of_single_updates(agg):
    """SGD: p_accum == mean_a(p_single_a) — per-microbatch gradients are all
    taken at the same starting params (sum mode AND the feature-Jacobian
    aggregated mode; vq_vae is deterministic so rng keys don't matter)."""
    a = 2
    model, state, accum_fn = build(agg, grad_accum=a)
    _, state1, single_fn = build(agg, grad_accum=1)
    batches = microbatches(a)

    new_state, metrics = accum_fn(state, batches, jax.random.PRNGKey(1))
    singles = []
    for i in range(a):
        st_i, _ = single_fn(state1, batches[i], jax.random.PRNGKey(2 + i))
        singles.append(st_i.params)
    expect = jax.tree_util.tree_map(lambda x, y: 0.5 * (x + y), *singles)
    for got, want in zip(_leaves(new_state.params), _leaves(expect)):
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
    assert int(new_state.step) == 1  # ONE optimizer update for A microbatches
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics.get("skipped_nonfinite", 0.0)) == 0.0


def test_accum_metrics_are_microbatch_means():
    a = 3
    model, state, accum_fn = build("upgrad", grad_accum=a)
    _, state1, single_fn = build("upgrad", grad_accum=1)
    batches = microbatches(a, seed=3)
    _, metrics = accum_fn(state, batches, jax.random.PRNGKey(1))
    per = [single_fn(state1, batches[i], jax.random.PRNGKey(9))[1]
           for i in range(a)]
    for k in list(model.objective_names) + ["total_loss",
                                            "gradient_similarity"]:
        want = np.mean([float(p[k]) for p in per])
        np.testing.assert_allclose(float(metrics[k]), want, rtol=1e-5)


def test_accum_nonfinite_guard_skips_whole_update():
    a = 2
    model, state, accum_fn = build("sum", grad_accum=a)
    batches = np.array(microbatches(a))
    batches[1, 0, 0, 0, 0] = np.nan
    new_state, metrics = accum_fn(state, jnp.asarray(batches),
                                  jax.random.PRNGKey(1))
    assert float(metrics["skipped_nonfinite"]) == 1.0
    for got, want in zip(_leaves(new_state.params), _leaves(state.params)):
        np.testing.assert_array_equal(got, want)


def test_accum_batch_stats_sequential():
    """BN models: running stats advance through all A microbatches (the
    sequential semantics of A independent torch steps)."""
    a = 2
    args = dict(arch="vae", latent_dim=8, hidden_dims=(8,),
                batch_size=4, dataset_size=64, recons_objective="mse",
                layer_norm="batch")
    model, state, accum_fn = build("sum", grad_accum=a, size=16, args=args)
    batches = microbatches(a, seed=5)
    new_state, _ = accum_fn(state, batches, jax.random.PRNGKey(1))
    jax.tree_util.tree_structure(new_state.batch_stats)  # structure intact
    b0 = _leaves(state.batch_stats)
    b1 = _leaves(new_state.batch_stats)
    assert any(not np.allclose(x, y) for x, y in zip(b0, b1))


def test_loop_accum_wiring():
    """train_epoch consumes A loader batches per optimizer step; ragged
    tails fall back to single-batch updates."""
    from movae_tpu.data import Loader
    from movae_tpu.parallel.mesh import DataParallel, make_mesh
    from movae_tpu.train.loop import train_epoch

    class _DS:
        def __len__(self):
            return 10  # 2 full batches of 4 -> one accum step, tail 2 -> 1

        def get_batch(self, idx, rng=None, raw=False):
            g = np.random.default_rng(int(np.sum(idx)))
            return (g.uniform(-1, 1, (len(idx), 16, 16, 3))
                    .astype(np.float32), np.zeros(len(idx)))

    a = 2
    model, state, accum_fn = build("sum", grad_accum=a)
    _, _, single_fn = build("sum", grad_accum=1)
    loader = Loader(_DS(), 4, shuffle=False)
    parallel = DataParallel(make_mesh(num_data=1))
    state, meters, step, _ = train_epoch(
        single_fn, state, loader, parallel, jax.random.PRNGKey(0), 0,
        None, model.objective_names, accum_fn=accum_fn, accum_k=a)
    # 10 images = one accum update (8 imgs) + one single tail update (2)
    assert step == 2
    assert int(state.step) == 2
    assert np.isfinite(meters["total_loss"].avg)


def test_run_training_and_prior_with_accum(tmp_path):
    """Both stages honor --grad_accum end-to-end (VQ loop + prior CE)."""
    from types import SimpleNamespace

    from movae_tpu.train.loop import run_training
    from movae_tpu.train.prior import train_prior

    args = SimpleNamespace(
        seed=3, dataset="synthetic-16-32", data_dir="./data",
        save_path=str(tmp_path), epochs=1, batch_size=8, aggregator="upgrad",
        arch="vq_vae", latent_dim=8, hidden_dims=[8], num_residual_layers=1,
        embedding_dim=8, num_embeddings=32, recons_objective="mse",
        recons_activation=None, loss_weights=None, pref_weights=None,
        optimizer="adam", momentum=0.9, max_grad_norm=1.0, lr=1e-3, wd=0.0,
        scheduler="cosine", scheduler_lr_min=0.0, scheduler_gamma=0.1,
        scheduler_milestones=None, anneal_steps=10,
        recursive_kld_anneal_steps=10, hv_ref=None, num_vis_samples=2,
        save_freq=1, eval_freq=1, use_wandb=False, max_fid_samples=8,
        max_gen_metrics_samples=8, prior_type="pixelcnn", skip_pixelcnn=False,
        pixelcnn_epochs=1, pixelcnn_hidden_channels=16, pixelcnn_num_layers=2,
        pixelcnn_lr=3e-4, pixelcnn_temperature=1.0, pixelsnail_num_blocks=1,
        pixelsnail_num_res_blocks=1, pixelsnail_num_heads=2,
        pixelsnail_dropout=0.0, prior_use_lmdb_codes=True,
        prior_force_extract_codes=False, normalize_inputs=True,
        log_every=1, skip_final_metrics=True, compute_dtype="float32",
        grad_accum=2,
    )
    results = run_training(args)
    assert np.isfinite(results["eval_losses"][0]["total_loss"])
    # 32 imgs / bs 8 = 4 loader batches = 2 accumulated optimizer steps
    assert int(results["state"].step) == 2
    prior = train_prior(results, args)
    assert prior is not None

    args.steps_per_dispatch = 2
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_training(args)


def test_accum_composes_with_fsdp():
    """--grad_accum under fsdp/ZeRO-3 placement is a pure layout change:
    identical numerics to the unsharded accumulating step on the 8-device
    mesh (the accumulator zeros_like inherits the param sharding)."""
    from movae_tpu.parallel.mesh import DataParallel, make_mesh

    a = 2
    model, state, accum_fn = build("upgrad", grad_accum=a)
    batches = microbatches(a, n=8, seed=7)
    rng = jax.random.PRNGKey(1)
    s1, m1 = accum_fn(state, batches, rng)

    parallel = DataParallel(make_mesh(num_data=8), fsdp=True)
    _, state_d, accum_raw = build("upgrad", grad_accum=a)
    sp = parallel.shard_params(state_d.params, min_elems=0)
    state_d = state_d.replace(
        params=sp,
        opt_state=state_d.tx.init(sp),
        batch_stats=parallel.replicate(state_d.batch_stats),
        agg_state=parallel.replicate(state_d.agg_state))
    with parallel.mesh:
        s2, m2 = accum_raw(state_d, parallel.shard_batch_stacked(
            np.asarray(batches)), rng)
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    for x, y in zip(_leaves(s1.params), _leaves(s2.params)):
        np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-6)

"""End-to-end train-step smoke tests: every aggregation mode must produce a
finite loss decrease-capable update on a tiny VAE (BASELINE config #1 shape:
CIFAR-like 32x32 vanilla VAE, agg=sum, MSE — CPU-runnable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movae_tpu.models import get_network, init_model, total_trainable_params
from movae_tpu.moo import AggregatorConfig, init_state
from movae_tpu.train.optim import build_optimizer, lr_schedule
from movae_tpu.train.state import TrainState
from movae_tpu.train.step import make_eval_step, make_train_step


def tiny_args(**kw):
    d = dict(arch="vae", latent_dim=8, hidden_dims=(8, 16),
             batch_size=4, dataset_size=64, recons_objective="mse",
             layer_norm="batch")
    d.update(kw)
    return d


def build(args, agg_name="sum", steps_per_epoch=2, epochs=2):
    model = get_network(32, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), 32, 3)
    m = len(model.objective_names)
    cfg = AggregatorConfig(name=agg_name, num_objectives=m)
    sched = lr_schedule(1e-3, None, epochs, steps_per_epoch)
    tx = build_optimizer("adam", sched, max_grad_norm=1.0)
    state = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    step_fn = jax.jit(make_train_step(model, cfg, epochs, steps_per_epoch))
    return model, state, step_fn


def batch(n=4, size=32, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, (n, size, size, c)).astype(np.float32))


@pytest.mark.parametrize("agg", ["sum", "upgrad", "mgda", "aligned_mtl",
                                 "pcgrad", "cagrad", "imtlg", "nashmtl",
                                 "dualproj", "nupgrad", "pnupgrad",
                                 "comfort", "mean", "mgda_gn"])
def test_vae_train_step_all_aggregators(agg):
    model, state, step_fn = build(tiny_args(), agg)
    x = batch()
    state2, metrics = step_fn(state, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert np.isfinite(float(metrics["gradient_similarity"]))
    # params actually changed
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    assert int(state2.step) == 1
    # weights logged per task
    m = len(model.objective_names)
    for i in range(m):
        assert np.isfinite(float(metrics[f"task_{i}_weight"]))


def test_vae_loss_decreases_sum():
    model, state, step_fn = build(tiny_args(), "sum")
    x = batch()
    rng = jax.random.PRNGKey(2)
    first = None
    for i in range(30):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, x, sub)
        if first is None:
            first = float(metrics["total_loss"])
    assert float(metrics["total_loss"]) < first


def test_vae_loss_decreases_upgrad():
    model, state, step_fn = build(tiny_args(), "upgrad")
    x = batch()
    rng = jax.random.PRNGKey(2)
    first = None
    for i in range(30):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, x, sub)
        if first is None:
            first = float(metrics["total_loss"])
    assert float(metrics["total_loss"]) < first


def test_batch_stats_update():
    model, state, step_fn = build(tiny_args(layer_norm="batch"), "upgrad")
    x = batch()
    state2, _ = step_fn(state, x, jax.random.PRNGKey(1))
    b0 = jax.tree_util.tree_leaves(state.batch_stats)
    b1 = jax.tree_util.tree_leaves(state2.batch_stats)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(b0, b1))


def test_eval_step():
    model, state, step_fn = build(tiny_args(), "sum")
    eval_fn = jax.jit(make_eval_step(model))
    metrics, extras, outputs = eval_fn(state.params, state.batch_stats,
                                       batch(), jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["total_loss"]))
    assert outputs["recons"].shape == (4, 32, 32, 3)


def test_sample():
    args = tiny_args()
    model = get_network(32, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), 32, 3)
    imgs = model.apply({"params": params, "batch_stats": bs}, 5,
                       method="sample", rngs={"sample": jax.random.PRNGKey(7)})
    assert imgs.shape == (5, 32, 32, 3)
    assert np.isfinite(np.asarray(imgs)).all()


def test_param_count_positive():
    args = tiny_args()
    model = get_network(32, 3, args)
    params, _ = init_model(model, jax.random.PRNGKey(0), 32, 3)
    assert total_trainable_params(params) > 1000


def test_feature_mode_mtl_backward_semantics():
    """torchjd mtl_backward semantics: shared (trunk) params receive the
    aggregated pullback; head params receive their OWN loss's gradient
    unweighted. With aggregator 'mean' on a VAE: encoder/mu/log_var get
    grad of mean(recon, kld); decoder params get grad of recon alone."""
    args = tiny_args(layer_norm="none")
    model = get_network(32, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), 32, 3)
    x = batch()
    cfg = AggregatorConfig(name="mean", num_objectives=2)
    # lr=1 so the SGD update IS the gradient: recovering it as (p0-p1)/lr
    # with a small lr amplifies float32 subtraction noise by 1/lr (params
    # O(0.1) carry ~1e-8 absolute error; grads here are O(1e-3)).
    lr = 1.0
    tx = build_optimizer("sgd", lr_schedule(lr, None, 1, 1), momentum=0.0)

    state = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    step_feat = jax.jit(make_train_step(model, cfg, 1, 1))
    rng0 = jax.random.PRNGKey(1)
    s_feat, _ = step_feat(state, x, rng0)

    # replicate the step's rng derivation (step.py: split -> agg, then
    # split -> sample/dropout)
    rng, _agg = jax.random.split(rng0)
    k1, k2 = jax.random.split(rng)
    rngs = {"sample": k1, "dropout": k2}

    def loss_vec(p):
        (lv, _, _) = model.apply({"params": p, "batch_stats": bs}, x,
                                 train=True, method="forward_with_losses",
                                 rngs=rngs)
        return lv

    J = jax.jacrev(loss_vec)(params)  # per-objective full grads
    enc_names = ("enc_conv_0", "enc_conv_1", "mu", "log_var")
    dec_names = ("decoder_input", "dec_deconv_0", "final_deconv",
                 "final_conv")
    # The step and jacrev compile to different conv-backward graphs, whose
    # f32 reductions differ by up to ~1e-5 absolute on this model. The
    # hypotheses being distinguished (aggregated vs own-loss head grads)
    # differ at the 1e-3 scale, so atol=3e-5 still separates them cleanly.
    for name in enc_names:
        expected = jax.tree_util.tree_map(lambda j: 0.5 * j.sum(0),
                                          J[name])
        got = jax.tree_util.tree_map(
            lambda p0, p1: (p0 - p1) / lr, params[name],
            s_feat.params[name])
        for e, g in zip(jax.tree_util.tree_leaves(expected),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                       rtol=5e-2, atol=3e-5)
    for name in dec_names:
        expected = jax.tree_util.tree_map(lambda j: j[0], J[name])  # recon
        got = jax.tree_util.tree_map(
            lambda p0, p1: (p0 - p1) / lr, params[name],
            s_feat.params[name])
        for e, g in zip(jax.tree_util.tree_leaves(expected),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                       rtol=5e-2, atol=3e-5)


def test_nonfinite_batch_skips_update():
    """A NaN batch must leave params/opt-state/step untouched (in-graph
    equivalent of the reference's catch-and-skip, main.py:197-208)."""
    import numpy as np

    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import init_state
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step

    args = dict(arch="vae", latent_dim=4, hidden_dims=(4,), batch_size=4,
                dataset_size=16, layer_norm="none")
    model = get_network(16, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), 16, 3)
    cfg = AggregatorConfig(name="sum", num_objectives=2)
    tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
    state = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    step_fn = jax.jit(make_train_step(model, cfg, 1, 1))

    bad = jnp.full((4, 16, 16, 3), jnp.nan, jnp.float32)
    s_bad, m_bad = step_fn(state, bad, jax.random.PRNGKey(1))
    assert float(m_bad["skipped_nonfinite"]) == 1.0
    assert int(s_bad.step) == 0
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(s_bad.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    good = jnp.zeros((4, 16, 16, 3), jnp.float32)
    s_ok, m_ok = step_fn(s_bad, good, jax.random.PRNGKey(2))
    assert float(m_ok["skipped_nonfinite"]) == 0.0
    assert int(s_ok.step) == 1


@pytest.mark.parametrize("agg", ["sum", "upgrad", "mgda"])
def test_remat_matches_no_remat(agg):
    """--remat must be numerically identical (same graph, recomputed
    activations) in every aggregation mode."""
    import numpy as np

    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import init_state
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step

    args = dict(arch="vae", latent_dim=4, hidden_dims=(4,), batch_size=4,
                dataset_size=16, layer_norm="none")
    model = get_network(16, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), 16, 3)
    cfg = AggregatorConfig(name=agg, num_objectives=2)
    tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (4, 16, 16, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(1)

    outs = []
    for remat in (False, True):
        state = TrainState.create(model.apply, params, bs, tx,
                                  init_state(cfg))
        step_fn = jax.jit(make_train_step(model, cfg, 1, 1, remat=remat))
        s1, m1 = step_fn(state, x, rng)
        outs.append((s1, m1))
    np.testing.assert_allclose(float(outs[0][1]["total_loss"]),
                               float(outs[1][1]["total_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][0].params),
                    jax.tree_util.tree_leaves(outs[1][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_feature_mode_updates_trunk_batch_stats():
    """Regression: flax ``mutable=['batch_stats']`` returns the FULL
    collection, so the heads apply (which never runs the encoder) used to
    hand back stale encoder BatchNorm entries that erased the trunk's
    running-stat updates in the later-keys-win merge. The feature-Jacobian
    path must update encoder stats exactly like the sum path does."""
    x = batch()
    results = {}
    for agg in ("sum", "upgrad"):
        model, state, step_fn = build(tiny_args(), agg)
        assert model.feature_names is not None  # upgrad takes feature mode
        state2, _ = step_fn(state, x, jax.random.PRNGKey(1))
        flat0 = jax.tree_util.tree_leaves_with_path(state.batch_stats)
        flat1 = dict(jax.tree_util.tree_leaves_with_path(state2.batch_stats))
        changed = {jax.tree_util.keystr(k)
                   for k, v in flat0
                   if not np.allclose(np.asarray(v),
                                      np.asarray(flat1[tuple(k)]))}
        results[agg] = changed
        assert changed, f"{agg}: no batch_stats leaf changed"
    # the feature path must update the same stats the sum path updates
    assert results["upgrad"] == results["sum"]


def test_unrolled_and_vmapped_jacobians_agree(monkeypatch):
    """The per-objective-trace path (structural cone pruning) must produce
    the same Jacobian/Gramian as the vmapped one-hot path used for large m
    — on both engine modes."""
    from movae_tpu.moo import engine

    def full(p):
        a = (p["w"] ** 2).sum()
        b = (p["w"] * p["v"]).sum()
        c = jnp.sin(p["v"]).sum()
        return (a, b, c), None

    params = {"w": jnp.arange(1.0, 5.0), "v": jnp.array([0.5, -1.0, 2.0, 0.0])}
    _, _, J_u, G_u = engine.full_jacobian(full, params, 3)
    monkeypatch.setattr(engine, "_UNROLL_MAX", 0)
    _, _, J_v, G_v = engine.full_jacobian(full, params, 3)
    for ku in ("w", "v"):
        np.testing.assert_allclose(np.asarray(J_u[ku]), np.asarray(J_v[ku]),
                                   rtol=1e-6)
    np.testing.assert_allclose(np.asarray(G_u), np.asarray(G_v), rtol=1e-6)

    def trunk(p):
        return jnp.tanh(p["w"]), (None, {})

    def heads(p, f, aux):
        l1 = (f ** 2).sum()
        l2 = (p["v"] * f).sum()
        return (l1, l2), (None, None, {})

    monkeypatch.setattr(engine, "_UNROLL_MAX", 8)
    fj_u = engine.FeatureJacobian(trunk, heads, params, 2)
    monkeypatch.setattr(engine, "_UNROLL_MAX", 0)
    fj_v = engine.FeatureJacobian(trunk, heads, params, 2)
    np.testing.assert_allclose(np.asarray(fj_u.G), np.asarray(fj_v.G),
                               rtol=1e-6)
    alpha = jnp.array([0.3, 0.7])
    gu, gv = fj_u.grads(alpha), fj_v.grads(alpha)
    for ku in ("w", "v"):
        np.testing.assert_allclose(np.asarray(gu[ku]), np.asarray(gv[ku]),
                                   rtol=1e-6)


def test_scanned_step_matches_sequential():
    """make_scanned_train_step(k): one fused dispatch over k stacked batches
    must reproduce k sequential step_fn calls exactly (same per-step keys)."""
    from movae_tpu.train.step import make_scanned_train_step

    args = tiny_args(layer_norm="none")  # deterministic (no batch_stats)
    model, state, _ = build(args, "upgrad")
    raw = make_train_step(
        model, AggregatorConfig(name="upgrad",
                                num_objectives=len(model.objective_names)),
        2, 2)
    k = 3
    batches = jnp.stack([batch(seed=s) for s in range(k)])
    rng = jax.random.PRNGKey(9)

    seq_state = state
    keys = jax.random.split(rng, k)
    seq_losses = []
    for j in range(k):
        seq_state, met = raw(seq_state, batches[j], keys[j])
        seq_losses.append(float(met["total_loss"]))

    scanned = jax.jit(make_scanned_train_step(raw, k))
    scan_state, mets = scanned(state, batches, rng)
    np.testing.assert_allclose(np.asarray(mets["total_loss"]),
                               np.asarray(seq_losses), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(scan_state.params),
                    jax.tree_util.tree_leaves(seq_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
    assert int(scan_state.step) == int(seq_state.step) == k


def test_train_epoch_with_scan_dispatch():
    """Loop integration: scan_k>1 groups full batches into fused dispatches
    and falls back to single steps for the ragged tail; step count and epoch
    meters must match the unscanned run."""
    from movae_tpu.parallel.mesh import DataParallel
    from movae_tpu.train.loop import train_epoch
    from movae_tpu.train.step import make_scanned_train_step
    from movae_tpu.data import Loader, get_dataset

    # 8 virtual devices (conftest): per-step batch must divide the data axis
    train_ds, _, _ = get_dataset("synthetic-32-34", None, False)
    args = tiny_args(layer_norm="none", batch_size=8)
    model, state, step_fn = build(args, "sum")
    raw = make_train_step(
        model, AggregatorConfig(name="sum",
                                num_objectives=len(model.objective_names)),
        2, 2)
    scan_fn = jax.jit(make_scanned_train_step(raw, 2))
    parallel = DataParallel()
    loader = Loader(train_ds, 8)  # 4 full batches of 8 + ragged tail of 2
    rng = jax.random.PRNGKey(0)

    state2, meters, step, _ = train_epoch(
        scan_fn and step_fn, state, loader, parallel, rng, 0, None,
        model.objective_names, scan_fn=scan_fn, scan_k=2)
    assert step == 5  # 34 imgs / bs 8 -> 5 steps (last ragged)
    assert np.isfinite(meters["total_loss"].avg)
    assert meters["total_loss"].count == 5
    assert int(state2.step) == 5

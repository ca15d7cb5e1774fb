"""Preemption tolerance: SIGTERM flag mechanics and the train_epoch
early-break path (utils/preemption.py, train/loop.py stop_check)."""

import os
import signal

import jax
import jax.numpy as jnp
import numpy as np


def test_guard_flag_and_uninstall():
    from movae_tpu.utils.preemption import PreemptionGuard

    prev = signal.getsignal(signal.SIGTERM)
    guard = PreemptionGuard()
    try:
        assert not guard.triggered
        os.kill(os.getpid(), signal.SIGTERM)  # delivered synchronously
        assert guard.triggered
        assert guard.globally_triggered()  # single-process: == local flag
    finally:
        guard.uninstall()
    assert signal.getsignal(signal.SIGTERM) is prev


def test_train_epoch_breaks_early_on_stop_check():
    """stop_check flipping True after 2 dispatches ends the epoch early:
    fewer steps than the loader has batches, state still advanced."""
    from movae_tpu.data import Loader, get_dataset
    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.parallel.mesh import DataParallel
    from movae_tpu.train.loop import train_epoch
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step

    train_ds, _, input_size = get_dataset("synthetic-16-64", None, False)
    loader = Loader(train_ds, 8, shuffle=False, raw=True)
    n_batches = len(loader)
    assert n_batches >= 4

    margs = dict(arch="vae", latent_dim=8, hidden_dims=(8, 16),
                 batch_size=8, dataset_size=64)
    model = get_network(input_size, 3, margs)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size, 3,
                                batch_size=2)
    cfg = AggregatorConfig(name="sum",
                           num_objectives=len(model.objective_names))
    tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
    state = TrainState.create(model.apply, params, bstats, tx,
                              init_state(cfg))
    parallel = DataParallel()
    step_fn = jax.jit(make_train_step(model, cfg, 1, 1))

    calls = {"n": 0}

    def stop_check():
        calls["n"] += 1
        return calls["n"] > 2

    state2, meters, step, _rng = train_epoch(
        step_fn, state, loader, parallel, jax.random.PRNGKey(1), 0, None,
        model.objective_names, stop_check=stop_check)
    assert step == 3  # broke after the third dispatch, not n_batches
    assert step < n_batches
    assert int(state2.step) == 3
    assert np.isfinite(meters["total_loss"].avg)

"""Training orchestration: the equivalent of the reference ``main(args)``
(/root/reference/main.py:1088-1497).

Pipeline per run: build data -> model -> optimizer -> aggregator config ->
jitted train step -> epoch loop with periodic eval + sample/recon figures ->
final checkpoint -> (VQ models) prior training -> reconstruction metrics
(rFID/PSNR/SSIM/LPIPS) -> generative metrics (gFID/IS/KID) -> logging.

Same output tree as the reference (main.py:1252-1256):
``save_path/<dataset>/<arch>/<optimizer>/<aggregator>/<timestamp>/
{figures/{generated,reconstructed}, checkpoints}``.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from movae_tpu.data import Loader, get_dataset
from movae_tpu.metrics.hv import build_hv_indicator
from movae_tpu.models import (get_network, init_model, model_summary,
                              total_trainable_params)
from movae_tpu.moo import AggregatorConfig, init_state
from movae_tpu.parallel.mesh import DataParallel, make_mesh
from movae_tpu.train import checkpoint as ckpt_lib
from movae_tpu.train import figures as fig_lib
from movae_tpu.train.optim import build_optimizer, lr_schedule
from movae_tpu.train.state import TrainState
from movae_tpu.train.step import (make_eval_step, make_scanned_train_step,
                                  make_train_step)
from movae_tpu.utils import AverageMeter
from movae_tpu.utils.logging import ExperimentLogger, StepTimer

# VQ architectures that need a prior for meaningful generation
# (reference main.py:54-59)
ARCHS_NEEDING_PRIOR = {
    "vq_vae", "gg_vq_vae", "gg_vq_vae_v1", "gg_vq_vae_v2", "gg_vq_vae_v3",
    "gg_vq_vae_v4", "gg_vq_vae_v5", "gg_vq_vae_v6", "gg_vq_vae_v7",
    "gg_vq_vae_v8", "vq_vae2", "gg_vq_vae2",
}


def _mesh_shardings(tree, replicated):
    """Per-leaf LIVE shardings for a checkpoint device_put graft: keep mesh
    NamedShardings (fsdp/tp/pipe at-rest layouts), replace everything else
    with ``replicated`` — uncommitted scalar leaves (optax adam count,
    schedule steps) report a SingleDeviceSharding, and committing restored
    values there would clash with mesh-placed params inside jit."""
    from jax.sharding import NamedSharding

    def pick(x):
        sh = getattr(x, "sharding", None)
        return sh if isinstance(sh, NamedSharding) else replicated

    return jax.tree_util.tree_map(pick, tree)


def is_vq_model(args) -> bool:
    return getattr(args, "arch", "vae").lower() in ARCHS_NEEDING_PRIOR


def aggregator_config_from_args(args, num_objectives: int) -> AggregatorConfig:
    """Name + hyperparameter dispatch matching the reference
    (main.py:1191-1246)."""
    name = (getattr(args, "aggregator", None) or "sum").lower()
    pref = getattr(args, "pref_weights", None)
    if isinstance(pref, dict):
        pref = tuple(float(v) for v in pref.values())
    elif pref is not None:
        pref = tuple(float(v) for v in pref)
    return AggregatorConfig(
        name=name,
        num_objectives=num_objectives,
        norm_eps=getattr(args, "agg_norm_eps", 1e-4),
        reg_eps=getattr(args, "agg_reg_eps", 1e-4),
        mgda_norm_type=getattr(args, "comfort_mgda_norm_type", "none")
        if name == "comfort" else "none",
        mgda_epsilon=getattr(args, "mgda_epsilon", 1e-5),
        mgda_max_iters=getattr(args, "mgda_max_iters", 250),
        mgda_stable=getattr(args, "comfort_mgda_stable", False),
        mgda_min_eigenvalue_eps=getattr(args, "mgda_min_eigenvalue_eps", 1e-10),
        pref_vector=pref,
        nashmtl_update_every=getattr(args, "nashmtl_update_every", None)
        or 1,
        comfort_beta_k=getattr(args, "comfort_beta_k", 1.0),
        comfort_beta_a=getattr(args, "comfort_beta_a", 1.0),
        comfort_beta_l=getattr(args, "comfort_beta_l", 0.01),
        comfort_beta_u=getattr(args, "comfort_beta_u", 1.0),
    )


def _trim_tail(imgs, i, n_valid, nd, pc, n_ds, gb):
    """Drop the loader's wrap padding from a tail batch, keeping the
    smallest multiple of the data-axis size covering the valid rows (exact
    on one data shard, at most nd-1 duplicates otherwise; one extra jit
    specialization for the tail shape). Every process computes the same
    global shape, so multi-host global-batch assembly stays consistent.
    Returns (possibly shortened imgs, global_valid_rows)."""
    gv = n_valid if pc == 1 else max(1, min(gb, n_ds - i * gb))
    if gv < len(imgs) * pc:
        keep_g = ((gv + nd - 1) // nd) * nd
        if keep_g % pc == 0 and 0 < keep_g // pc <= len(imgs):
            imgs = imgs[: keep_g // pc]
    return imgs, gv


class _MetricPump:
    """Pipelined metric bookkeeping shared by the host-loader and
    device-data epoch drivers.

    Device metric dicts are queued and pulled to the host in groups of
    ``FETCH_GROUP`` steps with one batched transfer (the reference calls
    ``.item()`` on every loss every batch — a forced device sync each
    step), so logging overlaps device compute and costs ~1 transfer
    round-trip per group instead of per metric."""

    FETCH_GROUP = 8

    def __init__(self, objective_names, logger, log_every: int):
        self.meters = {k: AverageMeter() for k in
                       list(objective_names) + ["total_loss"]}
        self.usage_meter = AverageMeter()
        self.logger = logger
        self.log_every = log_every
        self.pending = []

    def _drain_one(self, p_step, p_valid, host):
        meters, usage_meter = self.meters, self.usage_meter
        if host.get("skipped_nonfinite"):
            # the update was skipped in-graph; keep the NaN/inf losses out of
            # the epoch meters too (the reference excludes skipped batches)
            print(f"Step {p_step}: non-finite loss/grads — update skipped")
            return
        for k in meters:
            if k in host:
                meters[k].update(host[k])
        if "codebook_usage_percentage" in host:
            usage_meter.update(host["codebook_usage_percentage"], n=p_valid)
        if host["total_loss"] > 1e15:
            print(f"Step {p_step}: EXPLODING: total={host['total_loss']:.6e}")
        if not (self.log_every and p_step % self.log_every == 0):
            return  # meters updated; per-step wandb record skipped
        logger = self.logger
        if logger is not None and logger.active:
            log = {f"train/{k}": m.avg for k, m in meters.items()}
            log.update({f"train/{k}_curr": m.val for k, m in meters.items()})
            nw = len([k for k in host if k.startswith("task_")])
            for i in range(nw):
                log[f"train/task_{i}_weight"] = host[f"task_{i}_weight"]
            log["train/gradient_similarity"] = host["gradient_similarity"]
            if usage_meter.count > 0:
                log["train/codebook_usage_percentage"] = usage_meter.avg
            logger.log(log, step=p_step)

    def push(self, p_step: int, p_valid: int, metrics) -> None:
        self.pending.append((p_step, p_valid, metrics))

    @property
    def due(self) -> bool:
        return len(self.pending) >= self.FETCH_GROUP

    def flush(self) -> None:
        if not self.pending:
            return
        # one batched transfer for the whole group of metric dicts
        fetched = jax.device_get([m for _, _, m in self.pending])
        for (p_step, p_valid, _), m in zip(self.pending, fetched):
            self._drain_one(p_step, p_valid,
                            {k: float(v) for k, v in m.items()})
        self.pending.clear()

    def final_meters(self):
        if self.usage_meter.count > 0:
            self.meters["codebook_usage_percentage"] = self.usage_meter
        return self.meters


def train_epoch(step_fn, state, loader, parallel, rng, step, logger,
                objective_names, log_every: int = 1,
                timer: Optional[StepTimer] = None,
                scan_fn=None, scan_k: int = 1, stop_check=None,
                accum_fn=None, accum_k: int = 1):
    """One epoch of the hot loop (reference train_epoch, main.py:125-235).

    ``stop_check`` (optional, single-host only): polled between step
    dispatches; when it returns True the epoch breaks early after the
    in-flight work is flushed (preemption — utils/preemption.py). The
    caller decides what to save; partial-epoch meters are still returned.

    Metric host-fetches are pipelined (see :class:`_MetricPump`).
    """
    pump = _MetricPump(objective_names, logger, log_every)
    n_images = 0
    nd = parallel.mesh.shape["data"]
    # tail math must follow the loader's OWN sharding (an unsharded loader
    # under multi-host JAX would otherwise mis-weight the tail); training
    # loaders are built process-sharded, assert the assumption
    pc = loader.process_count
    assert pc == jax.process_count(), (
        f"train loader shards over {pc} processes but jax runs "
        f"{jax.process_count()}")
    n_ds = len(loader.dataset)
    gb = loader.batch_size * loader.process_count
    if timer is not None:
        timer.start()
    scan_buf = []  # full-size host batches awaiting one fused dispatch
    accum_buf = []  # microbatches awaiting one grad-accumulation update
    last_metrics = None  # device dict of the most recent step (epoch barrier)

    def run_single(imgs, n_valid):
        nonlocal state, rng, step, n_images, last_metrics
        batch = parallel.shard_batch(imgs)
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        last_metrics = metrics
        step += 1
        n_images += n_valid
        # every step feeds the epoch meters (reference main.py:216-229
        # updates its AverageMeters per batch); log_every only gates the
        # per-step logger records inside drain_one
        pump.push(step, n_valid, metrics)

    def run_accum_buf(force=False):
        """Dispatch A buffered microbatches as ONE gradient-accumulation
        update (make_train_step(grad_accum=A)); leftovers at epoch end run
        as independent single-batch updates (a documented smaller effective
        batch for the ragged tail)."""
        nonlocal state, rng, step, n_images, last_metrics
        if len(accum_buf) == accum_k:
            stacked = parallel.shard_batch_stacked(
                np.stack([b for b, _ in accum_buf]))
            rng, sub = jax.random.split(rng)
            state, mets = accum_fn(state, stacked, sub)
            last_metrics = mets
            step += 1  # A microbatches = ONE optimizer step
            nv = sum(n for _, n in accum_buf)
            n_images += nv
            pump.push(step, nv, mets)
            accum_buf.clear()
        elif force:
            for b, nv in accum_buf:
                run_single(b, nv)
            accum_buf.clear()

    def run_scan_buf(force=False):
        """Dispatch k buffered batches as ONE fused k-step program
        (make_scanned_train_step); leftovers at epoch end run singly."""
        nonlocal state, rng, step, n_images, last_metrics
        if len(scan_buf) == scan_k:
            stacked = parallel.shard_batch_stacked(
                np.stack([b for b, _ in scan_buf]))
            rng, sub = jax.random.split(rng)
            state, mets = scan_fn(state, stacked, sub)
            last_metrics = mets
            for j, (_, nv) in enumerate(scan_buf):
                step += 1
                n_images += nv
                pump.push(step, nv, jax.tree_util.tree_map(
                    lambda m, j=j: m[j], mets))
            scan_buf.clear()
        elif force:
            for b, nv in scan_buf:
                run_single(b, nv)
            scan_buf.clear()

    for i, (imgs, _labels, n_valid) in enumerate(loader):
        # drop the wrap padding from the tail batch before it contributes
        # duplicate-image gradients (matches the reference's ragged last
        # torch batch, main.py:125-235, exactly when the data axis has one
        # shard; with nd > 1 shards up to nd-1 wrap duplicates remain in
        # the kept rows — see _trim_tail)
        imgs, gv = _trim_tail(imgs, i, n_valid, nd, pc, n_ds, gb)
        # buffer only GLOBALLY full batches, judged by the host-invariant
        # global valid count gv (per-host n_valid can differ by one on the
        # tail under multi-host sharding — hosts branching differently
        # would enter mismatched collective programs and deadlock)
        full = len(imgs) == loader.batch_size and gv == gb
        if accum_fn is not None and accum_k > 1 and full:
            accum_buf.append((np.asarray(imgs), n_valid))
            run_accum_buf()
        elif scan_fn is not None and scan_k > 1 and full:
            scan_buf.append((np.asarray(imgs), n_valid))
            run_scan_buf()
        else:
            # trimmed/ragged tail keeps the single-step path (its own jit
            # specialization, as before)
            run_accum_buf(force=True)
            run_scan_buf(force=True)
            run_single(imgs, n_valid)
        if pump.due:
            pump.flush()
        if stop_check is not None and stop_check():
            break
    run_accum_buf(force=True)
    run_scan_buf(force=True)
    pump.flush()
    if timer is not None and n_images:
        # epoch-end barrier on the FINAL step (flushed fetches may lag it
        # when log_every > 1). A host fetch, not block_until_ready: on the
        # axon TPU platform the latter can return before execution completes.
        ml = last_metrics["total_loss"]
        float(ml if getattr(ml, "ndim", 0) == 0 else ml[-1])
        timer.stop(n_images)
    return state, pump.final_meters(), step, rng


def train_epoch_device(dd, fed_step, state, parallel, rng, step, logger,
                       objective_names, epoch_index: int,
                       log_every: int = 1,
                       timer: Optional[StepTimer] = None,
                       fed_scan=None, scan_k: int = 1, stop_check=None,
                       fed_accum=None, accum_k: int = 1, host_step=None):
    """One epoch over a device-resident dataset (``--device_data``,
    data/device.py): every full batch is assembled ON-DEVICE by the fed
    step's gather (steady-state host->device traffic = the int32 index
    block), and epoch leftovers run through the ordinary host path so
    every image still trains once per epoch (reference ragged-tail
    semantics, main.py:125-235).

    ``fed_step``/``fed_scan``/``fed_accum`` are jitted
    ``(state, images, idx, rng)`` programs built by
    ``data.device.make_device_fed`` over the plain / scanned /
    accumulating raw steps; ``host_step`` is the plain host-batch step
    used for the tail."""
    pump = _MetricPump(objective_names, logger, log_every)
    n_images = 0
    last_metrics = None
    idx_local, tail_ids = dd.epoch_plan(epoch_index)
    if timer is not None:
        timer.start()
    group = (accum_k if (fed_accum is not None and accum_k > 1) else
             (scan_k if (fed_scan is not None and scan_k > 1) else 1))
    stopped = False
    t = 0
    while t < dd.steps and not stopped:
        take = group if t + group <= dd.steps else 1  # leftovers run singly
        rng, sub = jax.random.split(rng)
        if take > 1:
            idx_dev = dd.put_idx(idx_local[t:t + take], stacked=True)
            if fed_accum is not None and accum_k > 1:
                state, mets = fed_accum(state, dd.images_dev, idx_dev, sub)
                step += 1  # A microbatches = ONE optimizer step
                nv = take * (dd.B // dd.pc)
                n_images += nv
                pump.push(step, nv, mets)
            else:
                state, mets = fed_scan(state, dd.images_dev, idx_dev, sub)
                for j in range(take):
                    step += 1
                    n_images += dd.B // dd.pc
                    pump.push(step, dd.B // dd.pc, jax.tree_util.tree_map(
                        lambda m, j=j: m[j], mets))
        else:
            idx_dev = dd.put_idx(idx_local[t], stacked=False)
            state, mets = fed_step(state, dd.images_dev, idx_dev, sub)
            step += 1
            n_images += dd.B // dd.pc
            pump.push(step, dd.B // dd.pc, mets)
        last_metrics = mets
        t += take
        if pump.due:
            pump.flush()
        if stop_check is not None and stop_check():
            stopped = True
    if not stopped and len(tail_ids):
        host_rng = np.random.default_rng((dd.seed, epoch_index, 1 << 20))
        for imgs, n_valid in dd.tail_batches(tail_ids, host_rng):
            batch = parallel.shard_batch(imgs)
            rng, sub = jax.random.split(rng)
            state, mets = host_step(state, batch, sub)
            last_metrics = mets
            step += 1
            n_images += n_valid
            pump.push(step, n_valid, mets)
            if pump.due:
                pump.flush()
            if stop_check is not None and stop_check():
                break
    pump.flush()
    if timer is not None and n_images:
        # epoch-end barrier on the final step via a host fetch (see
        # train_epoch: block_until_ready can return early on axon)
        ml = last_metrics["total_loss"]
        float(ml if getattr(ml, "ndim", 0) == 0 else ml[-1])
        timer.stop(n_images)
    return state, pump.final_meters(), step, rng


def evaluate(eval_fn, state, loader, parallel, rng, objective_names):
    """Eval losses + exact codebook usage over the full set
    (reference evaluate, main.py:238-332)."""
    meters = {k: AverageMeter() for k in
              list(objective_names) + ["total_loss"]}
    union = {}

    def drain(metrics, extras, weight):
        metrics, extras = jax.device_get((metrics, extras))
        for k in meters:
            meters[k].update(float(metrics[k]), n=weight)
        for k, mask in extras.items():
            m = np.asarray(mask)
            union[k] = np.logical_or(union[k], m) if k in union else m

    nd = parallel.mesh.shape["data"]
    # follow the loader's own sharding: evaluate.py builds an unsharded
    # loader (process_count=1), in which case the tail math is plain
    # single-host regardless of jax.process_count()
    pc = loader.process_count
    n_ds = len(loader.dataset)
    gb = loader.batch_size * loader.process_count
    pending = None  # one-step-delayed host fetch (overlaps device compute)
    for i, (imgs, _labels, n_valid) in enumerate(loader):
        # ragged-tail evaluation (reference main.py:238-332): shared trim
        # logic with train_epoch — exact when nd == 1, at most nd-1
        # duplicate rows inside the tail-batch mean otherwise
        imgs, gv = _trim_tail(imgs, i, n_valid, nd, pc, n_ds, gb)
        batch = parallel.shard_batch(imgs)
        rng, sub = jax.random.split(rng)
        metrics, extras, _ = eval_fn(state.params, state.batch_stats, batch,
                                     sub)
        if pending is not None:
            drain(*pending)
        pending = (metrics, extras, gv / pc)
    if pending is not None:
        drain(*pending)
    if union:
        if "used_mask_top" in union:
            usage = 0.5 * (union["used_mask_top"].mean() * 100.0
                           + union["used_mask_bottom"].mean() * 100.0)
        else:
            usage = union["used_mask"].mean() * 100.0
        m = AverageMeter()
        m.update(float(usage))
        meters["codebook_usage_percentage"] = m
    return meters, rng


def run_training(args) -> Dict[str, Any]:
    """Full training pipeline; returns a results dict (final metrics,
    save_root, state)."""
    normalize = getattr(args, "normalize_inputs",
                        getattr(args, "normalize", False))
    train_ds, test_ds, input_size = get_dataset(
        args.dataset, data_dir=args.data_dir, normalize=normalize)
    if (not normalize) and getattr(args, "recons_objective", "mse") in {
            "mse", "l1", "smooth_l1", "perceptual"}:
        print("Warning: normalize_inputs=false with a tanh-range recons "
              "objective; consider --normalize_inputs (main.py:1131-1138).")

    args.dataset_size = len(train_ds)
    num_model = int(getattr(args, "model_partitions", 1) or 1)
    num_seq = int(getattr(args, "context_parallel", 1) or 1)
    num_pipe = int(getattr(args, "pipeline_parallel", 1) or 1)
    # one static mesh for both stages: the VQ stage shards only on 'data'
    # (non-trivial 'seq'/'pipe' axes narrow its DP width — context/pipeline
    # parallelism are opt-ins for prior-dominated runs). --fsdp additionally
    # shards params + optimizer moments over 'data' (ZeRO-3 placement).
    parallel = DataParallel(make_mesh(num_model=num_model, num_seq=num_seq,
                                      num_pipe=num_pipe),
                            fsdp=bool(getattr(args, "fsdp", False)))
    batch_size = parallel.pad_to_devices(args.batch_size)

    # hot-loop loaders ship raw uint8 (cast/normalize happens on-device in
    # the jitted step — 4x less host->device traffic); the float test_loader
    # serves figures and the final metric passes, which expect float images.
    # Multi-host (DCN) runs: args.batch_size is the global batch; each
    # process loads an interleaved 1/process_count slice.
    pc, pi = jax.process_count(), jax.process_index()
    local_bs = batch_size // pc if pc > 1 else batch_size
    train_loader = Loader(train_ds, local_bs, shuffle=True,
                          seed=getattr(args, "seed", 0) or 0, raw=True,
                          process_index=pi, process_count=pc)
    eval_loader = Loader(test_ds, local_bs, shuffle=False, raw=True,
                         process_index=pi, process_count=pc)
    test_loader = Loader(test_ds, batch_size, shuffle=False)

    model = get_network(input_size, 3, args)
    rng = jax.random.PRNGKey(getattr(args, "seed", 0) or 0)
    rng, init_rng = jax.random.split(rng)
    # init on a tiny batch: param shapes are batch-independent, and a
    # full-global-batch init forward would run unsharded on one device
    # (OOM risk at 256px pod-scale batches) before the mesh placement
    params, batch_stats = init_model(model, init_rng, input_size, 3,
                                     batch_size=2)
    args.total_params = total_trainable_params(params)
    if jax.process_index() == 0:
        # model summary table (reference main.py:1279-1280)
        print(model_summary(model, params))

    for name, w in dict(model.lambda_weights).items():
        setattr(args, f"{name}_weight", w)

    accum_k = int(getattr(args, "grad_accum", 1) or 1)
    if accum_k > 1 and int(getattr(args, "steps_per_dispatch", 1) or 1) > 1:
        raise ValueError(
            "--grad_accum and --steps_per_dispatch are mutually "
            "exclusive (an accumulation group is already one dispatch)")
    # device-resident training data (data/device.py): the full uint8 train
    # set lives in HBM sharded over 'data'; batches are gathered in-jit
    from movae_tpu.data.device import resolve_device_data
    dd = resolve_device_data(args, train_ds, parallel, batch_size)
    if dd is not None:
        steps_per_epoch = dd.optimizer_steps_per_epoch(accum_k)
        batches_per_epoch = dd.steps + dd.tail_steps  # gradient aggregations
    else:
        steps_per_epoch = len(train_loader)
        batches_per_epoch = steps_per_epoch  # loader batches == aggregations
        # gradient accumulation: A loader microbatches per optimizer update,
        # so every step-counted cadence (lr schedule, comfort beta) runs on
        # OPTIMIZER steps per epoch: full batches accumulate in groups of A;
        # leftover full batches and the ragged global tail run as
        # independent single updates (train_epoch run_accum_buf)
        if accum_k > 1:
            n_full = min(len(train_ds) // batch_size, steps_per_epoch)
            steps_per_epoch = max(1, n_full // accum_k + n_full % accum_k
                                  + (steps_per_epoch - n_full))
    sched = lr_schedule(args.lr, getattr(args, "scheduler", None), args.epochs,
                        steps_per_epoch,
                        lr_min=getattr(args, "scheduler_lr_min", 0.0),
                        gamma=getattr(args, "scheduler_gamma", 0.1),
                        milestones=getattr(args, "scheduler_milestones", None))
    tx = build_optimizer(args.optimizer, sched,
                         momentum=getattr(args, "momentum", 0.9),
                         weight_decay=getattr(args, "wd", 0.0) or 0.0,
                         max_grad_norm=getattr(args, "max_grad_norm", None))

    m = len(model.objective_names)
    agg_cfg = aggregator_config_from_args(args, m)
    if (agg_cfg.name == "nashmtl"
            and not getattr(args, "nashmtl_update_every", None)):
        # reference default: recompute Nash weights once per epoch
        # (update_weights_every=len(train_loader), main.py:1230-1235); an
        # explicit args value wins. The counter advances once per GRADIENT
        # AGGREGATION (the reference's per-batch counting) — under
        # --grad_accum that is once per microbatch, so the per-epoch
        # default is the loader batch count, not the optimizer-step count
        agg_cfg = AggregatorConfig(
            **{**agg_cfg.__dict__,
               "nashmtl_update_every": batches_per_epoch})
    args.aggregator = agg_cfg.name

    # placement: params sharded over the 'model' axis when
    # --model_partitions > 1 (tensor parallelism; replicated otherwise),
    # everything else replicated; optimizer moments inherit the param layout
    # because tx.init runs on the placed params.
    params = parallel.shard_params(params)
    batch_stats = parallel.replicate(batch_stats)
    state = TrainState.create(model.apply, params, batch_stats, tx,
                              parallel.replicate(init_state(agg_cfg)))

    # multi-host: only process 0 owns run IO (save tree, wandb/local logs,
    # figures, checkpoints) — other processes train silently
    is_main = jax.process_index() == 0
    timestamp = time.strftime("%Y%m%d_%H%M%S")
    save_root = os.path.join(args.save_path, args.dataset, args.arch,
                             args.optimizer, agg_cfg.name, timestamp)
    if is_main:
        os.makedirs(os.path.join(save_root, "figures", "generated"),
                    exist_ok=True)
        os.makedirs(os.path.join(save_root, "figures", "reconstructed"),
                    exist_ok=True)
        os.makedirs(os.path.join(save_root, "checkpoints"), exist_ok=True)

    logger = ExperimentLogger(
        use_wandb=getattr(args, "use_wandb", False) and is_main,
        save_dir=save_root if is_main else None,
        config=vars(args) if hasattr(args, "__dict__") else dict(args),
        project=getattr(args, "wandb_project", "mo-vae"),
        entity=getattr(args, "wandb_entity", None),
        name=getattr(args, "wandb_name", None),
        group=getattr(args, "wandb_group", None),
        tags=getattr(args, "wandb_tags", None))

    hv_indicator = build_hv_indicator(model.objective_names,
                                      getattr(args, "hv_ref", None))

    raw_step = make_train_step(model, agg_cfg, args.epochs, steps_per_epoch,
                               normalize_inputs=normalize,
                               remat=getattr(args, "remat", False))
    train_step = jax.jit(raw_step, donate_argnums=(0,))
    # fused k-step dispatch for small per-chip batches (see
    # make_scanned_train_step); 1 = off
    scan_k = int(getattr(args, "steps_per_dispatch", 1) or 1)
    raw_scan = (make_scanned_train_step(raw_step, scan_k)
                if scan_k > 1 else None)
    scan_fn = (jax.jit(raw_scan, donate_argnums=(0,))
               if raw_scan is not None else None)
    # gradient accumulation (see make_train_step grad_accum); the plain
    # train_step handles ragged tails as independent updates
    raw_accum = (make_train_step(model, agg_cfg, args.epochs,
                                 steps_per_epoch,
                                 normalize_inputs=normalize,
                                 remat=getattr(args, "remat", False),
                                 grad_accum=accum_k)
                 if accum_k > 1 else None)
    accum_fn = (jax.jit(raw_accum, donate_argnums=(0,))
                if raw_accum is not None else None)
    eval_fn = jax.jit(make_eval_step(model, normalize_inputs=normalize))
    # device-data fed variants: gather + in-jit flip around the SAME raw
    # steps (the image store is arg 1, never donated)
    fed_step = fed_scan = fed_accum = None
    if dd is not None:
        from movae_tpu.data.device import make_device_fed
        fed_step = jax.jit(make_device_fed(raw_step, parallel.mesh, dd.flip),
                           donate_argnums=(0,))
        if raw_scan is not None:
            fed_scan = jax.jit(
                make_device_fed(raw_scan, parallel.mesh, dd.flip),
                donate_argnums=(0,))
        if raw_accum is not None:
            fed_accum = jax.jit(
                make_device_fed(raw_accum, parallel.mesh, dd.flip),
                donate_argnums=(0,))

    step = 0
    timer = StepTimer()
    train_losses, eval_losses = [], []
    log_every = getattr(args, "log_every", 1)
    num_vis = getattr(args, "num_vis_samples", 4)
    start_epoch = 1

    # mid-training resume (absent in the reference, which restarts from
    # scratch on failure — SURVEY.md §5 "no mid-epoch resume"); restores the
    # full TrainState (params, opt/agg state, step) from a 'last' checkpoint.
    resume_from = getattr(args, "resume", None)
    if resume_from:
        payload = ckpt_lib.load_checkpoint(resume_from)
        sd = payload["model_state_dict"]
        state = state.replace(
            params=parallel.shard_params(sd["params"]),
            batch_stats=jax.device_put(sd.get("batch_stats", {}),
                                       parallel.replicated))
        if payload.get("opt_state"):
            # orbax restores pytrees as plain dicts/lists; graft the restored
            # leaves back onto the live opt_state treedef (same flatten order)
            leaves = jax.tree_util.tree_leaves(payload["opt_state"])
            treedef = jax.tree_util.tree_structure(state.opt_state)
            if treedef.num_leaves == len(leaves):
                restored = jax.tree_util.tree_unflatten(
                    treedef, [jnp.asarray(l) for l in leaves])
                # graft onto the LIVE placement (fsdp/tp-sharded moments
                # when enabled — a blanket replicate would materialize full
                # moments per chip and defeat the ZeRO-3 at-rest memory).
                # Scalar optax leaves (adam count etc.) report a
                # SingleDeviceSharding; committing them there would clash
                # with the mesh-placed params inside jit — replicate those.
                state = state.replace(opt_state=jax.device_put(
                    restored, _mesh_shardings(state.opt_state,
                                              parallel.replicated)))
        start_epoch = int(payload.get("epoch") or 0) + 1
        step = int(payload.get("step") or 0)
        state = state.replace(step=jnp.asarray(step, jnp.int32))
        print(f"Resumed from {resume_from} at epoch {start_epoch}")

    # optional jax profiler trace of the first training epoch
    # (the reference has no tracing at all — SURVEY.md §5)
    profile_dir = getattr(args, "profile_dir", None) if is_main else None
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # preemption tolerance (utils/preemption.py): SIGTERM checkpoints at
    # the next safe point and exits 143 so a scheduler retry can --resume.
    # Per-step polling is single-host only; multi-host acts at epoch
    # boundaries via the allgathered flag (collective-cadence safety).
    from movae_tpu.utils.preemption import PreemptionGuard
    guard = PreemptionGuard()
    stop_check = ((lambda: guard.triggered)
                  if jax.process_count() == 1 else None)

    def _save_last(epoch_done: int) -> None:
        # host_copy all-gathers fsdp/tp-sharded leaves (a collective —
        # EVERY process must reach this call); only process 0 writes
        payload = {
            "epoch": epoch_done, "step": step,
            "model_state_dict": {
                "params": parallel.host_copy(state.params),
                "batch_stats": parallel.host_copy(state.batch_stats)},
            "opt_state": parallel.host_copy(state.opt_state),
            "args": {k: v for k, v in vars(args).items()
                     if isinstance(v, (int, float, str, bool, list,
                                       dict, type(None), tuple))},
        }
        if is_main:
            ckpt_lib.save_checkpoint(
                os.path.join(save_root, "checkpoints", "last_checkpoint"),
                payload)

    for epoch in range(start_epoch, args.epochs + 1):
        if dd is not None:
            state, meters, step, rng = train_epoch_device(
                dd, fed_step, state, parallel, rng, step, logger,
                model.objective_names, epoch_index=epoch,
                log_every=log_every, timer=timer,
                fed_scan=fed_scan, scan_k=scan_k, stop_check=stop_check,
                fed_accum=fed_accum, accum_k=accum_k, host_step=train_step)
        else:
            state, meters, step, rng = train_epoch(
                train_step, state, train_loader, parallel, rng, step, logger,
                model.objective_names, log_every=log_every, timer=timer,
                scan_fn=scan_fn, scan_k=scan_k, stop_check=stop_check,
                accum_fn=accum_fn, accum_k=accum_k)
        train_losses.append({k: v.avg for k, v in meters.items()})

        if guard.globally_triggered():
            # mark THIS epoch as not completed: resume re-runs it with the
            # mid-epoch params (small data repetition, never a lost epoch)
            _save_last(epoch - 1)  # collective inside; write gated on p0
            if profile_dir and epoch == start_epoch:
                jax.profiler.stop_trace()
            guard.uninstall()
            path = os.path.join(save_root, "checkpoints", "last_checkpoint")
            print(f"[movae_tpu] preempted during epoch {epoch}: wrote "
                  f"resumable checkpoint ({path}); exiting 143. "
                  f"Continue with --resume {path}", flush=True)
            sys.exit(143)

        log_dict = {}
        if hv_indicator is not None:
            pt = np.array([[meters[k].avg for k in model.objective_names]])
            log_dict["train/hv"] = hv_indicator(pt)

        if (epoch % getattr(args, "save_freq", 10) == 0
                or epoch == args.epochs):
            # every process runs the figure forwards (the model params live
            # on the global mesh — a lone process entering that computation
            # would hang the others); only process 0 writes files
            _write_figures(model, state, test_loader, rng, save_root, epoch,
                           num_vis, normalize, logger, step,
                           train_ds=train_ds, save=is_main)

        if epoch % getattr(args, "eval_freq", 1) == 0:
            eval_meters, rng = evaluate(eval_fn, state, eval_loader,
                                        parallel, rng,
                                        model.objective_names)
            eval_losses.append({k: v.avg for k, v in eval_meters.items()})
            for k, v in eval_meters.items():
                log_dict[f"eval/{k}"] = v.avg
            if hv_indicator is not None:
                pt = np.array([[eval_meters[k].avg
                                for k in model.objective_names]])
                log_dict["eval/hv"] = hv_indicator(pt)
            loss_line = ", ".join(f"{k}: {v.avg:.6e}"
                                  for k, v in eval_meters.items())
            print(f"Epoch {epoch}/{args.epochs} eval: {loss_line}")

        if logger.active and log_dict:
            logger.log(log_dict, step=step)

        if profile_dir and epoch == start_epoch:
            jax.profiler.stop_trace()
            print(f"Saved profiler trace of epoch {epoch} to {profile_dir}")
            profile_dir = None

        # fault-tolerance checkpoint every save_freq epochs (resumable;
        # the reference only writes the final checkpoint, main.py:1422-1437)
        if (epoch % getattr(args, "save_freq", 10) == 0
                and epoch < args.epochs):
            _save_last(epoch)  # collective inside; write gated on p0

    guard.uninstall()  # default SIGTERM semantics outside the epoch loop
    print(f"Training done: {timer.images_per_sec:.1f} images/sec")

    # final checkpoint (payload keys per main.py:1422-1437); the host fetch
    # is a collective under multi-host sharded layouts — run it everywhere
    final_path = ckpt_lib.final_checkpoint_path(save_root)
    final_params = parallel.host_copy(state.params)
    final_bstats = parallel.host_copy(state.batch_stats)
    if is_main:
        ckpt_lib.save_checkpoint(final_path, {
            "epoch": args.epochs,
            "model_state_dict": {
                "params": final_params,
                "batch_stats": final_bstats},
            "args": {k: v for k, v in vars(args).items()
                     if isinstance(v, (int, float, str, bool, list, dict,
                                       type(None), tuple))},
            "train_losses": train_losses,
            "eval_losses": eval_losses,
            "best_eval_loss": min((e.get("total_loss", np.inf)
                                   for e in eval_losses), default=None),
        })
        print(f"Saved final checkpoint to {final_path}")

    results = {
        "save_root": save_root,
        "state": state,
        "model": model,
        "train_losses": train_losses,
        "eval_losses": eval_losses,
        "images_per_sec": timer.images_per_sec,
        "logger": logger,
        "parallel": parallel,
        "test_loader": test_loader,
        "train_loader": train_loader,
        "normalize": normalize,
        "rng": rng,
    }
    if resume_from:
        # a run preempted during the PRIOR stage left a last_prior next to
        # the VQ last_checkpoint (train/prior.py); hand it to train_prior
        # so `--resume` alone recovers both stages
        old_root = os.path.dirname(os.path.dirname(
            os.path.abspath(resume_from)))
        pr = os.path.join(ckpt_lib._prior_dir(
            old_root, getattr(args, "prior_type", "pixelcnn")), "last_prior")
        if os.path.exists(pr):
            results["prior_resume"] = pr
        # reuse the interrupted run's code cache too: extraction goes
        # through the AUGMENTING train loader (random flips, as in the
        # reference vq_codes_lmdb extraction), so a re-extract in the new
        # save_root would draw different augmentations and the resumed
        # prior would continue against a different code snapshot
        if os.path.isdir(os.path.join(old_root, "codes_cache")):
            results["prior_cache_root"] = old_root
    return results


def _write_figures(model, state, test_loader, rng, save_root, epoch, num_vis,
                   normalized, logger, step, train_ds=None, save=True):
    """Per-epoch sample + reconstruction figures, filenames as in the
    reference (main.py:1331-1366: epoch_NNNN_random_samples.pdf plus
    test/train reconstruction panels). ``save=False`` (non-main processes)
    runs the forwards — identical inputs on every process keep the
    global-mesh computation in lockstep — but skips file/logger IO."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    try:
        samples = model.apply(variables, num_vis, method="sample",
                              rngs={"sample": rng})
        if save:
            png = fig_lib.save_sample_grid(
                np.asarray(jax.device_get(samples)),
                os.path.join(save_root, "figures", "generated",
                             f"epoch_{epoch:04d}_random_samples.pdf"),
                normalized)
            logger.log_image("samples/generated", png, step=step)
    except Exception as e:  # pragma: no cover
        print(f"figure generation failed: {e}")

    def recon_panel(x_np, split):
        x = jnp.asarray(x_np[:num_vis])
        out = model.apply(variables, x, train=False,
                          rngs={"sample": rng, "dropout": rng})
        if not save:
            return
        png = fig_lib.save_reconstruction_panel(
            np.asarray(x), np.asarray(jax.device_get(out["recons"])),
            os.path.join(save_root, "figures", "reconstructed",
                         f"epoch_{epoch:04d}_{split}_samples.pdf"),
            normalized)
        logger.log_image(f"samples/reconstructed_{split}", png, step=step)

    try:
        # fetch only the rows the panel uses (a full test batch of 256px
        # floats costs ~100s of MB of host assembly per process per epoch)
        test_ds = test_loader.dataset
        imgs, _ = test_ds.get_batch(np.arange(min(num_vis, len(test_ds))))
        recon_panel(imgs, "test")
    except Exception as e:  # pragma: no cover
        print(f"test reconstruction figure failed: {e}")
    if train_ds is not None:
        try:
            imgs, _ = train_ds.get_batch(np.arange(min(num_vis,
                                                       len(train_ds))))
            recon_panel(imgs, "train")
        except Exception as e:  # pragma: no cover
            print(f"train reconstruction figure failed: {e}")

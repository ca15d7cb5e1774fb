"""The jitted train/eval steps: one compiled program per run.

This is where the reference's hot loop (/root/reference/main.py:125-235)
becomes a single pure function ``(state, batch, rng) -> (state, metrics)``:
forward, the multi-objective Jacobian + Gramian + aggregator solve, gradient
combination, clipping and the optimizer update are all fused by XLA. The
aggregation mode mirrors the reference dispatch (main.py:176-196):

  * aggregator "sum"/None  -> plain backward of total_loss;
  * ``feature_names`` set  -> torchjd ``mtl_backward`` semantics (feature
    Jacobian + trunk pullback);
  * ``feature_names`` None -> torchjd ``backward`` (full-param Jacobian).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

from movae_tpu.moo import aggregators as agg_lib
from movae_tpu.moo import engine
from movae_tpu.train.state import TrainState

Array = jax.Array


def _merge_collections(*colls) -> Dict:
    """Deep-merge flax mutable-collection updates (later wins)."""
    flat: Dict = {}
    for c in colls:
        if c:
            flat.update(traverse_util.flatten_dict(c))
    return traverse_util.unflatten_dict(flat) if flat else {}


def _rngs(rng: Array) -> Dict[str, Array]:
    k1, k2 = jax.random.split(rng)
    return {"sample": k1, "dropout": k2}


def preprocess_batch(x: Array, normalize: bool) -> Array:
    """Device-side input preprocessing: uint8 batches (shipped raw to keep
    the host->device transfer 4x smaller) are cast to float32 in [0,1] and
    optionally normalized to [-1,1] inside the compiled step. Float batches
    pass through untouched (the host already preprocessed them)."""
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) * ((1.0 / 127.5) if normalize
                                     else (1.0 / 255.0))
        if normalize:
            x = x - 1.0
    return x


def _codebook_usage(outputs: Dict[str, Any], num_embeddings: int) -> Optional[Array]:
    """Per-batch codebook usage %, from encoding indices (vq_vae.py:110-124).
    Handles single (``encoding_inds``) and hierarchical
    (``encoding_inds_top``/``_bottom``) layouts (main.py:311-330)."""
    from movae_tpu.ops.vq import used_codes_mask

    def pct(inds):
        used = used_codes_mask(inds, num_embeddings)
        return jnp.sum(used.astype(jnp.float32)) / num_embeddings * 100.0

    if outputs.get("encoding_inds") is not None:
        return pct(outputs["encoding_inds"])
    if (outputs.get("encoding_inds_top") is not None
            and outputs.get("encoding_inds_bottom") is not None):
        return 0.5 * (pct(outputs["encoding_inds_top"])
                      + pct(outputs["encoding_inds_bottom"]))
    return None


def make_train_step(
    model,
    agg_cfg: agg_lib.AggregatorConfig,
    total_epochs: int = 1,
    steps_per_epoch: int = 1,
    normalize_inputs: bool = False,
    guard_nonfinite: bool = True,
    remat: bool = False,
    grad_accum: int = 1,
):
    """Build the (un-jitted) train step for ``model`` under ``agg_cfg``.

    Callers jit it themselves (optionally with shardings — see
    movae_tpu.parallel.mesh).

    ``grad_accum > 1`` returns an ACCUMULATING step ``(state, batches, rng)``
    over a ``(A, B, ...)`` stack of A microbatches: each microbatch runs the
    full multi-objective machinery (its own Gramian + alpha — the semantics
    a torchjd user stepping every A batches would get; the reference itself
    has no accumulation, main.py:125-235), gradients are averaged across the
    A microbatches inside one ``lax.scan`` dispatch, and ONE optimizer
    update is applied. This is the memory lever for large effective batches
    at 256px (composes with --remat/--fsdp); metrics are microbatch means.
    """
    m = len(model.objective_names)
    if agg_cfg.is_sum:
        mode = "sum"
    elif model.feature_names is not None:
        mode = "feature"
    else:
        mode = "full"
    num_embeddings = getattr(model, "num_embeddings", 0)

    def apply_losses(params, batch_stats, x, rngs):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            method="forward_with_losses", mutable=["batch_stats"], rngs=rngs)
        return out, mut.get("batch_stats", {})

    if remat:
        # activation rematerialization for large-image configs (celeba-hq /
        # imagenet 256px): recompute the forward during the backward pass,
        # keeping only MXU outputs (jax.checkpoint 'dots' policy) — trades
        # ~1 extra forward of FLOPs for O(depth) less activation HBM.
        apply_losses = jax.checkpoint(
            apply_losses, static_argnums=(),
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    def compute_grads(params, bs, agg_state, step_ctr, batch: Array,
                      rng: Array):
        """One microbatch: forward + per-objective grads + aggregation.
        Returns ``(grads, new_bs, new_agg_state, metrics)`` without touching
        the optimizer — shared by the plain and accumulating steps."""
        x = preprocess_batch(batch, normalize_inputs)
        rng, agg_key = jax.random.split(rng)
        rngs = _rngs(rng)

        if mode == "sum":
            def loss_fn(p):
                (loss_vec, loss_dict, outputs), new_bs = apply_losses(
                    p, bs, x, rngs)
                return loss_dict["total_loss"], (loss_vec, loss_dict,
                                                 outputs, new_bs)

            grads, (loss_vec, loss_dict, outputs, new_bs) = jax.grad(
                loss_fn, has_aux=True)(params)
            alpha = jnp.ones((m,), jnp.float32)
            similarity = jnp.asarray(1.0, jnp.float32)
            new_agg_state = agg_state

        elif mode == "full":
            def loss_tuple_fn(p):
                (loss_vec, loss_dict, outputs), new_bs = apply_losses(
                    p, bs, x, rngs)
                # UNSTACKED per-objective scalars: the engine selects
                # loss_tuple[i] before any stack so each objective's
                # backward trace is exactly its dependency cone
                lt = tuple(loss_dict[k] for k in model.objective_names)
                return lt, (loss_dict, outputs, new_bs)

            loss_vec, (loss_dict, outputs, new_bs), J, G = engine.full_jacobian(
                loss_tuple_fn, params, m)
            beta = agg_lib.comfort_beta(
                agg_cfg, step_ctr // steps_per_epoch + 1, total_epochs)
            alpha, new_agg_state = agg_lib.compute_weights(
                agg_cfg, G, loss_vec, agg_key, agg_state, beta)
            grads = engine.combine(J, alpha)
            similarity = agg_lib.gradient_similarity(G, alpha)

        else:  # feature mode
            def trunk_fn(p):
                (features, t_aux), mut = model.apply(
                    {"params": p, "batch_stats": bs}, x, train=True,
                    method="trunk", mutable=["batch_stats"], rngs=rngs)
                return features, (t_aux, mut.get("batch_stats", {}))

            def heads_fn(p, features, trunk_aux):
                t_aux, trunk_bs = trunk_aux
                # heads must run on the trunk-UPDATED statistics: flax
                # returns the FULL mutable collection from apply, so running
                # the heads on the stale `bs` would hand back stale encoder
                # entries that win the later-keys-win merge below and erase
                # the trunk's BatchNorm running-stat updates for the step
                bs_after_trunk = _merge_collections(bs, trunk_bs)
                (loss_vec, loss_dict, outputs), mut = model.apply(
                    {"params": p, "batch_stats": bs_after_trunk}, features,
                    t_aux, x, train=True, method="heads_with_losses",
                    mutable=["batch_stats"], rngs=rngs)
                # unstacked scalars (see loss_tuple_fn note in full mode)
                lt = tuple(loss_dict[k] for k in model.objective_names)
                return lt, (loss_dict, outputs,
                            mut.get("batch_stats", {}))

            if remat:
                trunk_fn = jax.checkpoint(
                    trunk_fn, policy=jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable)
            fj = engine.FeatureJacobian(trunk_fn, heads_fn, params, m)
            loss_vec = fj.losses
            loss_dict, outputs, heads_bs = fj.heads_aux
            _, trunk_bs = fj.trunk_aux
            new_bs = _merge_collections(bs, trunk_bs, heads_bs)
            beta = agg_lib.comfort_beta(
                agg_cfg, step_ctr // steps_per_epoch + 1, total_epochs)
            alpha, new_agg_state = agg_lib.compute_weights(
                agg_cfg, fj.G, loss_vec, agg_key, agg_state, beta)
            grads = fj.grads(alpha)
            similarity = agg_lib.gradient_similarity(fj.G, alpha)

        if mode != "feature":
            new_bs = _merge_collections(bs, new_bs)

        metrics = {k: loss_dict[k] for k in model.objective_names}
        metrics["total_loss"] = loss_dict["total_loss"]
        for i in range(m):
            metrics[f"task_{i}_weight"] = alpha[i]
        metrics["gradient_similarity"] = similarity
        usage = _codebook_usage(outputs, num_embeddings)
        if usage is not None:
            metrics["codebook_usage_percentage"] = usage
        return grads, new_bs, new_agg_state, metrics

    def finish(state, grads, new_bs, new_agg_state, metrics, losses_ok):
        """Apply ONE optimizer update from (possibly accumulated) grads."""
        new_state = state.replace(
            batch_stats=new_bs, agg_state=new_agg_state
        ).apply_gradients(grads)

        if guard_nonfinite:
            # TPU-native equivalent of the reference's catch-and-skip-batch
            # fault handling (main.py:197-208): a non-finite loss or gradient
            # leaves the entire train state untouched for this step.
            ok = losses_ok
            for leaf in jax.tree_util.tree_leaves(grads):
                ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(leaf)))
            new_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_state, state)
            metrics["skipped_nonfinite"] = 1.0 - ok.astype(jnp.float32)
        return new_state, metrics

    if grad_accum <= 1:
        def train_step(state: TrainState, batch: Array, rng: Array
                       ) -> Tuple[TrainState, Dict[str, Array]]:
            grads, new_bs, new_agg_state, metrics = compute_grads(
                state.params, state.batch_stats, state.agg_state, state.step,
                batch, rng)
            return finish(state, grads, new_bs, new_agg_state, metrics,
                          jnp.isfinite(metrics["total_loss"]))

        return train_step

    inv = 1.0 / grad_accum

    def accum_step(state: TrainState, batches: Array, rng: Array
                   ) -> Tuple[TrainState, Dict[str, Array]]:
        """A microbatches -> averaged grads -> one update (see docstring)."""
        keys = jax.random.split(rng, grad_accum)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def body(carry, xs):
            bs_c, agg_c, acc, ok = carry
            xb, kb = xs
            # params and the step counter stay at the update's starting
            # values; batch_stats/agg_state advance sequentially through
            # the microbatches (the semantics of A independent torch steps)
            grads, new_bs, new_agg, mets = compute_grads(
                state.params, bs_c, agg_c, state.step, xb, kb)
            acc = jax.tree_util.tree_map(
                lambda a, g: a + inv * g.astype(a.dtype), acc, grads)
            ok = jnp.logical_and(ok, jnp.isfinite(mets["total_loss"]))
            return (new_bs, new_agg, acc, ok), mets

        carry0 = (state.batch_stats, state.agg_state, zeros,
                  jnp.asarray(True))
        (new_bs, new_agg, acc, ok), mets = jax.lax.scan(
            body, carry0, (batches, keys))
        metrics = jax.tree_util.tree_map(lambda v: jnp.mean(v, axis=0), mets)
        return finish(state, acc, new_bs, new_agg, metrics, ok)

    return accum_step


def make_scanned_train_step(step_fn, k: int):
    """Fuse ``k`` sequential train steps into ONE device dispatch via
    ``lax.scan`` over a (k, B, ...) stacked batch.

    Small per-chip batches are dispatch-latency bound (BENCH.md: bs 128
    runs at ~55% of bs-256 throughput because the device finishes before
    the host can enqueue the next step); scanning k steps amortizes one
    dispatch + one host round-trip over k optimizer updates with identical
    numerics (each inner step consumes its own batch and rng).

    Returns ``(state, metrics)`` where every metrics leaf is stacked with
    a leading (k,) axis — one entry per inner step, in execution order.
    """
    def scanned(state: TrainState, batches: Array, rng: Array):
        keys = jax.random.split(rng, k)

        def body(st, xs):
            xb, kb = xs
            st, met = step_fn(st, xb, kb)
            return st, met

        return jax.lax.scan(body, state, (batches, keys))

    return scanned


def make_eval_step(model, normalize_inputs: bool = False):
    """Eval step: losses (+ codebook used-mask for exact usage accumulation
    across batches, reference main.py:261-331)."""
    num_embeddings = getattr(model, "num_embeddings", 0)

    def eval_step(params, batch_stats, batch: Array, rng: Array):
        batch = preprocess_batch(batch, normalize_inputs)
        (loss_vec, loss_dict, outputs) = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch,
            train=False, method="forward_with_losses", rngs=_rngs(rng))
        metrics = {k: loss_dict[k] for k in model.objective_names}
        metrics["total_loss"] = loss_dict["total_loss"]
        from movae_tpu.ops.vq import used_codes_mask

        extras = {}
        if outputs.get("encoding_inds") is not None:
            extras["used_mask"] = used_codes_mask(
                outputs["encoding_inds"], num_embeddings)
        if (outputs.get("encoding_inds_top") is not None
                and outputs.get("encoding_inds_bottom") is not None):
            for side in ("top", "bottom"):
                extras[f"used_mask_{side}"] = used_codes_mask(
                    outputs[f"encoding_inds_{side}"], num_embeddings)
        return metrics, extras, outputs

    return eval_step

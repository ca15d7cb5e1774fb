"""GPipe-style pipeline parallelism for the prior stage (all four prior
types: PixelCNN, PixelSNAIL, and both hierarchical variants).

The reference prior trainer is strictly single-device
(/root/reference/main.py:890-1051); this module adds a TPU-native scaling
axis it has no counterpart for: the homogeneous block stack is split into S
stages over a ``pipe`` mesh axis, and microbatches flow through the stages
with ``lax.ppermute`` moving activations stage-to-stage over ICI (the
"pipelining via collective permute" recipe — shard_map + ppermute + a
tick scan; the backward pipeline falls out of autodiff, since ppermute's
transpose is the reverse permute and the tick scan's transpose is the
reverse-order scan).

Design notes
------------
* **At-rest layout**: the per-block parameter subtrees (``block_0`` ..
  ``block_{N-1}``) are stacked onto a leading block axis
  (:func:`stack_block_params`) and sharded ``P('pipe')`` over it — each
  stage holds only its N/S blocks, and the optimizer moments inherit the
  same layout (``tx.init`` runs on the placed params). Checkpoints stay in
  the reference-compatible unstacked layout via
  :func:`unstack_block_params` at save/load boundaries.
* **Stage function**: each device scans its local (N/S, ...) block slice —
  the blocks are homogeneous, so a ``lax.scan`` over the stacked leaves
  compiles ONE block body per stage regardless of depth.
* **Prologue/epilogue**: the embedding + position encoding + masked conv_in
  run data-parallel (GSPMD) outside the pipeline — they are a tiny fraction
  of the FLOPs — while the output heads + cross-entropy are folded into the
  last stage's tick so only *scalars* leave the pipeline (no activation
  all-reduce over 'pipe').
* **Schedule**: plain GPipe fill-drain over ``M`` microbatches:
  utilization M/(M+S-1); choose M >= 2S (``default_microbatches``).
* Composition: pipeline ∘ data parallelism. Tensor ('model') and sequence
  ('seq') parallelism are asserted off — the block stack runs *inside*
  shard_map, where the GSPMD tp annotations and the ring-attention
  shard_map cannot apply.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BLOCKS_KEY = "blocks_stacked"


def _block_names(params: Dict[str, Any], prefix: str):
    names = [k for k in params
             if k.startswith(prefix) and k[len(prefix):].isdigit()]
    return sorted(names, key=lambda k: int(k[len(prefix):]))


def block_prefix(prior) -> str:
    """Per-block param-subtree prefix for a pipelineable prior module:
    PixelSNAIL names its stack 'block_i', PixelCNN 'res_i'."""
    from movae_tpu.models.pixelcnn import PixelSNAIL

    return "block_" if isinstance(prior, PixelSNAIL) else "res_"


def stack_block_params(params: Dict[str, Any],
                       prefix: str = "block_") -> Dict[str, Any]:
    """{'<prefix>0': t0, ..} -> {BLOCKS_KEY: stacked}; other keys unchanged.

    The stacked subtree's leaves gain a leading block axis (N, ...) — the
    axis :func:`pp_param_shardings` splits over 'pipe'."""
    names = _block_names(params, prefix)
    if not names:
        return dict(params)
    out = {k: v for k, v in params.items() if k not in names}
    out[BLOCKS_KEY] = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[params[k] for k in names])
    return out


def unstack_block_params(params: Dict[str, Any],
                         prefix: str = "block_") -> Dict[str, Any]:
    """Inverse of :func:`stack_block_params` (checkpoint layout)."""
    if BLOCKS_KEY not in params:
        return dict(params)
    out = {k: v for k, v in params.items() if k != BLOCKS_KEY}
    stacked = params[BLOCKS_KEY]
    n = int(jax.tree_util.tree_leaves(stacked)[0].shape[0])
    for i in range(n):
        out[f"{prefix}{i}"] = jax.tree_util.tree_map(lambda x, i=i: x[i],
                                                     stacked)
    return out


def pp_param_shardings(params: Dict[str, Any], mesh: Mesh,
                       axis: str = "pipe") -> Dict[str, Any]:
    """Stacked blocks: leading axis over 'pipe'; everything else replicated.
    Works at any nesting depth (hierarchical priors stack their
    ``prior_top``/``prior_bottom`` subtrees independently)."""
    repl = NamedSharding(mesh, P())
    piped = NamedSharding(mesh, P(axis))

    def pick(path, _leaf):
        keys = {getattr(p, "key", None) for p in path}
        return piped if BLOCKS_KEY in keys else repl

    return jax.tree_util.tree_map_with_path(pick, params)


def shard_pp_params(params: Dict[str, Any], mesh: Mesh,
                    axis: str = "pipe") -> Dict[str, Any]:
    return jax.device_put(params, pp_param_shardings(params, mesh, axis))


def default_microbatches(local_batch: int, num_stages: int) -> int:
    """Largest divisor of the per-data-shard batch that is <= 2*S (GPipe
    wants M >= S for utilization; beyond ~2S the per-microbatch work gets
    too small to feed the MXU)."""
    target = max(1, 2 * num_stages)
    for m in range(min(target, local_batch), 0, -1):
        if local_batch % m == 0:
            return m
    return 1


def make_pipelined_prior_loss(prior, mesh: Mesh, num_microbatches: int,
                              train: bool = True, axis: str = "pipe",
                              data_axis: str = "data", remat: bool = True):
    """loss_fn(params_stacked, z, rng) -> {'total_loss': scalar} running
    ``prior`` (a :class:`movae_tpu.models.pixelcnn.PixelSNAIL` or
    :class:`~movae_tpu.models.pixelcnn.PixelCNN`) with its homogeneous
    block stack pipelined over the mesh's ``pipe`` axis.

    Numerics match ``prior.apply(..., method='loss_function')`` exactly at
    dropout=0 (tested); with dropout the rng *stream assignment* differs
    (keys are folded per (data-shard, tick, stage, block) so each stage
    draws independently) but the regularizer semantics are identical.
    """
    import flax.linen as nn

    from movae_tpu.models.pixelcnn import (
        GatedResBlock,
        GatherEmbed,
        MaskedConv,
        PixelCNN,
        PixelSNAIL,
        PixelSNAILBlock,
        _pos_encoding,
    )
    from movae_tpu.objectives import integer_cross_entropy
    from movae_tpu.parallel.context import get_context_parallel

    S = int(mesh.shape[axis])
    M = int(num_microbatches)
    if isinstance(prior, PixelSNAIL):
        num_blocks = prior.num_blocks
        use_dropout = bool(train) and prior.dropout > 0.0
        blk = PixelSNAILBlock(prior.hidden_channels,
                              prior.num_res_blocks_per_layer,
                              prior.num_heads, prior.dropout,
                              dtype=prior.dtype)

        def block_step(bp, h, key):
            # PixelSNAIL.__call__: outer residual around each block
            rngs = {"dropout": key} if use_dropout else None
            return h + blk.apply({"params": bp}, h, train=train, rngs=rngs)

        use_pos = True
    elif isinstance(prior, PixelCNN):
        num_blocks = prior.num_layers
        blk = GatedResBlock(prior.hidden_channels, dtype=prior.dtype)

        def block_step(bp, h, key):
            # PixelCNN.__call__: GatedResBlock carries its own residual
            return blk.apply({"params": bp}, h)

        use_pos = False
    else:
        raise TypeError(f"pipeline parallelism supports PixelSNAIL/PixelCNN "
                        f"priors, got {type(prior).__name__}")
    if num_blocks % S:
        raise ValueError(f"{num_blocks} blocks must divide into "
                         f"pipeline stages ({S})")
    if int(mesh.shape.get("model", 1)) > 1 or int(
            mesh.shape.get("seq", 1)) > 1:
        raise ValueError("pipeline parallelism composes with 'data' only: "
                         "set model_partitions=1 and context_parallel=1")
    n_local = num_blocks // S
    dp = int(mesh.shape[data_axis])

    emb = GatherEmbed(prior.num_embeddings, prior.embedding_dim)
    conv_in = MaskedConv(prior.hidden_channels,
                         (prior.kernel_size, prior.kernel_size), "A",
                         dtype=prior.dtype)
    out1 = nn.Conv(prior.hidden_channels, (1, 1), dtype=prior.dtype)
    out2 = nn.Conv(prior.num_embeddings, (1, 1), dtype=prior.dtype)

    if remat:
        block_step = jax.checkpoint(block_step)

    def per_device(local_blocks, head_p, h, z, key):
        # h: (Bl, H, W, C) local activations; z: (Bl, H, W) local labels
        s = jax.lax.axis_index(axis)
        # distinct dropout stream per data shard (each shard holds different
        # samples); per-tick and per-stage folds happen in tick()/stage()
        key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        bl = h.shape[0]
        if bl % M:
            raise ValueError(f"per-shard batch {bl} not divisible by "
                             f"num_microbatches={M}")
        mb = bl // M
        micro = h.reshape(M, mb, *h.shape[1:])
        labels = z.reshape(M, mb, *z.shape[1:])

        def stage(x, key):
            keys = jax.random.split(key, n_local)

            def body(h, xs):
                bp, kk = xs
                return block_step(bp, h, kk), None

            x, _ = jax.lax.scan(body, x, (local_blocks, keys))
            return x

        def tick(state, t):
            inj = jax.lax.dynamic_index_in_dim(micro, jnp.minimum(t, M - 1),
                                               0, keepdims=False)
            x = jnp.where(s == 0, inj, state)
            x = stage(x, jax.random.fold_in(jax.random.fold_in(key, t), s))
            # last stage finishes microbatch t-(S-1) this tick: heads + CE
            # (scalars only cross the pipeline boundary)
            hh = nn.relu(out1.apply({"params": head_p["out1"]}, nn.relu(x)))
            logits = out2.apply({"params": head_p["out2"]},
                                hh).astype(jnp.float32)
            li = jnp.clip(t - (S - 1), 0, M - 1)
            lab = jax.lax.dynamic_index_in_dim(labels, li, 0, keepdims=False)
            ce = integer_cross_entropy(
                logits.reshape(-1, prior.num_embeddings), lab.reshape(-1))
            contrib = jnp.where((t >= S - 1) & (s == S - 1), ce, 0.0)
            nxt = jax.lax.ppermute(x, axis,
                                   [(i, (i + 1) % S) for i in range(S)])
            return nxt, contrib

        _, contribs = jax.lax.scan(tick, jnp.zeros_like(micro[0]),
                                   jnp.arange(M + S - 1))
        # per-shard mean CE (equal-size microbatches: mean of means), then
        # broadcast from the last stage and average the data shards
        loss = jax.lax.psum(contribs.sum() / M, axis)
        return jax.lax.pmean(loss, data_axis)

    pipelined = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), P(), P(data_axis), P(data_axis), P()),
        out_specs=P(), check_vma=False)

    def loss_fn(params, z, rng=None, condition=None):
        if (condition is None) != (prior.conditional_channels == 0):
            raise ValueError("condition must be passed iff the prior has "
                             "conditional_channels")
        if get_context_parallel() is not None and get_context_parallel(
        ).size > 1:
            raise ValueError("pipeline and context parallelism are exclusive")
        b, hh, ww = z.shape
        if b % (dp * M):
            raise ValueError(f"batch {b} must divide by data_parallel*"
                             f"microbatches ({dp}*{M})")
        # prologue (data-parallel via GSPMD, tiny vs the block stack) —
        # mirrors PixelSNAIL/PixelCNN.__call__ (models/pixelcnn.py),
        # including the pos-then-condition concat order
        h = emb.apply({"params": params["embedding"]}, z)
        if use_pos:
            pos = jnp.broadcast_to(jnp.asarray(_pos_encoding(hh, ww)),
                                   (b, hh, ww, 2)).astype(h.dtype)
            h = jnp.concatenate([h, pos], axis=-1)
        if condition is not None:
            h = jnp.concatenate([h, condition.astype(h.dtype)], axis=-1)
        h = conv_in.apply({"params": params["conv_in"]}, h)
        head_p = {"out1": params["out1"], "out2": params["out2"]}
        key = rng if rng is not None else jax.random.PRNGKey(0)
        loss = pipelined(params[BLOCKS_KEY], head_p, h, z, key)
        return {"total_loss": loss}

    return loss_fn


# original (PixelSNAIL-only) entry-point name, kept as an alias
make_pipelined_snail_loss = make_pipelined_prior_loss


def _is_hierarchical(prior) -> bool:
    return hasattr(prior, "make_top_module")


def stack_prior_params(prior, params: Dict[str, Any]) -> Dict[str, Any]:
    """Stack the pipelineable block subtree(s) of ``prior``'s param tree:
    the root stack for flat priors; ``prior_top``/``prior_bottom``
    independently for hierarchical ones."""
    if _is_hierarchical(prior):
        out = dict(params)
        out["prior_top"] = stack_block_params(
            dict(params["prior_top"]), block_prefix(prior.make_top_module()))
        out["prior_bottom"] = stack_block_params(
            dict(params["prior_bottom"]),
            block_prefix(prior.make_bottom_module()))
        return out
    return stack_block_params(params, block_prefix(prior))


def unstack_prior_params(prior, params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`stack_prior_params` (checkpoint/sampler layout)."""
    if _is_hierarchical(prior):
        out = dict(params)
        out["prior_top"] = unstack_block_params(
            dict(params["prior_top"]), block_prefix(prior.make_top_module()))
        out["prior_bottom"] = unstack_block_params(
            dict(params["prior_bottom"]),
            block_prefix(prior.make_bottom_module()))
        return out
    return unstack_block_params(params, block_prefix(prior))


def make_pipelined_hierarchical_loss(prior, mesh: Mesh,
                                     num_microbatches: int,
                                     train: bool = True, axis: str = "pipe",
                                     data_axis: str = "data",
                                     remat: bool = True):
    """loss_fn(params_stacked, z_top, z_bottom, rng) for
    HierarchicalPixelCNN/HierarchicalPixelSNAIL with BOTH level stacks
    pipelined over 'pipe' (sequentially: the top pipeline drains, then the
    bottom one fills — each level is its own fill/drain schedule). The
    conditioning path (embedding_top -> upsample_top -> bottom concat) runs
    data-parallel in the prologue, exactly as in
    models/pixelcnn.py condition_from_top."""
    import flax.linen as nn

    from movae_tpu.models.pixelcnn import GatherEmbed

    top = prior.make_top_module()
    bottom = prior.make_bottom_module()
    top_loss = make_pipelined_prior_loss(top, mesh, num_microbatches,
                                         train=train, axis=axis,
                                         data_axis=data_axis, remat=remat)
    bottom_loss = make_pipelined_prior_loss(bottom, mesh, num_microbatches,
                                            train=train, axis=axis,
                                            data_axis=data_axis, remat=remat)
    emb_top = GatherEmbed(prior.num_embeddings, prior.embedding_dim)
    upsample_top = nn.ConvTranspose(prior.embedding_dim, (4, 4),
                                    strides=(2, 2), padding="SAME",
                                    dtype=prior.dtype)

    def loss_fn(params, z_top, z_bottom, rng=None):
        cond = upsample_top.apply(
            {"params": params["upsample_top"]},
            emb_top.apply({"params": params["embedding_top"]}, z_top))
        key = rng if rng is not None else jax.random.PRNGKey(0)
        lt = top_loss(params["prior_top"], z_top,
                      jax.random.fold_in(key, 0))["total_loss"]
        lb = bottom_loss(params["prior_bottom"], z_bottom,
                         jax.random.fold_in(key, 1),
                         condition=cond)["total_loss"]
        return {"loss_top": lt, "loss_bottom": lb, "total_loss": lt + lb}

    return loss_fn

"""Causal attention for the PixelSNAIL prior — memory-scalable paths.

The reference materializes the full L x L attention matrix with a cached
tril mask (/root/reference/models/pixelcnn_prior.py:109-132, 16-22). For
ImageNet/CelebA-HQ bottom codes L = (size/4)^2 = 4096, so B*heads*L^2 floats
— tens of GB at training batch sizes. This module provides:

  * ``flash`` — the stock Pallas TPU flash-attention kernel
    (jax.experimental.pallas.ops.tpu.flash_attention) when running on TPU;
    sequences are zero-padded up to the kernel's 128-row tiling and the pad
    rows sliced off (causality keeps pad keys out of every real query);
  * ``blockwise`` — an O(L * block) online-softmax scan over query blocks
    (works on any backend and head dim, rematerialized in the backward pass
    via jax.checkpoint);
  * ``dense`` — the reference O(L^2) semantics, used for small L and as the
    test oracle.

All paths use an inclusive-diagonal causal mask (position i attends to
0..i), matching the reference (pixelcnn_prior.py:17-22).

Written blockwise so context-parallel sharding over the sequence axis is a
mesh-axis annotation, not a rewrite (SURVEY.md §5).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

Array = jax.Array


def dense_causal_attention(q: Array, k: Array, v: Array,
                           sm_scale: float) -> Array:
    """Reference O(L^2) path. q,k,v: (B, H, L, D)."""
    L = q.shape[2]
    logits = jnp.einsum("bhld,bhmd->bhlm", q, k) * sm_scale
    mask = jnp.tril(jnp.ones((L, L), bool))
    logits = jnp.where(mask[None, None], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhlm,bhmd->bhld", probs, v)


def blockwise_causal_attention(q: Array, k: Array, v: Array, sm_scale: float,
                               block_q: int = 256) -> Array:
    """Online-softmax scan over query blocks; peak memory O(bq * L) per
    block instead of O(L^2), rematerialized on backward."""
    b, h, L, d = q.shape
    bq = min(block_q, L)
    if L % bq:
        # fall back to dense for ragged tiny sequences
        return dense_causal_attention(q, k, v, sm_scale)
    nblocks = L // bq
    qb = q.reshape(b, h, nblocks, bq, d).transpose(2, 0, 1, 3, 4)
    base = jnp.arange(L)

    @jax.checkpoint
    def one_block(args):
        qi, block_idx = args
        # keys up to the end of this query block matter; mask inside
        logits = jnp.einsum("bhld,bhmd->bhlm", qi, k) * sm_scale
        qpos = block_idx * bq + jnp.arange(bq)
        mask = base[None, :] <= qpos[:, None]          # (bq, L) inclusive
        logits = jnp.where(mask[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhlm,bhmd->bhld", probs, v)

    def scan_fn(_, x):
        qi, idx = x
        return None, one_block((qi, idx))

    _, out = jax.lax.scan(scan_fn, None,
                          (qb, jnp.arange(nblocks)))
    return out.transpose(1, 2, 0, 3, 4).reshape(b, h, L, d)


def _flash_ok(q: Array) -> bool:
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
    # the stock kernel handles small head dims by padding (validated on v5e
    # at d=16/64/128, L=4096: fwd+bwd ~68x faster than the rematerialized
    # blockwise scan — the fused backward kernel is the win); escape hatch
    # via MOVAE_NO_FLASH=1.
    return on_tpu and os.environ.get("MOVAE_NO_FLASH") != "1"


def causal_attention(q: Array, k: Array, v: Array, sm_scale: float,
                     dense_threshold: int = 1024) -> Array:
    """Dispatch: ring (sequence-parallel) attention when a context-parallel
    config is installed (movae_tpu.parallel.context), dense for small L
    (cheapest to fuse), flash kernel on TPU (fastest trainable path at long
    L), blockwise scan otherwise (CPU fallback / test oracle)."""
    from movae_tpu.parallel.context import get_context_parallel
    ctx = get_context_parallel()
    if ctx is not None and ctx.size > 1:
        from movae_tpu.ops.ring_attention import ring_causal_attention
        return ring_causal_attention(q, k, v, sm_scale, ctx.mesh,
                                     ctx.seq_axis, ctx.batch_axis,
                                     ctx.head_axis)
    L = q.shape[2]
    if L <= dense_threshold:
        return dense_causal_attention(q, k, v, sm_scale)
    if _flash_ok(q):
        from jax.experimental.pallas.ops.tpu import flash_attention as fa
        # pad L up to the kernel's 128-row tiling (e.g. a 40x40 code grid,
        # L=1600 -> 1664). Pad keys sit strictly in the future of every real
        # query, so causal masking keeps them out of real outputs; pad query
        # rows are sliced off (their cotangents are zero in the backward).
        Lp = -(-L // 128) * 128
        if Lp != L:
            pad = ((0, 0), (0, 0), (0, Lp - L), (0, 0))
            out = fa.flash_attention(jnp.pad(q, pad), jnp.pad(k, pad),
                                     jnp.pad(v, pad), causal=True,
                                     sm_scale=sm_scale)
            return out[:, :, :L]
        return fa.flash_attention(q, k, v, causal=True, sm_scale=sm_scale)
    return blockwise_causal_attention(q, k, v, sm_scale)

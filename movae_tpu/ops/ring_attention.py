"""Ring (sequence-parallel) causal attention over a mesh axis.

Context parallelism for long-sequence prior training: the raster sequence
axis L of the PixelSNAIL attention (reference
/root/reference/models/pixelcnn_prior.py:109-132, which materializes the
full L x L matrix on ONE device) is sharded over a ``seq`` mesh axis. Each
device holds an L/S chunk of Q/K/V; K/V chunks rotate around the ring with
``jax.lax.ppermute`` while every device accumulates its queries' attention
over the passing keys with an online (streaming) softmax — the standard
ring-attention decomposition. Peak memory per device is O(L/S * L/S) for
the block logits instead of O(L^2), and the K/V traffic rides the ICI ring
(each step moves only the neighbouring chunk).

Two chunk layouts are implemented:

* ``zigzag=True`` (default): the sequence is split into 2S stripes and
  device ``d`` holds the pair (stripe ``d``, stripe ``2S-1-d``) — the
  standard zigzag/striped layout. Causal coverage then decomposes into
  per-step FULL (unmasked) stripe products: each ring step needs exactly
  two Lc x Lc blocks (the back stripe always attends the arriving front
  stripe; a ``lax.cond`` on ``src < d`` picks whether the front stripe
  consumes the arriving front stripe or the back stripe consumes the
  arriving back stripe), and only the s=0 diagonal step applies an
  intra-stripe tril mask. Total compute L^2/(2S) per device — half of the
  contiguous layout — and perfectly balanced across the ring.
* ``zigzag=False``: contiguous chunking; chunk ``i`` only has work for
  source chunks ``j <= i``, so later ring steps are fully masked on early
  devices (the well-known causal load imbalance — kept as the simpler
  reference implementation and test oracle for the zigzag path).

Differentiable by construction: the ring is a ``lax.scan`` whose body is
``jax.checkpoint``-ed (block logits/probs are rematerialized in the
backward), and the transpose of ``ppermute`` is the reverse rotation —
reverse-mode AD yields the standard ring-attention backward (dK/dV
accumulate while circulating the opposite way) without a custom VJP.

Numerics: logits/softmax/accumulators in float32 regardless of input dtype
(matching ops/attention.py's flash path); outputs cast back to the input
dtype. Equality vs the dense oracle is tested to 1e-5 (f32) in
tests/test_ring_attention.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array

_NEG = -1e30  # masked-logit fill; -inf would NaN through exp(m - m) at init


def _make_seq_permute(idx: np.ndarray, inv_idx: np.ndarray):
    """Gather-only static permutation along axis 2. ``jnp.take``'s VJP is a
    scatter-add, which XLA:TPU serializes per update (the repo's hot paths
    are scatter-free by design — see ops/vq.py gather_rows); since the
    permutation is a static bijection its transpose is just the inverse
    gather, so the custom VJP keeps the zigzag remap (and the whole ring
    backward) scatter-free."""
    idx = jnp.asarray(idx)
    inv_idx = jnp.asarray(inv_idx)

    @jax.custom_vjp
    def permute(x):
        return jnp.take(x, idx, axis=2)

    def fwd(x):
        return permute(x), None

    def bwd(_, ct):
        return (jnp.take(ct, inv_idx, axis=2),)

    permute.defvjp(fwd, bwd)
    return permute


def _softmax_block_update(o, m, l, qf, kc, vc, sm_scale, mask=None):
    """One online-softmax accumulator update with key/value block (kc, vc).
    o/m/l: f32 accumulators; qf: f32 queries. mask=None means the block is
    known fully visible (zigzag full-stripe products)."""
    logits = jax.lax.dot_general(
        qf, kc.astype(jnp.float32),
        (((3,), (3,)), ((0, 1), (0, 1)))) * sm_scale
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG)
    m_new = jnp.maximum(m, logits.max(axis=-1))
    p = jnp.exp(logits - m_new[..., None])
    corr = jnp.exp(m - m_new)
    l_new = l * corr + p.sum(axis=-1)
    o_new = o * corr[..., None] + jax.lax.dot_general(
        p, vc.astype(jnp.float32), (((3,), (2,)), ((0, 1), (0, 1))))
    return o_new, m_new, l_new


def _ring_body(seq_axis: str, S: int, sm_scale: float, ql, kl, vl):
    """Per-device contiguous-chunk ring loop. ql/kl/vl: (B, H, Lc, D).
    The s=0 diagonal (intra-chunk causal) is hoisted before the scan so
    only S-1 rotations run — the final chunk never needs to travel."""
    idx = jax.lax.axis_index(seq_axis)
    b, h, Lc, d = ql.shape
    qpos = idx * Lc + jnp.arange(Lc)  # global positions of my queries
    qf = ql.astype(jnp.float32)
    perm = [(i, (i + 1) % S) for i in range(S)]
    upd = jax.checkpoint(partial(_softmax_block_update, sm_scale=sm_scale))

    tril = jnp.tril(jnp.ones((Lc, Lc), bool))[None, None]
    acc = upd(jnp.zeros((b, h, Lc, d), jnp.float32),
              jnp.full((b, h, Lc), _NEG, jnp.float32),
              jnp.zeros((b, h, Lc), jnp.float32),
              qf, kl, vl, mask=tril)

    def step(carry, s):
        o, m, l, kc, vc = carry
        kc = jax.lax.ppermute(kc, seq_axis, perm)
        vc = jax.lax.ppermute(vc, seq_axis, perm)
        src = (idx - s) % S  # after s rotations I hold chunk idx-s
        kpos = src * Lc + jnp.arange(Lc)
        # fully-masked blocks (src chunk entirely in my future): every
        # logit is _NEG, p underflows to 0 and the correction is exp(0)=1
        mask = (kpos[None, :] <= qpos[:, None])[None, None]
        o, m, l = upd(o, m, l, qf, kc, vc, mask=mask)
        return (o, m, l, kc, vc), None

    if S > 1:
        (o, m, l, _, _), _ = jax.lax.scan(step, acc + (kl, vl),
                                          jnp.arange(1, S))
    else:
        o, m, l = acc
    # every query attends at least to itself (the hoisted diagonal), so
    # l > 0 — except for pad rows, which are sliced off by the caller;
    # guard them against 0/0 anyway
    return (o / jnp.maximum(l, 1e-30)[..., None]).astype(ql.dtype)


def _zigzag_body(seq_axis: str, S: int, sm_scale: float, ql, kl, vl):
    """Zigzag ring loop. Local chunks are stripe pairs: ql = [qA; qB] with
    qA = stripe d, qB = stripe 2S-1-d (B, H, 2*Lc, D). All cross-stripe
    products are either fully visible or fully masked (skipped); only the
    s=0 diagonal applies the intra-stripe tril. Pad rows (the caller pads L
    to a multiple of 2S) occupy the highest stripes/intra-stripe tails, so
    strict-< stripe products never feed pad keys to real queries."""
    idx = jax.lax.axis_index(seq_axis)
    b, h, L2, d_ = ql.shape
    Lc = L2 // 2
    qf = ql.astype(jnp.float32)
    qA, qB = qf[:, :, :Lc], qf[:, :, Lc:]
    perm = [(i, (i + 1) % S) for i in range(S)]
    tril = jnp.tril(jnp.ones((Lc, Lc), bool))[None, None]

    upd = jax.checkpoint(partial(_softmax_block_update, sm_scale=sm_scale))

    def zeros():
        return (jnp.zeros((b, h, Lc, d_), jnp.float32),
                jnp.full((b, h, Lc), _NEG, jnp.float32),
                jnp.zeros((b, h, Lc), jnp.float32))

    # s=0 diagonal: my own stripe pair
    kA0, kB0 = kl[:, :, :Lc], kl[:, :, Lc:]
    vA0, vB0 = vl[:, :, :Lc], vl[:, :, Lc:]
    accA = upd(*zeros(), qA, kA0, vA0, mask=tril)     # stripe d, causal
    accB = upd(*zeros(), qB, kB0, vB0, mask=tril)     # stripe 2S-1-d, causal
    accB = upd(*accB, qB, kA0, vA0)                   # back always sees front

    def step(carry, s):
        accA, accB, kc, vc = carry
        kc = jax.lax.ppermute(kc, seq_axis, perm)
        vc = jax.lax.ppermute(vc, seq_axis, perm)
        src = (idx - s) % S
        kA, kB = kc[:, :, :Lc], kc[:, :, Lc:]
        vA, vB = vc[:, :, :Lc], vc[:, :, Lc:]
        accB = upd(*accB, qB, kA, vA)  # stripe 2S-1-d > stripe src, always
        accA, accB = jax.lax.cond(
            src < idx,
            # stripe src < stripe d: front stripe consumes arriving front
            lambda a, b_, kA, vA, kB, vB: (upd(*a, qA, kA, vA), b_),
            # stripe 2S-1-src < stripe 2S-1-d: back consumes arriving back
            lambda a, b_, kA, vA, kB, vB: (a, upd(*b_, qB, kB, vB)),
            accA, accB, kA, vA, kB, vB)
        return (accA, accB, kc, vc), None

    if S > 1:
        (accA, accB, _, _), _ = jax.lax.scan(
            step, (accA, accB, kl, vl), jnp.arange(1, S))
    out = jnp.concatenate(
        [accA[0] / jnp.maximum(accA[2], 1e-30)[..., None],
         accB[0] / jnp.maximum(accB[2], 1e-30)[..., None]], axis=2)
    return out.astype(ql.dtype)


def ring_causal_attention(q: Array, k: Array, v: Array, sm_scale: float,
                          mesh: Mesh, seq_axis: str = "seq",
                          batch_axis: Optional[str] = "data",
                          head_axis: Optional[str] = None,
                          zigzag: bool = True) -> Array:
    """Causal attention with the sequence axis sharded over ``seq_axis``.

    q, k, v: (B, H, L, D) global arrays (under jit, GSPMD-global). L is
    zero-padded up to a multiple of the ring size; pad keys sit strictly in
    the future of every real query so causality masks them out, and pad
    query rows are sliced off (their cotangents are zero in the backward —
    same trick as the flash-kernel padding in ops/attention.py).

    ``batch_axis``/``head_axis`` optionally map B/H onto mesh axes so ring
    sequence-parallelism composes with data parallelism and tensor-parallel
    (per-head) attention; pass None for replicated dims.
    """
    S = int(mesh.shape[seq_axis])
    if S == 1:
        from movae_tpu.ops.attention import dense_causal_attention
        return dense_causal_attention(q, k, v, sm_scale)
    # shard_map needs every mapped axis to divide evenly; small traces
    # (module init, ragged figure batches) fall back to replicating that
    # dim instead of failing — a trace-time (static-shape) decision
    if batch_axis is not None and q.shape[0] % int(mesh.shape[batch_axis]):
        batch_axis = None
    if head_axis is not None and q.shape[1] % int(mesh.shape[head_axis]):
        head_axis = None
    L = q.shape[2]
    stripes = 2 * S if zigzag else S
    Lp = -(-L // stripes) * stripes
    if Lp != L:
        pad = ((0, 0), (0, 0), (0, Lp - L), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    if zigzag:
        # remap raster order -> stripe pairs so contiguous sharding gives
        # device d the pair (stripe d, stripe 2S-1-d); static permutation,
        # inverted on the output (gather-only in both directions)
        Lc = Lp // stripes
        order = [c for d in range(S) for c in (d, stripes - 1 - d)]
        fwd = np.concatenate([np.arange(c * Lc, (c + 1) * Lc)
                              for c in order])
        inv = np.argsort(fwd)
        to_stripes = _make_seq_permute(fwd, inv)
        from_stripes = _make_seq_permute(inv, fwd)
        q, k, v = to_stripes(q), to_stripes(k), to_stripes(v)
        body = partial(_zigzag_body, seq_axis, S, sm_scale)
    else:
        body = partial(_ring_body, seq_axis, S, sm_scale)
    spec = P(batch_axis, head_axis, seq_axis, None)
    fn = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    out = fn(q, k, v)
    if zigzag:
        out = from_stripes(out)
    return out[:, :, :L] if Lp != L else out

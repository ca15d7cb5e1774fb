"""Trace-time context-parallel configuration.

The PixelSNAIL attention modules are built by the model registry with no
knowledge of the device mesh; plumbing a mesh through every module
signature (and through the KV-cache samplers, which never use it) would be
invasive. Instead the prior trainer installs a :class:`ContextParallel`
here for the duration of step tracing, and ``ops.attention.causal_attention``
consults it: when set, long-sequence attention dispatches to the ring
(sequence-parallel) path in ``ops/ring_attention.py`` instead of the
single-device flash/blockwise paths.

This is trace-time state (like jax.config flags): it only affects which
program gets staged out, never runtime values.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional

from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class ContextParallel:
    mesh: Mesh
    seq_axis: str = "seq"
    batch_axis: Optional[str] = "data"
    head_axis: Optional[str] = None

    @property
    def size(self) -> int:
        return int(self.mesh.shape[self.seq_axis])


_current: Optional[ContextParallel] = None


def get_context_parallel() -> Optional[ContextParallel]:
    """The active config, or None (single-device attention paths)."""
    return _current


def seq_shard_spatial(h):
    """Constrain (B, H, W, C) prior-trunk activations to be row-sharded
    over the active context-parallel 'seq' axis, so the conv stack computes
    1/S of the rows per device (GSPMD inserts the causal-conv halo
    exchanges) instead of running replicated across the seq axis; the
    row-major reshape to (B, L, C) then hands the ring attention
    (ops/ring_attention.py) already-sequence-sharded q/k/v. No-op without
    an active config or when a dim doesn't divide the mesh axis
    (trace-time static-shape decision, like the ring's fallbacks)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    ctx = get_context_parallel()
    if ctx is None or ctx.size <= 1:
        return h
    if h.ndim != 4 or h.shape[1] % ctx.size:
        return h
    ba = ctx.batch_axis
    if ba is not None and h.shape[0] % int(ctx.mesh.shape[ba]):
        ba = None
    return jax.lax.with_sharding_constraint(
        h, NamedSharding(ctx.mesh, P(ba, ctx.seq_axis, None, None)))


@contextlib.contextmanager
def context_parallel(mesh: Mesh, seq_axis: str = "seq",
                     batch_axis: Optional[str] = "data",
                     head_axis: Optional[str] = None):
    """Install a context-parallel config while tracing prior steps."""
    global _current
    prev = _current
    _current = ContextParallel(mesh, seq_axis, batch_axis, head_axis)
    try:
        yield _current
    finally:
        _current = prev


# --- data-parallel SAMPLING (trace-time, like context_parallel) -------------

@dataclasses.dataclass(frozen=True)
class SampleParallel:
    mesh: Mesh
    batch_axis: str = "data"

    @property
    def size(self) -> int:
        return int(self.mesh.shape[self.batch_axis])


_sample: Optional[SampleParallel] = None


def get_sample_parallel() -> Optional[SampleParallel]:
    return _sample


def shard_sample_batch(x, batch_dim: int = 0):
    """Constrain a sampler carry (canvas / incremental cache) to be
    batch-sharded over the active sample-parallel mesh: the per-pixel
    sampling loops are embarrassingly batch-parallel (zero collectives),
    and with partitionable threefry the categorical draws are
    sharding-INVARIANT, so the sharded sampler emits bitwise-identical
    codes (tested). No-op without an active config or when the batch dim
    doesn't divide the mesh axis (trace-time static-shape decision)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    ctx = get_sample_parallel()
    if ctx is None or ctx.size <= 1:
        return x
    if x.shape[batch_dim] % ctx.size:
        return x
    spec = [None] * x.ndim
    spec[batch_dim] = ctx.batch_axis
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(ctx.mesh, P(*spec)))


@contextlib.contextmanager
def sample_parallel(mesh: Mesh, batch_axis: str = "data"):
    """Install a sample-parallel config while tracing/generating samples."""
    global _sample
    prev = _sample
    _sample = SampleParallel(mesh, batch_axis)
    try:
        yield _sample
    finally:
        _sample = prev

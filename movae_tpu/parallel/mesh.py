"""Device mesh + sharding helpers (SPMD data parallelism).

The reference is strictly single-device ("one process per GPU" via runner.py
--gpu_id, /root/reference/runner.py:101-107, SURVEY.md §2.5). Here the batch
is sharded over a ``data`` mesh axis and parameters are replicated; XLA's
SPMD partitioner inserts the gradient all-reduce over ICI. Multi-host (DCN)
runs initialize ``jax.distributed`` first and use the same annotations.

The mesh is built with a spare ``model`` axis (size 1 by default) so tensor
parallelism is an annotation change, not a rewrite.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.lru_cache(maxsize=None)
def cached_reshard(sharding: NamedSharding):
    """Jitted identity with ``out_shardings=sharding``, cached per sharding.

    ``jax.jit``'s dispatch cache is keyed on callable identity, so building
    ``jax.jit(lambda t: t, ...)`` at every call site retraces AND recompiles
    the same replicate/reshard program on every invocation — tens of seconds
    per chunk over the remote-compile tunnel. Reusing one wrapper per
    sharding restores normal per-signature caching."""
    return jax.jit(lambda t: t, out_shardings=sharding)


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices: Optional[Sequence] = None,
              num_seq: int = 1, num_pipe: int = 1) -> Mesh:
    """('data', 'model', 'seq', 'pipe') mesh: data parallelism, tensor
    parallelism, sequence (context) parallelism for long-L prior attention
    (ops/ring_attention.py), and pipeline parallelism for the prior block
    stack (parallel/pipeline.py). The trailing axes default to size 1 so
    plain DP runs are unaffected."""
    devices = list(devices if devices is not None else jax.devices())
    extra = num_model * num_seq * num_pipe
    if min(num_model, num_seq, num_pipe) < 1 or len(devices) % extra:
        raise ValueError(
            f"model_partitions={num_model} * context_parallel={num_seq} * "
            f"pipeline_parallel={num_pipe} must divide the device count "
            f"({len(devices)})")
    if num_data is None:
        num_data = len(devices) // extra
    devs = np.asarray(devices[: num_data * extra]).reshape(
        num_data, num_model, num_seq, num_pipe)
    return Mesh(devs, ("data", "model", "seq", "pipe"))


class DataParallel:
    """Shard batches over 'data'; replicate state. When the mesh has a
    non-trivial 'model' axis, :meth:`shard_params` additionally splits large
    weight matrices/conv kernels over it (tensor parallelism) — GSPMD
    propagates the layout through the step and inserts the collectives.

    With ``fsdp=True`` (ZeRO-3), large parameter leaves are ALSO sharded
    over the 'data' axis on their largest free dimension: at rest each chip
    holds 1/dp of the weights and optimizer moments (``tx.init`` on the
    placed params inherits the layout); GSPMD all-gathers a weight just
    before use and reduce-scatters its gradient — the standard
    fully-sharded recipe, expressed purely as placement annotations."""

    def __init__(self, mesh: Optional[Mesh] = None, fsdp: bool = False):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.fsdp = fsdp
        self.batch_sharding = NamedSharding(self.mesh, P("data"))
        self.replicated = NamedSharding(self.mesh, P())

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def shard_batch(self, batch: Any):
        """Accepts host numpy batches directly — callers should NOT
        jnp.asarray first (that would transfer to the default device and,
        multi-host, bounce back to host before the real sharded transfer)."""
        if jax.process_count() > 1:
            # multi-host: each process contributes its local slice of the
            # global batch (Loader(process_index=..., process_count=...))
            if not isinstance(batch, np.ndarray):
                batch = np.asarray(batch)
            return jax.make_array_from_process_local_data(
                self.batch_sharding, batch)
        return jax.device_put(batch, self.batch_sharding)

    def shard_batch_stacked(self, batches: Any):
        """(k, B, ...) stack of k per-step batches: the batch axis (axis 1)
        is sharded on 'data', the step axis replicated — the layout
        ``make_scanned_train_step`` scans over."""
        sharding = NamedSharding(self.mesh, P(None, "data"))
        if jax.process_count() > 1:
            if not isinstance(batches, np.ndarray):
                batches = np.asarray(batches)
            return jax.make_array_from_process_local_data(sharding, batches)
        return jax.device_put(batches, sharding)

    def replicate(self, tree: Any):
        return jax.device_put(tree, self.replicated)

    def host_copy(self, tree: Any):
        """Host copy of a (possibly cross-host-sharded) pytree. On
        multi-host runs, fsdp/tp/pipe-sharded leaves span non-addressable
        devices and a bare ``jax.device_get`` raises — re-shard to
        replicated first. The re-shard is an all-gather COLLECTIVE: every
        process must call this (gate only the file WRITE on process 0)."""
        if jax.process_count() > 1:
            tree = cached_reshard(self.replicated)(tree)
        return jax.device_get(tree)

    def param_shardings(self, params: Any, min_elems: int = 4096) -> Any:
        """Tensor-parallel sharding rule: leaves with >=2 dims whose output
        (last) dimension divides the 'model' axis and that are big enough to
        be worth splitting get P(..., 'model'); everything else (biases,
        norm scales, small kernels) is replicated. Output-dim sharding works
        for both Dense kernels (in, out) and conv kernels (kh, kw, cin,
        cout) without any model-code change."""
        tp = self.mesh.shape["model"]
        dp = self.mesh.shape["data"]

        def rule(leaf):
            ndim = getattr(leaf, "ndim", 0)
            spec = [None] * ndim
            if (tp > 1 and ndim >= 2 and leaf.shape[-1] % tp == 0
                    and leaf.size >= min_elems):
                spec[-1] = "model"
            if self.fsdp and dp > 1 and ndim >= 1 and leaf.size >= min_elems:
                # largest still-unsharded dim divisible by the data width
                cands = [d for d in range(ndim)
                         if spec[d] is None and leaf.shape[d] % dp == 0]
                if cands:
                    spec[max(cands, key=lambda d: leaf.shape[d])] = "data"
            if any(spec):
                return NamedSharding(self.mesh, P(*spec))
            return self.replicated

        return jax.tree_util.tree_map(rule, params)

    def shard_params(self, params: Any, min_elems: int = 4096) -> Any:
        return jax.device_put(params, self.param_shardings(params, min_elems))

    def pad_to_devices(self, n: int) -> int:
        d = self.mesh.shape["data"]
        return ((n + d - 1) // d) * d

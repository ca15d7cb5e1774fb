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

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    devs = np.asarray(devices[: num_data * num_model]).reshape(
        num_data, num_model)
    return Mesh(devs, ("data", "model"))


class DataParallel:
    """Shard batches over 'data'; replicate state."""

    def __init__(self, mesh: Optional[Mesh] = None):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.batch_sharding = NamedSharding(self.mesh, P("data"))
        self.replicated = NamedSharding(self.mesh, P())

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def shard_batch(self, batch: Any):
        return jax.device_put(batch, self.batch_sharding)

    def replicate(self, tree: Any):
        return jax.device_put(tree, self.replicated)

    def pad_to_devices(self, n: int) -> int:
        d = self.mesh.shape["data"]
        return ((n + d - 1) // d) * d

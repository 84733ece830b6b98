"""Device mesh + sharding rules for data-parallel training.

SURVEY.md §2.2: the reference's only parallelism is 8-way TPU-core data
parallelism through torch_xla (``xmp.spawn`` + ``xm.optimizer_step``
allreduce).  TPU-native equivalent: one process per host, a 1-D
``jax.sharding.Mesh`` over all chips with the batch axis sharded on
``'data'`` and parameters replicated; XLA compiles the gradient allreduce
(and the VQ-EMA statistics psum) onto ICI automatically when the train step
is jitted with these shardings.  Multi-host extends the same mesh over DCN
via ``jax.distributed.initialize`` (same code path).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def check_batch_divisible(batch_sz: int, mesh: Mesh) -> None:
    n = mesh.devices.size
    if batch_sz % n:
        raise ValueError(f"batch size {batch_sz} not divisible by {n} devices")

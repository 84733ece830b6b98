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


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host: start JAX's distributed runtime so ``jax.devices()``
    spans every host and the data mesh extends over DCN.

    On TPU pods (GCE metadata present) a bare call autodetects everything;
    the explicit arguments serve CPU/GPU clusters and the 2-process CPU
    integration test (tests/test_multihost.py).  Replaces the reference's
    ``xmp.spawn`` process-per-core model [SURVEY.md §2.2 comm backend]: one
    process per HOST, collectives compiled onto ICI intra-host and DCN
    across hosts by XLA.  Call before any other jax API touches the backend.
    """
    if coordinator is None and (num_processes is not None
                                or process_id is not None):
        raise ValueError(
            "num_processes/process_id require an explicit coordinator "
            "address (without one, jax autodetects the topology and the "
            "explicit values would be silently ignored)"
        )
    kwargs = {}
    if coordinator is not None:
        kwargs.update(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), axis_names=("data",))


def put_replicated(tree, mesh: Mesh):
    """Replicate a host pytree onto every device of ``mesh``.

    Works under multi-process meshes too (where a plain ``device_put`` of
    host data against a sharding spanning non-addressable devices is not
    allowed): every process holds the same host value and fills only its
    addressable shards.
    """
    repl = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, repl)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, repl, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def put_sharded(x, sharding: NamedSharding):
    """Place a GLOBAL host batch against ``sharding``.

    Single-process: an async ``device_put`` (each device gets its shard).
    Multi-process: every process computes the same global batch (the sampler
    is pure in (seed, step)) and contributes only the shards of its own
    addressable devices.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Staged K-step blocks [K, B, ...]: batch is axis 1 (K replicated)."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def check_batch_divisible(batch_sz: int, mesh: Mesh) -> None:
    n = mesh.devices.size
    if batch_sz % n:
        raise ValueError(f"batch size {batch_sz} not divisible by {n} devices")

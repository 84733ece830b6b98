"""Async host->device input pipeline (replaces torch_xla ParallelLoader).

SURVEY.md §2.2: the reference feeds each TPU core via
``torch_xla.distributed.parallel_loader.ParallelLoader``.  The JAX-native
equivalent: batches are materialized on host (int16 — 2 bytes/sample; the
decode to float and the whole MFCC frontend run ON DEVICE inside the jitted
step), transferred with ``jax.device_put`` against the mesh sharding (each
device receives only its batch shard), and double-buffered one step ahead so
the transfer of batch ``s+1`` overlaps the compute of batch ``s``.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np

from ae_wavenet_tpu.data.dataset import WindowSampler
from ae_wavenet_tpu.parallel import mesh as mesh_mod


def device_batches(
    sampler: WindowSampler,
    start_step: int,
    n_steps: int,
    sharding=None,
    prefetch: int = 2,
    block: int = 1,
) -> Iterator[tuple]:
    """Yield (step, (wav, spk)) with the arrays already on device.

    A background thread keeps ``prefetch`` transfers in flight; jax transfers
    are async, so compute and host->HBM copies overlap.  Under a multi-host
    mesh each process feeds only its addressable shards of the global batch
    (mesh.put_sharded); the pure (seed, step) sampler keeps every host's
    view of the global batch identical with no cross-host data exchange.

    ``block`` > 1 stages K consecutive batches into ONE [K, B, ...] transfer
    (for the K-step jitted train program, TrainConfig.steps_per_call);
    yields (first_step, (wav_block, spk_block)).  n_steps must be a
    multiple of ``block`` (static shapes: a ragged tail block would force a
    recompile).
    """
    if n_steps % block:
        raise ValueError(f"n_steps={n_steps} not a multiple of block={block}")
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def put_fn(x):
        if sharding is None:
            return jax.device_put(x)
        return mesh_mod.put_sharded(x, sharding)

    def make_item(s):
        if block == 1:
            wav, spk = sampler.batch_at(s)
            return (s, (put_fn(wav), put_fn(spk)))
        ws, ks = zip(*(sampler.batch_at(s + i) for i in range(block)))
        return (s, (put_fn(np.stack(ws)), put_fn(np.stack(ks))))

    def producer():
        try:
            for s in range(start_step, start_step + n_steps, block):
                item = make_item(s)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(None)
        except BaseException as e:  # surface in the consumer, never deadlock
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer stopped early (preemption/break): unblock the producer so
        # the process can exit cleanly
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=5)

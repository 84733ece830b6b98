"""Tracing / profiling utilities (SURVEY.md §5 "Tracing / profiling").

The reference had nothing beyond torch_xla's metrics report; the TPU-native
equivalents here are:

* :func:`trace` — context manager around ``jax.profiler`` writing a Perfetto
  trace (view at ui.perfetto.dev or TensorBoard's profile plugin).
* :func:`start_server` — live profiling endpoint for
  ``tensorboard --logdir`` capture.
* :class:`StepTimer` — cheap wall-clock step timing with device fencing at
  report boundaries only (never per step, to avoid host syncs in the hot
  loop — the classic torch_xla trap, SURVEY.md §3.1).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


class StepTimer:
    """Accumulates step wall time; fences the device only when read."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    def rate(self, fence_on=None) -> float:
        """Steps/sec since last reset; optionally block on a device value
        first so pending async work is counted."""
        if fence_on is not None:
            jax.block_until_ready(fence_on)
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else float("inf")

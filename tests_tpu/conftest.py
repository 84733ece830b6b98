"""On-TPU compiled-kernel tests (VERDICT r1 item 2).

Unlike tests/ (whose conftest forces a fake 8-device CPU backend), this
suite runs against the machine's real default backend and skips itself
when that backend is not a TPU.  It exists so the compiled Mosaic code —
DMA/semaphore ordering, VMEM residency, int8 MXU paths — has automated
correctness gates, not just interpret-mode coverage.

Run with:  python -m pytest tests_tpu/ -q
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "none"
    if platform != "tpu":
        marker = pytest.mark.skip(
            reason=f"requires a real TPU backend (have: {platform})"
        )
        for item in items:
            item.add_marker(marker)

"""Test configuration: force JAX onto a fake 8-device CPU backend.

This is the TPU-world analogue of a fake backend (SURVEY.md §4): data-parallel
sharding tests run against an 8-device mesh without a pod.

Note: this machine's sitecustomize imports jax at interpreter startup and
registers the TPU ('axon') backend, so env vars alone are too late; we
override via jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

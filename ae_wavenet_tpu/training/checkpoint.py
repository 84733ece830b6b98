"""Checkpoint / resume.

Rebuild of the reference ``checkpoint.py`` [H] (SURVEY.md §5): one logical
``State`` bundles model params, optimizer state, bottleneck (EMA) state, the
step counter, and the data-stream position, plus the full serialized config
so architecture flags cannot drift on resume.

TPU-native implementation: Orbax (async-capable, sharding-aware) for the
array pytree; the config travels as JSON.  The data-stream position needs no
iterator state — the sampler is counter-based (data/dataset.py), so
``step`` IS the stream position; resuming at the saved step continues the
identical sample sequence (same reproducibility contract as the reference's
saved iterator+RNG state).
"""

from __future__ import annotations

import json
import os
import re

import jax
import orbax.checkpoint as ocp

from ae_wavenet_tpu.utils import config as config_mod


def save(ckpt_dir: str, step: int, tree: dict, cfg: config_mod.RunConfig) -> str:
    """tree: {'params', 'opt_state', 'bn_state'} (any pytree of arrays).

    Multi-host: EVERY process calls the (multihost-aware) orbax save — its
    internal barriers require all processes, and with the fully-replicated
    host tree its primary-host logic writes each array once — while the
    JSON sidecars are written by process 0 alone (the reference's
    ``xm.save`` master-ordinal pattern [SURVEY.md §3.1]); a final global
    sync keeps any host from acting on a half-written checkpoint."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        # force=True makes save idempotent (e.g. a preemption save followed
        # by the CLI's final save at the same step)
        ckptr.save(path, jax.device_get(tree), force=True)
    if jax.process_index() == 0:
        with open(os.path.join(path, "run_config.json"), "w") as f:
            f.write(config_mod.to_json(cfg))
        with open(os.path.join(ckpt_dir, "LATEST"), "w") as f:
            f.write(str(step))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_save_{step}")
    return path


def latest_step(ckpt_dir: str) -> int | None:
    try:
        with open(os.path.join(ckpt_dir, "LATEST")) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        steps = [
            int(m.group(1))
            for d in os.listdir(ckpt_dir)
            if (m := re.fullmatch(r"step_(\d+)", d))
        ] if os.path.isdir(ckpt_dir) else []
        return max(steps) if steps else None


def load(ckpt_dir: str, step: int | None = None):
    """-> (step, tree, cfg).  ``step`` defaults to the latest."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    with open(os.path.join(path, "run_config.json")) as f:
        cfg = config_mod.from_json(f.read())
    return step, tree, cfg

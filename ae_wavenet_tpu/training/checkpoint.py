"""Checkpoint / resume.

Rebuild of the reference ``checkpoint.py`` [H] (SURVEY.md §5): one logical
``State`` bundles model params, optimizer state, bottleneck (EMA) state, the
step counter, and the data-stream position, plus the full serialized config
so architecture flags cannot drift on resume.

TPU-native implementation: Orbax for the array pytree; the config travels as
JSON.  The data-stream position needs no iterator state — the sampler is
counter-based (data/dataset.py), so ``step`` IS the stream position;
resuming at the saved step continues the identical sample sequence (same
reproducibility contract as the reference's saved iterator+RNG state).

Async saves (SURVEY.md §5 "frequent async Orbax checkpoints"): periodic
saves go through :class:`Saver`, which hands the device arrays to Orbax's
``AsyncCheckpointer`` — serialization + disk write happen on background
threads while the train loop keeps stepping; only the device→host snapshot
is synchronous.  The ``LATEST`` pointer and the embedded config are written
AFTER the async commit finalizes (at the next save / explicit ``wait``), so
a reader never follows ``LATEST`` into a half-written directory; Orbax's own
tmp-dir + rename keeps the step directory itself atomic.
"""

from __future__ import annotations

import json
import os
import re
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp

from ae_wavenet_tpu.utils import config as config_mod


def _step_path(ckpt_dir: str, step: int) -> str:
    return os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))


def _atomic_write(path: str, text: str) -> None:
    """tmp + rename so a crash mid-write never leaves a partial file —
    `latest_step` treats sidecar existence as completeness, which is only
    sound if existence implies fully-written."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _write_sidecars(ckpt_dir: str, path: str, step: int,
                    cfg: config_mod.RunConfig,
                    best: tuple[int, float] | None = None) -> None:
    if jax.process_index() == 0:
        # config first, LATEST last: a crash between the two leaves a
        # loadable step that LATEST doesn't point to yet — resume falls
        # back to the pointed (older, also complete) step, never forward
        # onto anything partial
        _atomic_write(os.path.join(path, "run_config.json"),
                      config_mod.to_json(cfg))
        _atomic_write(os.path.join(ckpt_dir, "LATEST"), str(step))
        if best is not None:
            # written with LATEST (i.e. after the step's async commit
            # finalized), so BEST never points into a half-written dir
            _atomic_write(os.path.join(ckpt_dir, "BEST"),
                          json.dumps({"step": best[0], "metric": best[1]}))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_save_{step}")


def _complete_steps(ckpt_dir: str) -> set[int]:
    """Loadable steps: committed dir (Orbax keeps uncommitted writes in
    tmp-suffixed dirs the regex skips) + config sidecar present."""
    if not os.path.isdir(ckpt_dir):
        return set()
    return {
        int(m.group(1))
        for d in os.listdir(ckpt_dir)
        if (m := re.fullmatch(r"step_(\d+)", d))
        and os.path.exists(os.path.join(ckpt_dir, d, "run_config.json"))
    }


def prune(ckpt_dir: str, keep_last: int, protect=()) -> list[int]:
    """Delete all but the newest ``keep_last`` complete checkpoints
    (reference kept ONE file, SURVEY §2.1 checkpoint row; at flagship state
    size — 319 MB — keep-all writes ~64 GB over a 100k-step run).

    Never removes: the ``protect``-ed steps (the best-holdout checkpoint),
    the step the LATEST pointer names (rollback-resume intent must survive),
    or incomplete dirs (an in-flight async commit).  Call only after the
    current save's sidecars are durable (Saver.wait does).  Returns the
    pruned steps."""
    if keep_last <= 0 or jax.process_index() != 0:
        return []
    complete = _complete_steps(ckpt_dir)
    keep = set(sorted(complete)[-keep_last:]) | set(protect)
    try:
        with open(os.path.join(ckpt_dir, "LATEST")) as f:
            keep.add(int(f.read().strip()))
    except (FileNotFoundError, ValueError):
        pass
    pruned = []
    for step in sorted(complete - keep):
        shutil.rmtree(_step_path(ckpt_dir, step), ignore_errors=True)
        pruned.append(step)
    return pruned


class Saver:
    """Async checkpoint writer; one in-flight save at a time.

    ``save()`` returns as soon as the arrays are snapshotted; the previous
    save (if still writing) is finalized first.  Call ``wait()`` before
    process exit or before any read-back of the just-saved step.  Multi-host:
    every process participates (Orbax's async barriers require it), sidecars
    come from process 0 after the commit.
    """

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        self._pending = None

    def save(self, ckpt_dir: str, step: int, tree: dict,
             cfg: config_mod.RunConfig, blocking: bool = False,
             keep_last: int = 0,
             best: tuple[int, float] | None = None) -> str:
        """``keep_last`` > 0 enables retention: after this save commits, all
        but the newest ``keep_last`` checkpoints are pruned, EXCEPT the
        ``best`` step (the best-holdout checkpoint, also recorded in the
        ``BEST`` sidecar as {step, metric})."""
        self.wait()
        path = _step_path(ckpt_dir, step)
        os.makedirs(ckpt_dir, exist_ok=True)
        # force=True: idempotent (e.g. preemption save + final save at the
        # same step)
        self._ckptr.save(path, args=ocp.args.PyTreeSave(tree), force=True)
        self._pending = (ckpt_dir, path, step, cfg, keep_last, best)
        if blocking:
            self.wait()
        return path

    def wait(self) -> None:
        """Block until the in-flight save (if any) is durable + sidecars,
        then apply the retention policy (prune runs strictly after the new
        step is complete, so an interrupted prune can only over-retain)."""
        if self._pending is None:
            return
        self._ckptr.wait_until_finished()
        ckpt_dir, path, step, cfg, keep_last, best = self._pending
        self._pending = None
        _write_sidecars(ckpt_dir, path, step, cfg, best)
        if keep_last > 0:
            prune(ckpt_dir, keep_last,
                  protect=() if best is None else (best[0],))

    def close(self) -> None:
        # close the checkpointer even if the pending wait raises (disk-full
        # etc.) — otherwise its background worker threads are never joined
        try:
            self.wait()
        finally:
            self._ckptr.close()


def save(ckpt_dir: str, step: int, tree: dict, cfg: config_mod.RunConfig) -> str:
    """Blocking one-shot save (CLI final saves, tests, export shims)."""
    saver = Saver()
    try:
        return saver.save(ckpt_dir, step, tree, cfg, blocking=True)
    finally:
        saver.close()


def latest_step(ckpt_dir: str) -> int | None:
    """The step resume should pick.

    Preference order:
    1. The LATEST pointer, if it names a loadable step — the pointer records
       intent: after an explicit rollback-resume (``--step`` older than a
       later abandoned save) it must win over max(dirs), or resume would
       silently jump forward onto the abandoned checkpoint.
    2. Otherwise the newest LOADABLE step directory — covers a stale/absent
       pointer (crash between the async commit's sidecar and LATEST writes).

    Loadable = committed dir (Orbax keeps uncommitted writes in tmp-suffixed
    dirs the regex skips) + config sidecar present (written atomically, so
    existence implies complete)."""
    if not os.path.isdir(ckpt_dir):
        return None
    complete = {
        int(m.group(1))
        for d in os.listdir(ckpt_dir)
        if (m := re.fullmatch(r"step_(\d+)", d))
        and os.path.exists(os.path.join(ckpt_dir, d, "run_config.json"))
    }
    try:
        with open(os.path.join(ckpt_dir, "LATEST")) as f:
            pointed = int(f.read().strip())
    except (FileNotFoundError, ValueError):
        pointed = None
    if pointed is not None and pointed in complete:
        return pointed
    # pointer absent, stale, or nothing loadable at all: newest complete dir
    # (a LATEST naming a pruned/incomplete step must not be returned — the
    # caller would crash inside Orbax instead of getting the clean
    # no-checkpoints FileNotFoundError)
    return max(complete) if complete else None


def best_info(ckpt_dir: str) -> tuple[int, float] | None:
    """(step, metric) of the best-holdout checkpoint per the ``BEST``
    sidecar, or None if absent / no longer loadable.  Written by runs with
    retention enabled (Chassis tracks holdout recon CE at each save)."""
    try:
        with open(os.path.join(ckpt_dir, "BEST")) as f:
            d = json.load(f)
        step, metric = int(d["step"]), float(d["metric"])
    except (OSError, ValueError, KeyError):
        return None
    return (step, metric) if step in _complete_steps(ckpt_dir) else None


def load_config(ckpt_dir: str, step: int | None = None):
    """-> (step, cfg) from the sidecar alone — no array restore.  For
    callers that rebuild/restore through another path (e.g. cli.eval goes
    through Chassis.resume) and only need the embedded config first."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    with open(os.path.join(_step_path(ckpt_dir, step), "run_config.json")) as f:
        return step, config_mod.from_json(f.read())


def load(ckpt_dir: str, step: int | None = None):
    """-> (step, tree, cfg).  ``step`` defaults to the latest."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = _step_path(ckpt_dir, step)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        tree = ckptr.restore(path)
    cfg_file = os.path.join(path, "run_config.json")
    if not os.path.exists(cfg_file):
        raise FileNotFoundError(
            f"{cfg_file} missing — the save's finalizer (Saver.wait) never "
            f"ran; the arrays committed but the config sidecar did not"
        )
    with open(cfg_file) as f:
        cfg = config_mod.from_json(f.read())
    return step, tree, cfg


def merge_into(ref, new, what: str, put=None):
    """Rebuild ``new``'s leaves into ``ref``'s structure, guarded.

    Restored containers may differ from the live model's (tuple->list etc.);
    the rebuild is positional by leaf order, so it MUST be guarded: a
    leaf-count or shape mismatch means the runtime config builds a DIFFERENT
    model than the checkpoint's (e.g. aux_frame_weight flipped on/off since
    the save) — positional unflatten would either throw an opaque error or,
    worse, silently misassign weights.  Shared by every checkpoint-restore
    path (Chassis.resume, scripts/eval_quality, generation CLI)."""
    import jax.numpy as jnp

    put = jax.device_put if put is None else put
    ref_leaves = jax.tree.leaves(ref)
    new_leaves = jax.tree.leaves(new)
    if len(ref_leaves) != len(new_leaves):
        raise ValueError(
            f"checkpoint {what} tree has {len(new_leaves)} leaves but "
            f"the current config builds {len(ref_leaves)} — the "
            f"model architecture changed since the save; resume "
            f"with the checkpoint's embedded config (CLI `resume` "
            f"does this) or match the flags (aux_frame_weight, "
            f"bottleneck kind, model dims) to the original run"
        )
    for rl, nl in zip(ref_leaves, new_leaves):
        if tuple(rl.shape) != tuple(np.shape(nl)):
            raise ValueError(
                f"checkpoint {what} leaf shape {np.shape(nl)} != "
                f"model's {tuple(rl.shape)} — architecture drift "
                f"since the save"
            )
    return jax.tree.unflatten(
        jax.tree.structure(ref),
        [put(jnp.asarray(x)) for x in new_leaves],
    )

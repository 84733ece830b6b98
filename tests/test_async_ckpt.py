"""Async checkpointing (training/checkpoint.Saver) semantics.

SURVEY.md §5 planned "frequent async Orbax checkpoints"; these tests pin the
contract: (a) non-blocking saves become durable + loadable after wait(),
(b) a crash between the async commit and the sidecar finalizer leaves the
newest dir sidecar-less and latest_step falls back to the previous complete
save, (c) Chassis periodic saves stay resumable end-to-end through the async
path."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from ae_wavenet_tpu.training import checkpoint as ckpt_mod
from ae_wavenet_tpu.utils.config import tiny_config


def _tree(v: float):
    return {
        "params": {"w": np.full((4, 3), v, np.float32),
                   "lst": [np.arange(5, dtype=np.int32)]},
        "opt_state": {"m": np.zeros((2,), np.float32)},
        "bn_state": {},
    }


def test_saver_async_roundtrip(tmp_path):
    cfg = tiny_config()
    saver = ckpt_mod.Saver()
    d = str(tmp_path / "ck")
    saver.save(d, 10, _tree(1.0), cfg, blocking=False)
    # a second save finalizes the first before enqueuing
    saver.save(d, 20, _tree(2.0), cfg, blocking=False)
    saver.close()  # waits

    assert ckpt_mod.latest_step(d) == 20
    step, tree, cfg2 = ckpt_mod.load(d)
    assert step == 20
    np.testing.assert_array_equal(tree["params"]["w"],
                                  np.full((4, 3), 2.0, np.float32))
    assert cfg2.train.n_win == cfg.train.n_win
    # the earlier save is intact too
    step, tree, _ = ckpt_mod.load(d, 10)
    assert float(np.asarray(tree["params"]["w"]).ravel()[0]) == 1.0


def test_latest_skips_sidecarless_dir(tmp_path):
    """Simulated crash between commit and finalizer: arrays on disk, no
    run_config.json -> resume must pick the previous complete step."""
    cfg = tiny_config()
    d = str(tmp_path / "ck")
    ckpt_mod.save(d, 10, _tree(1.0), cfg)           # complete
    saver = ckpt_mod.Saver()
    saver.save(d, 20, _tree(2.0), cfg, blocking=False)
    saver._ckptr.wait_until_finished()               # commit the arrays...
    saver._pending = None                            # ...but "crash" before
    saver.close()                                    # sidecars are written
    assert os.path.isdir(os.path.join(d, "step_00000020"))
    assert not os.path.exists(
        os.path.join(d, "step_00000020", "run_config.json"))
    assert ckpt_mod.latest_step(d) == 10
    step, _, _ = ckpt_mod.load(d)
    assert step == 10


def test_merge_into_guards():
    ref = {"a": np.zeros((2, 3), np.float32), "b": (np.zeros((4,)),)}
    ok = ckpt_mod.merge_into(
        ref, {"a": np.ones((2, 3)), "b": [np.ones((4,))]}, "params",
        put=lambda x: x)
    assert isinstance(ok["b"], tuple)
    with pytest.raises(ValueError, match="leaves"):
        ckpt_mod.merge_into(ref, {"a": np.ones((2, 3))}, "params",
                            put=lambda x: x)
    with pytest.raises(ValueError, match="shape"):
        ckpt_mod.merge_into(
            ref, {"a": np.ones((3, 2)), "b": [np.ones((4,))]}, "params",
            put=lambda x: x)


def test_chassis_async_periodic_saves_resume(tmp_path):
    """Chassis.train with ckpt_every smaller than n_steps: periodic saves go
    through the async path; after train() returns they are durable and the
    run resumes to an identical stream."""
    import io

    from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset
    from ae_wavenet_tpu.training.chassis import Chassis

    prefix = str(tmp_path / "synth")
    make_synthetic_dataset(prefix, n_clips=4, n_speakers=2,
                           clip_len=(4000, 6000))
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ckpt_every=2, log_every=2))
    d = str(tmp_path / "ck")
    ch = Chassis(cfg, prefix, ckpt_dir=d, log_stream=io.StringIO())
    hist = ch.train(6)
    assert ckpt_mod.latest_step(d) == 6

    ch2 = Chassis(cfg, prefix, ckpt_dir=d, log_stream=io.StringIO())
    assert ch2.resume() == 6
    for a, b in zip(jax.tree.leaves(ch.params), jax.tree.leaves(ch2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_pointer_wins_over_newer_dir(tmp_path):
    """Rollback-resume semantics: after an intentional resume from an older
    step (LATEST repointed by its save), a later abandoned checkpoint dir
    must NOT be silently selected."""
    cfg = tiny_config()
    d = str(tmp_path / "ck")
    ckpt_mod.save(d, 100, _tree(1.0), cfg)   # the abandoned diverged run
    ckpt_mod.save(d, 60, _tree(2.0), cfg)    # rollback save repoints LATEST
    assert ckpt_mod.latest_step(d) == 60
    step, tree, _ = ckpt_mod.load(d)
    assert step == 60
    # stale pointer (names a deleted step) -> newest loadable dir
    import shutil
    shutil.rmtree(tmp_path / "ck" / "step_00000060")
    assert ckpt_mod.latest_step(d) == 100


def test_latest_pointer_to_nothing_loadable_returns_none(tmp_path):
    """A LATEST naming a pruned step, with NO complete step remaining, must
    yield None (clean no-checkpoints error downstream), not the unloadable
    pointed step."""
    cfg = tiny_config()
    d = str(tmp_path / "ck")
    ckpt_mod.save(d, 100, _tree(1.0), cfg)
    import shutil
    shutil.rmtree(tmp_path / "ck" / "step_00000100")
    assert ckpt_mod.latest_step(d) is None
    with pytest.raises(FileNotFoundError):
        ckpt_mod.load(d)


def test_prune_keep_last_and_protect(tmp_path):
    """Retention: keep newest N + protected best + LATEST-pointed step;
    incomplete dirs are untouched."""
    cfg = tiny_config()
    d = str(tmp_path / "ck")
    saver = ckpt_mod.Saver()
    for s in (10, 20, 30):
        saver.save(d, s, _tree(float(s)), cfg, blocking=True)
    # step 10 is the "best" checkpoint; keep_last=2 via the next save
    saver.save(d, 40, _tree(4.0), cfg, blocking=True, keep_last=2,
               best=(10, 3.14))
    saver.close()
    steps = ckpt_mod._complete_steps(d)
    assert steps == {10, 30, 40}          # 20 pruned; 10 protected as best
    assert ckpt_mod.best_info(d) == (10, 3.14)
    assert ckpt_mod.latest_step(d) == 40
    # best sidecar pointing at a pruned step -> None (not a stale pointer)
    import shutil
    shutil.rmtree(tmp_path / "ck" / "step_00000010")
    assert ckpt_mod.best_info(d) is None


def test_prune_never_removes_latest_pointer_target(tmp_path):
    """A rollback-resume repointed LATEST at an older step; retention must
    not prune it even when it falls outside keep_last."""
    cfg = tiny_config()
    d = str(tmp_path / "ck")
    for s in (10, 20, 30):
        ckpt_mod.save(d, s, _tree(float(s)), cfg)
    ckpt_mod.save(d, 15, _tree(1.5), cfg)   # rollback: LATEST -> 15
    pruned = ckpt_mod.prune(d, keep_last=1)
    assert 15 not in pruned and 30 not in pruned
    assert ckpt_mod.latest_step(d) == 15


def test_chassis_retention_e2e(tmp_path):
    """Chassis with ckpt_keep: a run leaves O(keep) checkpoints plus the
    best-holdout one, BEST survives resume, and the best checkpoint's CE
    matches the eval stream."""
    import io

    from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset
    from ae_wavenet_tpu.training.chassis import Chassis

    prefix = str(tmp_path / "synth")
    make_synthetic_dataset(prefix, n_clips=4, n_speakers=2,
                           clip_len=(4000, 6000))
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ckpt_every=2, log_every=2,
                                       ckpt_keep=1, holdout_every=2))
    d = str(tmp_path / "ck")
    ch = Chassis(cfg, prefix, ckpt_dir=d, log_stream=io.StringIO())
    ch.train(8, eval_every=2)
    ch.close()
    steps = ckpt_mod._complete_steps(d)
    best = ckpt_mod.best_info(d)
    assert best is not None
    assert steps <= {8, best[0]} and 8 in steps
    # resume picks the tracking back up (pre-resume best is not pruned away)
    ch2 = Chassis(cfg, prefix, ckpt_dir=d, log_stream=io.StringIO())
    ch2.resume()
    assert ch2.best_ckpt == best
    ch2.train(4, eval_every=2)
    ch2.close()
    assert ckpt_mod.best_info(d) is not None

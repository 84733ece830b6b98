"""Generated-audio quality metrics (eval/quality): free-running NLL and
log-mel spectral distance — the measurable replacement for the reference's
listen-to-the-output evaluation (SURVEY.md §3.4/§4)."""

import dataclasses
import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.audio.mfcc import SpecConfig
from ae_wavenet_tpu.eval.quality import free_running_report, log_mel_distance


def test_log_mel_distance_identity_and_symmetry():
    rng = np.random.default_rng(0)
    spec = SpecConfig()
    x = rng.normal(size=4000).astype(np.float32) * 0.2
    y = rng.normal(size=4000).astype(np.float32) * 0.2
    assert log_mel_distance(x, x, spec) == 0.0
    d = log_mel_distance(x, y, spec)
    assert d > 0 and np.isfinite(d)
    np.testing.assert_allclose(d, log_mel_distance(y, x, spec), rtol=1e-6)


def test_log_mel_distance_orders_similarity():
    """A lightly perturbed signal must be closer than an unrelated one."""
    rng = np.random.default_rng(1)
    spec = SpecConfig()
    t = np.arange(8000) / 16000.0
    x = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    near = x + rng.normal(size=x.shape).astype(np.float32) * 0.01
    far = rng.normal(size=x.shape).astype(np.float32) * 0.4
    assert log_mel_distance(x, near, spec) < log_mel_distance(x, far, spec)


def test_log_mel_distance_rejects_short():
    with pytest.raises(ValueError, match="samples"):
        log_mel_distance(np.zeros(100), np.zeros(100), SpecConfig())


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset
    from ae_wavenet_tpu.training.chassis import Chassis
    from ae_wavenet_tpu.utils.config import tiny_config

    d = tmp_path_factory.mktemp("q")
    prefix = str(d / "synth")
    make_synthetic_dataset(prefix, n_clips=3, n_speakers=2, seed=5,
                           clip_len=(14000, 18000))
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, n_steps=30, log_every=10,
                                       learning_rate=4e-3))
    ch = Chassis(cfg, prefix, log_stream=io.StringIO())
    ch.train(30)
    return ch, prefix


def test_free_running_report_structure(trained):
    from ae_wavenet_tpu.data.dataset import PackedDataset

    ch, prefix = trained
    ds = PackedDataset(prefix)
    o, l = int(ds.offsets[0]), int(ds.lengths[0])
    wav = np.asarray(ds.data[o : o + min(l, 12000)])[None, :]
    spk = jnp.asarray(ds.speakers[0:1])
    rep = free_running_report(
        ch.params, ch.bn_state, ch.cfg, jnp.asarray(wav), spk,
        jax.random.PRNGKey(0), n_samples=800)
    assert rep["n_scored"] == 800
    assert rep["ids"].shape == (1, 800)
    for k in ("free_nll", "teacher_nll", "spectral_l2",
              "spectral_l2_vs_silence"):
        assert np.isfinite(rep[k]), (k, rep[k])
    # teacher-forced NLL on a 30-step-trained tiny model is around ln(256);
    # both NLLs must be in a sane range (not garbage alignment)
    assert 0 < rep["teacher_nll"] < 12
    assert 0 < rep["free_nll"] < 20
    # free-running cannot beat teacher forcing by more than noise: a large
    # advantage would mean the position alignment between the two is broken
    assert rep["free_nll"] > rep["teacher_nll"] - 0.5, rep


def test_eval_quality_script(trained, tmp_path, capsys):
    import json

    from ae_wavenet_tpu.training.chassis import Chassis  # noqa: F401
    from scripts.eval_quality import main

    ch, prefix = trained
    ck = str(tmp_path / "ck")
    ch.ckpt_dir = ck
    ch.save()
    rc = main(["--ckpt-dir", ck, "--data", prefix, "--clips", "0,1",
               "--n-samples", "400", "--max-input", "12000"])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()
             if x.startswith("{")]
    assert "summary" in lines[-1]
    assert lines[-1]["summary"]["clips"] == 2
    assert np.isfinite(lines[-1]["summary"]["free_nll_mean"])


def test_divergence_report(trained):
    """Temperature sweep + NLL-vs-position curve (round-3 verdict #3): keys
    present, curves the right length, greedy included, scoring untempered
    (teacher_nll identical across sweep entries by construction)."""
    from ae_wavenet_tpu.data.dataset import PackedDataset
    from ae_wavenet_tpu.eval.quality import divergence_report

    ch, prefix = trained
    ds = PackedDataset(prefix)
    o, l = int(ds.offsets[1]), int(ds.lengths[1])
    wav = np.asarray(ds.data[o : o + min(l, 12000)])[None, :]
    spk = jnp.asarray(ds.speakers[1:2])
    rep = divergence_report(
        ch.params, ch.bn_state, ch.cfg, jnp.asarray(wav), spk,
        jax.random.PRNGKey(0), n_samples=600,
        temperatures=(1.0, 0.8, 0.0), nll_buckets=4)
    assert set(rep["temperatures"]) == {"1", "0.8", "greedy"}
    for t, m in rep["temperatures"].items():
        assert np.isfinite(m["free_nll"]), t
        assert np.isfinite(m["spectral_l2"]), t
        assert len(m["free_nll_curve"]) == 4, t
    assert np.isfinite(rep["teacher_nll"])
    assert rep["n_scored"] == 600


def test_eval_quality_script_divergence(trained, tmp_path, capsys):
    import json

    from scripts.eval_quality import main

    ch, prefix = trained
    ck = str(tmp_path / "ckd")
    ch.ckpt_dir = ck
    ch.save()
    rc = main(["--ckpt-dir", ck, "--data", prefix, "--clips", "0",
               "--n-samples", "400", "--max-input", "12000",
               "--divergence", "--temperatures", "1.0,0.0",
               "--nll-buckets", "4"])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()
             if x.startswith("{")]
    summary = lines[-1]["summary"]
    assert set(summary["free_nll_by_temp"]) == {"1", "greedy"}
    assert np.isfinite(summary["teacher_nll_mean"])
    div = lines[0]["divergence"]
    assert len(div["temperatures"]["1"]["free_nll_curve"]) == 4

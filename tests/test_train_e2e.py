"""End-to-end integration fixture (BASELINE config 1, SURVEY.md §7 step 5):
tiny plain-AE WaveNet on a synthetic 10-clip dataset, CPU-runnable.

Covers: preprocess -> packed dataset -> window sampler -> chassis train loop
(loss decreases) -> checkpoint -> resume reproduces the exact same stream.
"""

import dataclasses
import io
import os

import numpy as np
import pytest

from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset
from ae_wavenet_tpu.data.dataset import PackedDataset, WindowSampler
from ae_wavenet_tpu.training.chassis import Chassis
from ae_wavenet_tpu.utils.config import tiny_config


@pytest.fixture(scope="module")
def data_prefix(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    prefix = str(d / "synth")
    make_synthetic_dataset(prefix, n_clips=10, n_speakers=4, seed=0)
    return prefix


def test_sampler_deterministic(data_prefix):
    ds = PackedDataset(data_prefix)
    s = WindowSampler(ds, u_len=4000, batch_sz=3, seed=7)
    w1, k1 = s.batch_at(5)
    w2, k2 = s.batch_at(5)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(k1, k2)
    w3, _ = s.batch_at(6)
    assert not np.array_equal(w1, w3)
    assert w1.shape == (3, 4000) and w1.dtype == np.int16


def test_train_loss_decreases(data_prefix, tmp_path):
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, n_steps=80, log_every=10,
                                       learning_rate=5e-3)
    )
    log = io.StringIO()
    ch = Chassis(cfg, data_prefix, ckpt_dir=str(tmp_path / "ckpt"), log_stream=log)
    hist = ch.train(80)
    first, last = hist[0]["recon_ce"], hist[-1]["recon_ce"]
    # random-init CE is ln(256) ~ 5.55; 80 steps must make clear progress
    # (the synthetic fixture is deliberately hard to predict — see
    # data/preprocess.make_synthetic_dataset)
    assert first < 6.0
    assert last < first - 0.3, (first, last)
    assert np.isfinite(last)


def test_checkpoint_resume_identical_stream(data_prefix, tmp_path):
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, n_steps=10, log_every=1)
    )
    ckpt = str(tmp_path / "ck")

    # run A: 4 steps, save, then 4 more
    a = Chassis(cfg, data_prefix, ckpt_dir=ckpt, log_stream=io.StringIO())
    a.train(4)
    a.save()
    hist_a = a.train(4)

    # run B: fresh chassis, resume from step 4, same 4 steps
    b = Chassis(cfg, data_prefix, ckpt_dir=ckpt, log_stream=io.StringIO())
    assert b.resume() == 4
    hist_b = b.train(4)

    la = [h["recon_ce"] for h in hist_a]
    lb = [h["recon_ce"] for h in hist_b]
    np.testing.assert_allclose(la, lb, rtol=1e-5, atol=1e-6)


def test_short_clips_rejected(data_prefix):
    ds = PackedDataset(data_prefix)
    with pytest.raises(ValueError, match="window length"):
        WindowSampler(ds, u_len=10_000_000, batch_sz=2)

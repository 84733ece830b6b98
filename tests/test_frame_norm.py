"""Dataset-level frame normalization (SpecConfig.norm="dataset"): fixed
per-channel stats computed at Chassis init, persisted in the config, and
applied identically at train and generation time — removing the window/
utterance statistics mismatch of the reference-style norm="window"
(models/common.py:normalize_frames)."""

import dataclasses as dc
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ae_wavenet_tpu.audio import mfcc as mfcc_mod
from ae_wavenet_tpu.data.preprocess import (dataset_frame_stats,
                                            make_synthetic_dataset)
from ae_wavenet_tpu.models.common import normalize_frames
from ae_wavenet_tpu.training.chassis import Chassis
from ae_wavenet_tpu.utils import config as config_mod
from ae_wavenet_tpu.utils.config import tiny_config


@pytest.fixture(scope="module")
def data_prefix(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    prefix = str(d / "synth")
    make_synthetic_dataset(prefix, n_clips=10, n_speakers=4, seed=0)
    return prefix


def test_numpy_stack_matches_jax(data_prefix):
    rng = np.random.default_rng(0)
    wav = rng.normal(size=8000).astype(np.float32) * 0.1
    spec = tiny_config().spec
    a = mfcc_mod.mfcc_delta_stack_np(wav, spec)
    b = np.asarray(mfcc_mod.mfcc_delta_stack(jnp.asarray(wav), spec))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_stats_normalize_dataset_to_unit(data_prefix):
    spec = tiny_config().spec
    mean, var = dataset_frame_stats(data_prefix, spec)
    assert len(mean) == 3 * spec.n_mfcc
    # applying the stats over the dataset must give ~zero-mean/unit-var
    spec_d = dc.replace(spec, norm="dataset", stats_mean=mean, stats_var=var)
    from ae_wavenet_tpu.data.dataset import PackedDataset
    ds = PackedDataset(data_prefix)
    wav = np.asarray(ds.data[ds.offsets[0] : ds.offsets[0] + 12000])
    frames = mfcc_mod.mfcc_delta_stack(
        jnp.asarray(wav, jnp.float32) * (1 / 32768.0), spec)
    normed = normalize_frames(frames, spec=spec_d)
    assert abs(float(jnp.mean(normed))) < 1.0
    assert 0.2 < float(jnp.std(normed)) < 5.0


def test_chassis_bakes_stats_and_trains(data_prefix):
    cfg = tiny_config()
    cfg = dc.replace(
        cfg,
        spec=dc.replace(cfg.spec, norm="dataset"),
        train=dc.replace(cfg.train, n_steps=4, log_every=2),
    )
    ch = Chassis(cfg, data_prefix, log_stream=io.StringIO())
    assert ch.cfg.spec.stats_mean and ch.cfg.spec.stats_var
    hist = ch.train(4)
    assert np.isfinite(hist[-1]["recon_ce"])
    # stats survive the config JSON round-trip (checkpoint persistence)
    cfg2 = config_mod.from_json(config_mod.to_json(ch.cfg))
    assert cfg2.spec.stats_mean == ch.cfg.spec.stats_mean


def test_dataset_norm_is_window_invariant(data_prefix):
    """The property window-norm lacks: the same frames normalize to the
    same values regardless of how much context surrounds them."""
    spec = tiny_config().spec
    mean, var = dataset_frame_stats(data_prefix, spec)
    spec_d = dc.replace(spec, norm="dataset", stats_mean=mean, stats_var=var)
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.normal(size=(1, 16000)).astype(np.float32) * 0.1)
    full = normalize_frames(mfcc_mod.mfcc_delta_stack(wav, spec), spec=spec_d)
    part = normalize_frames(
        mfcc_mod.mfcc_delta_stack(wav[..., :8000], spec), spec=spec_d)
    n = part.shape[-1]
    np.testing.assert_allclose(np.asarray(full[..., :n]), np.asarray(part),
                               rtol=1e-5, atol=1e-5)


def test_unset_stats_raise():
    spec = dc.replace(tiny_config().spec, norm="dataset")
    with pytest.raises(ValueError, match="stats_mean"):
        normalize_frames(jnp.zeros((1, 39, 10)), spec=spec)

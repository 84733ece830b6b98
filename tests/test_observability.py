"""Observability wiring (SURVEY.md §5 rows 1-2, 5): the chassis writes
metrics through MetricsLogger (JSONL + optional TensorBoard), can trace its
first N steps to a Perfetto file, and can police NaNs at log boundaries.

Also covers the CLI round-trip for the observability + schedule flags
(reference ``parse_tools.py`` "dozens of flags" [H], SURVEY.md §2.1).
"""

import dataclasses
import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ae_wavenet_tpu.cli.train import build_parser, config_from_args
from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset
from ae_wavenet_tpu.training.chassis import Chassis
from ae_wavenet_tpu.utils.config import tiny_config
from ae_wavenet_tpu.utils.logging import MetricsLogger


@pytest.fixture(scope="module")
def data_prefix(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    prefix = str(d / "synth")
    make_synthetic_dataset(prefix, n_clips=10, n_speakers=4, seed=0)
    return prefix


def _short_cfg(n_steps=4):
    cfg = tiny_config()
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, n_steps=n_steps, log_every=2)
    )


def test_metrics_logger_jsonl_and_strings():
    s = io.StringIO()
    log = MetricsLogger(stream=s)
    log.log(3, {"loss": jnp.float32(1.5), "saved": "/tmp/x"})
    rec = json.loads(s.getvalue())
    assert rec == {"step": 3, "loss": 1.5, "saved": "/tmp/x"}


@pytest.mark.slow
def test_tensorboard_events_written(data_prefix, tmp_path):
    tb = str(tmp_path / "tb")
    log = io.StringIO()
    ch = Chassis(_short_cfg(), data_prefix, log_stream=log, tb_logdir=tb)
    if ch.logger._tb is None:
        pytest.skip("no tensorboard writer available in this image")
    ch.train(4)
    events = [f for f in os.listdir(tb) if "tfevents" in f]
    assert events, f"no event files under {tb}"
    # the JSONL stream still carries the same records
    recs = [json.loads(l) for l in log.getvalue().splitlines()]
    assert any("recon_ce" in r for r in recs)


@pytest.mark.slow
def test_profile_trace_written(data_prefix, tmp_path):
    prof = str(tmp_path / "prof")
    log = io.StringIO()
    ch = Chassis(_short_cfg(), data_prefix, log_stream=log,
                 profile_dir=prof, profile_steps=2)
    ch.train(4)
    # jax.profiler writes plugins/profile/<ts>/*.trace.json.gz (or .pb)
    found = []
    for root, _dirs, files in os.walk(prof):
        found += [os.path.join(root, f) for f in files]
    assert found, f"no trace artifacts under {prof}"
    recs = [json.loads(l) for l in log.getvalue().splitlines()]
    assert any(r.get("profile_trace") == prof for r in recs)


def test_nan_checks_raise_on_poisoned_params(data_prefix):
    ch = Chassis(_short_cfg(), data_prefix, log_stream=io.StringIO(),
                 nan_checks=True)
    # poison one weight: the step's loss/grads go NaN and the first log
    # boundary must raise instead of silently logging NaNs
    leaves, treedef = jax.tree.flatten(ch.params)
    leaves[0] = leaves[0].at[(0,) * leaves[0].ndim].set(jnp.nan)
    ch.params = jax.tree.unflatten(treedef, leaves)
    with pytest.raises(FloatingPointError):
        ch.train(2)


@pytest.mark.slow
def test_nan_checks_pass_on_healthy_run(data_prefix):
    ch = Chassis(_short_cfg(2), data_prefix, log_stream=io.StringIO(),
                 nan_checks=True)
    hist = ch.train(2)
    assert np.isfinite(hist[-1]["recon_ce"])


# --------------------------------------------------------------------- CLI

def test_cli_flag_round_trip():
    argv = [
        "new", "--data", "X", "--preset", "vq",
        "--lr-boundaries", "1000,5000",
        "--lr-values", "1e-3,5e-4,1e-4",
        "--holdout-every", "7",
        "--ema-decay", "0.95",
        "--vq-beta", "0.5",
        "--vq-restart-thresh", "0.1",
        "--vq-use-pallas",
        "--vq-warmup-steps", "250",
        "--aux-frame-weight", "0.5",
        "--weight-decay", "0.01",
        "--n-lc-out", "96",
        "--n-global-embed", "24",
        "--lc-upsample-strides", "8,5,4,2",
        "--tb-logdir", "/tmp/tb",
        "--profile-steps", "3",
        "--nan-checks",
    ]
    a = build_parser().parse_args(argv)
    cfg = config_from_args(a)
    assert cfg.train.lr_boundaries == (1000, 5000)
    assert cfg.train.lr_values == (1e-3, 5e-4, 1e-4)
    assert cfg.train.holdout_every == 7
    assert cfg.train.weight_decay == 0.01
    assert cfg.bottleneck.ema_decay == 0.95
    assert cfg.bottleneck.vq_beta == 0.5
    assert cfg.bottleneck.vq_restart_thresh == 0.1
    assert cfg.bottleneck.vq_use_pallas is True
    assert cfg.bottleneck.vq_warmup_steps == 250
    assert cfg.train.aux_frame_weight == 0.5
    assert cfg.wavenet.n_lc_out == 96
    assert cfg.wavenet.n_global_embed == 24
    assert cfg.wavenet.lc_upsample_strides == (8, 5, 4, 2)
    # filters default to 2*stride when only strides are given
    assert cfg.wavenet.lc_upsample_filters == (16, 10, 8, 4)
    assert a.tb_logdir == "/tmp/tb" and a.profile_steps == 3 and a.nan_checks


def test_cli_vq_groups_round_trip():
    # separate from the big round-trip test: vq_groups > 1 is mutually
    # exclusive with --vq-use-pallas (construction-time validation)
    a = build_parser().parse_args(
        ["new", "--data", "X", "--preset", "vq", "--vq-groups", "4"])
    cfg = config_from_args(a)
    assert cfg.bottleneck.vq_groups == 4
    a = build_parser().parse_args(
        ["new", "--data", "X", "--preset", "vq", "--vq-groups", "4",
         "--vq-use-pallas"])
    with pytest.raises(ValueError, match="vq_groups=1 only"):
        config_from_args(a)


def test_cli_lr_schedule_length_validated():
    argv = ["new", "--data", "X", "--lr-boundaries", "100",
            "--lr-values", "1e-3"]
    a = build_parser().parse_args(argv)
    with pytest.raises(SystemExit):
        config_from_args(a)


def test_cli_resume_accepts_compute_dtype():
    a = build_parser().parse_args(
        ["resume", "--data", "X", "--ckpt-dir", "/tmp/c",
         "--compute-dtype", "float32"]
    )
    assert a.compute_dtype == "float32"

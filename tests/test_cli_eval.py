"""CLI eval entry point (reference `test.py` analogue, SURVEY §2.1):
checkpoint -> eval metrics (+ optional quality) end-to-end."""

import dataclasses as dc
import io
import json

import numpy as np

from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset
from ae_wavenet_tpu.training.chassis import Chassis
from ae_wavenet_tpu.utils.config import tiny_config


def test_cli_eval_end_to_end(tmp_path, capsys):
    from ae_wavenet_tpu.cli.eval import main

    prefix = str(tmp_path / "synth")
    make_synthetic_dataset(prefix, n_clips=6, n_speakers=3, seed=4,
                           clip_len=(9000, 14000))
    cfg = tiny_config()
    cfg = dc.replace(cfg, train=dc.replace(cfg.train, holdout_every=3,
                                           log_every=10))
    ck = str(tmp_path / "ck")
    ch = Chassis(cfg, prefix, ckpt_dir=ck, log_stream=io.StringIO())
    ch.train(10)
    ch.save()
    ch.close()

    rc = main(["--ckpt-dir", ck, "--data", prefix, "--n-batches", "2",
               "--quality", "--quality-clips", "0",
               "--quality-samples", "500", "--max-input", "9000",
               "--json", str(tmp_path / "out.jsonl")])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()
             if x.startswith("{")]
    assert lines[0]["step"] == 10
    assert lines[0]["holdout"] is True
    assert np.isfinite(lines[0]["eval_recon_ce"])
    q = lines[1]
    assert q["n_scored"] == 500
    for k in ("free_nll", "free_nll_early", "teacher_nll", "spectral_l2"):
        assert np.isfinite(q[k]), k
    saved = [json.loads(x) for x in open(tmp_path / "out.jsonl")]
    assert len(saved) == 2

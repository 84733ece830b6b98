"""Convergence A/B on the real TPU: flagship-dims VQ config trained with the
XLA stack vs the fused Pallas stack (use_pallas_stack) from identical init on
identical batches — the adoption gate for ops/gated_pallas.py beyond probe
gradients (tests) and throughput (bench.py).

Usage: python scripts/convergence_ab.py [--steps 40]
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import io
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset
from ae_wavenet_tpu.models import autoencoder as ae
from ae_wavenet_tpu.training.chassis import Chassis
from ae_wavenet_tpu.utils.config import (BottleneckConfig, RunConfig,
                                         TrainConfig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    a = ap.parse_args()

    base = RunConfig(
        bottleneck=BottleneckConfig(kind="vq"),
        train=TrainConfig(batch_sz=8, n_win=8000, n_steps=a.steps,
                          log_every=1, learning_rate=4e-4,
                          aux_frame_weight=1.0),
    )
    spec = ae.make_window_spec(base)
    with tempfile.TemporaryDirectory() as td:
        prefix = os.path.join(td, "synth")
        make_synthetic_dataset(prefix, n_clips=8, n_speakers=4,
                               clip_len=(spec.u_len + 1000, spec.u_len + 30000))
        out = {}
        for name, flag in [("xla", False), ("pallas", True)]:
            cfg = dc.replace(base, wavenet=dc.replace(
                base.wavenet, use_pallas_stack=flag))
            ch = Chassis(cfg, prefix, log_stream=io.StringIO())
            hist = ch.train(a.steps)
            out[name] = [round(h["recon_ce"], 4) for h in hist]
        diffs = [abs(x - y) for x, y in zip(out["xla"], out["pallas"])]
        print(json.dumps({
            "steps": a.steps,
            "xla_first_last": [out["xla"][0], out["xla"][-1]],
            "pallas_first_last": [out["pallas"][0], out["pallas"][-1]],
            "max_abs_ce_diff": max(diffs),
            "mean_abs_ce_diff": sum(diffs) / len(diffs),
        }))


if __name__ == "__main__":
    main()

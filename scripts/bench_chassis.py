"""End-to-end chassis-loop throughput on TPU (VERDICT r1 item 7): the
flagship config run through Chassis.train — including the host sampler, the
double-buffered device_put loader, metrics fetch at log points — as opposed
to bench.py's compute-only loop over pre-staged batches.

Usage: python scripts/bench_chassis.py [--steps 30]
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
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-win", type=int, default=24000)
    a = ap.parse_args()

    warmup = 3
    cfg = RunConfig(
        bottleneck=BottleneckConfig(kind="vq"),
        # one log window covering exactly the measured steps: log_every =
        # warmup + steps so the only fetch (and pipeline drain) is the final
        # one — a short trailing window would measure drained-pipeline steps
        train=TrainConfig(batch_sz=a.batch, n_win=a.n_win,
                          log_every=a.steps + warmup, n_steps=a.steps + warmup),
    )
    if os.environ.get("BENCH_PALLAS_STACK", "1") == "1":
        cfg = dc.replace(cfg, wavenet=dc.replace(cfg.wavenet,
                                                 use_pallas_stack=True))
    spec = ae.make_window_spec(cfg)
    with tempfile.TemporaryDirectory() as td:
        prefix = os.path.join(td, "synth")
        make_synthetic_dataset(prefix, n_clips=8, n_speakers=4,
                               clip_len=(spec.u_len + 1000, spec.u_len + 30000))
        ch = Chassis(cfg, prefix, log_stream=io.StringIO())
        # train(warmup) compiles and its end-of-call fetch drains the pipe;
        # the measuring train() then has exactly ONE log window = its steps
        ch.train(warmup)
        hist = ch.train(a.steps)
        e2e = hist[-1]["samples_per_sec"]
    print(json.dumps({
        "metric": "chassis_e2e_samples_per_sec",
        "value": round(e2e, 1),
        "config": f"b{a.batch} x {a.n_win}, {a.steps} steps, loader included",
    }))


if __name__ == "__main__":
    main()

"""VAE posterior-health diagnosis (round-4: give the VAE the evidentiary
treatment the VQ path got in round 3).

Trains the VAE bottleneck and its 'zero' (conditioning-ablated, pure-AR
baseline) and 'ae' (continuous, upper bound) twins on the same batches and
reports, per log interval, the posterior health the step already computes
(models/bottlenecks._apply_vae aux): KL nats/frame, active units (dims whose
unfloored batch-mean KL > 0.02 nats), mu variance.  Posterior collapse shows
as active_units -> 0 with recon CE ~= the zero twin's; a healthy VAE holds
active units and beats the zero twin by a margin approaching the ae twin's.

    python scripts/diag_vae.py --steps 300 --preset tiny     # CPU-runnable
    python scripts/diag_vae.py --steps 2000 --preset flagship  # TPU
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--preset", choices=("tiny", "flagship"), default="tiny")
    ap.add_argument("--workdir", default="/tmp/diag_vae")
    ap.add_argument("--free-nats", type=float, default=0.1)
    ap.add_argument("--kl-anneal", type=int, default=None,
                    help="anneal steps (default: steps//2)")
    ap.add_argument("--aux-weight", type=float, default=0.0)
    ap.add_argument("--skip-twins", action="store_true")
    ap.add_argument("--json", default=None, help="append records here")
    a = ap.parse_args()

    from ae_wavenet_tpu.data.preprocess import (make_synthetic_dataset,
                                                synthetic_fixture_current)
    from ae_wavenet_tpu.training.chassis import Chassis
    from ae_wavenet_tpu.utils.config import (BottleneckConfig, RunConfig,
                                             TrainConfig, WaveNetConfig,
                                             tiny_config)

    os.makedirs(a.workdir, exist_ok=True)
    anneal = a.kl_anneal if a.kl_anneal is not None else a.steps // 2

    if a.preset == "tiny":
        prefix = os.path.join(a.workdir, "synth_tiny")
        if not synthetic_fixture_current(prefix):
            make_synthetic_dataset(prefix, n_clips=8, n_speakers=4,
                                   clip_len=(12_000, 20_000), seed=11)
        base = tiny_config()
        base = dc.replace(
            base, train=dc.replace(base.train, n_steps=a.steps,
                                   log_every=max(a.steps // 10, 10),
                                   ckpt_every=0, holdout_every=4,
                                   learning_rate=2e-3,
                                   aux_frame_weight=a.aux_weight))
        bn_dim = base.bottleneck.n_dim
    else:
        prefix = os.path.join(a.workdir, "synth32")
        if not synthetic_fixture_current(prefix):
            make_synthetic_dataset(prefix, n_clips=32, n_speakers=8,
                                   clip_len=(120_000, 240_000), seed=11)
        base = RunConfig(
            wavenet=WaveNetConfig(use_pallas_stack=True),
            train=TrainConfig(batch_sz=4, n_win=48000, n_steps=a.steps,
                              log_every=50, ckpt_every=0, holdout_every=5,
                              steps_per_call=4,
                              aux_frame_weight=a.aux_weight),
        )
        bn_dim = base.bottleneck.n_dim

    records = []

    def emit(rec):
        records.append(rec)
        print(json.dumps(rec), flush=True)
        if a.json:
            with open(a.json, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def run(kind: str):
        bn = dc.replace(base.bottleneck, kind=kind, n_dim=bn_dim,
                        free_nats=a.free_nats, kl_anneal_steps=anneal)
        cfg = dc.replace(base, bottleneck=bn)
        ch = Chassis(cfg, prefix, ckpt_dir=None, log_stream=sys.stdout)
        hist = ch.train(a.steps)
        ev = ch.evaluate()
        ch.close()
        rec = {"kind": kind, "steps": a.steps,
               "final_eval_recon_ce": round(float(ev["recon_ce"]), 4)}
        if kind == "vae":
            last = hist[-1]
            rec.update({
                "kl_per_frame": round(float(last["kl"]), 4),
                "active_units": int(last["active_units"]),
                "n_dims": bn_dim,
                "mu_var": round(float(last["mu_var"]), 5),
                "free_nats": a.free_nats,
                "kl_anneal_steps": anneal,
                "aux_weight": a.aux_weight,
                "kl_trend": [round(float(h["kl"]), 3) for h in hist],
                "active_trend": [int(h["active_units"]) for h in hist],
            })
        emit(rec)
        return rec

    vae = run("vae")
    if not a.skip_twins:
        zero = run("zero")
        ae_rec = run("ae")
        gain_vae = zero["final_eval_recon_ce"] - vae["final_eval_recon_ce"]
        gain_ae = zero["final_eval_recon_ce"] - ae_rec["final_eval_recon_ce"]
        emit({
            "summary": {
                "vae_conditioning_gain_nats": round(gain_vae, 4),
                "continuous_conditioning_gain_nats": round(gain_ae, 4),
                "vae_gap_to_continuous": round(
                    vae["final_eval_recon_ce"]
                    - ae_rec["final_eval_recon_ce"], 4),
                "active_units": vae["active_units"],
                "n_dims": vae["n_dims"],
                "collapsed": vae["active_units"] == 0,
            }
        })
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

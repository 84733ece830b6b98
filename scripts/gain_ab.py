"""Conditioning-gain A/B: does the autoencoder beat a pure-AR decoder?

The system's raison d'etre (SURVEY §0: Chorowski et al. — latents carrying
information the decoder uses) reduced to one measured number per bottleneck:

    gain = holdout_recon_CE(zero twin) - holdout_recon_CE(bottleneck twin)

trained on IDENTICAL batches (same seed, same sampler) at flagship dims.

Round-4 measured gain ~0 everywhere; round-5 established WHY, in two parts:
(1) the v2 fixture's smoothly-interpolated modulation is ~deterministic at
1-sample horizon, so there is little conditioning-available entropy — the v3
fixture (sample-and-hold innovations at the 100 Hz frame rate,
data/preprocess.py) fixes that; (2) for VQ the gain is INFORMATION-BOUNDED
by the bottleneck's channel capacity,

    gain_vq <= latent_rate * ln(K) / sample_rate     [nats/sample]
             = 50 * ln(512) / 16000 = 0.0195 at the flagship config,

below run-to-run noise, so the VQ demonstration needs either a raised
ceiling (--latent-hz 100 --vq-k 8192 -> 0.056) or the continuous (ae/vae)
twins, whose ceiling is unbounded.  This script reports the measured gain
NEXT TO the applicable ceiling.

    python scripts/gain_ab.py --fixture v3 --steps 2000 \
        --bottlenecks zero,ae,vq [--clips 32] [--out docs/gain_ab.jsonl]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--fixture", choices=("v2", "v3"), default="v3")
    ap.add_argument("--clips", type=int, default=32)
    ap.add_argument("--speakers", type=int, default=8)
    ap.add_argument("--bottlenecks", default="zero,ae,vq")
    ap.add_argument("--vq-k", type=int, default=512)
    ap.add_argument("--vq-groups", type=int, default=1,
                    help="grouped (product) VQ: multiplies the information "
                         "ceiling by G")
    ap.add_argument("--latent-hz", type=int, choices=(50, 100), default=50)
    ap.add_argument("--batch-sz", type=int, default=4)
    ap.add_argument("--n-win", type=int, default=48000)
    ap.add_argument("--steps-per-call", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-batches", type=int, default=16,
                    help="holdout eval batches per twin (identical across "
                         "twins; more = tighter CE estimate)")
    ap.add_argument("--workdir", default="/tmp/gain_ab")
    ap.add_argument("--out", default=None, help="append JSONL records here")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CPU-runnable smoke of the whole protocol")
    a = ap.parse_args()

    import dataclasses as dc

    from ae_wavenet_tpu.data.preprocess import (make_synthetic_dataset,
                                                synthetic_fixture_current)
    from ae_wavenet_tpu.training.chassis import Chassis
    from ae_wavenet_tpu.utils.config import (BottleneckConfig, EncoderConfig,
                                             RunConfig, TrainConfig,
                                             WaveNetConfig, tiny_config)

    os.makedirs(a.workdir, exist_ok=True)
    suffix = "" if a.fixture == "v2" else f"_{a.fixture}"
    prefix = os.path.join(a.workdir, f"synth{a.clips}{suffix}")
    if not synthetic_fixture_current(prefix, a.fixture):
        if a.tiny:
            make_synthetic_dataset(prefix, n_clips=8, n_speakers=4,
                                   clip_len=(14000, 20000), seed=11,
                                   style=a.fixture)
        else:
            make_synthetic_dataset(prefix, n_clips=a.clips,
                                   n_speakers=a.speakers,
                                   clip_len=(120_000, 240_000), seed=11,
                                   style=a.fixture)

    out_f = open(a.out, "a", buffering=1) if a.out else None

    def emit(rec: dict) -> None:
        print(json.dumps(rec), flush=True)
        if out_f:
            out_f.write(json.dumps(rec) + "\n")

    def make_cfg(kind: str) -> RunConfig:
        aux_w = 0.0 if kind == "zero" else 1.0
        extra = {}
        if kind == "vae":
            extra = dict(free_nats=0.1, kl_anneal_steps=a.steps // 2)
        if a.tiny:
            cfg = tiny_config()
            return dc.replace(
                cfg,
                bottleneck=BottleneckConfig(kind=kind, n_dim=16,
                                            vq_k=min(a.vq_k, 32),
                                            vq_groups=a.vq_groups, **extra),
                train=dc.replace(cfg.train, n_steps=a.steps, log_every=50,
                                 ckpt_every=0, holdout_every=5,
                                 seed=a.seed,
                                 steps_per_call=a.steps_per_call,
                                 aux_frame_weight=aux_w),
            )
        enc = EncoderConfig()
        wn_kw = dict(use_pallas_stack=True)
        if a.latent_hz == 100:
            enc = EncoderConfig(down_stride=1)
            wn_kw.update(lc_upsample_strides=(5, 4, 4, 2),
                         lc_upsample_filters=(10, 8, 8, 4))
        return RunConfig(
            encoder=enc,
            bottleneck=BottleneckConfig(kind=kind, vq_k=a.vq_k,
                                        vq_groups=a.vq_groups, **extra),
            wavenet=WaveNetConfig(**wn_kw),
            train=TrainConfig(batch_sz=a.batch_sz, n_win=a.n_win,
                              n_steps=a.steps, log_every=50, ckpt_every=0,
                              holdout_every=5, seed=a.seed,
                              steps_per_call=a.steps_per_call,
                              aux_frame_weight=aux_w),
        )

    def run(kind: str) -> dict:
        t0 = time.time()
        cfg = make_cfg(kind)
        ch = Chassis(cfg, prefix, ckpt_dir=None, log_stream=sys.stdout)
        ch.train(a.steps)
        ev = ch.evaluate(n_batches=a.eval_batches)
        ch.close()
        rec = {"kind": kind, "steps": a.steps,
               "eval": {k: round(float(v), 5) for k, v in ev.items()
                        if k != "split"},
               "wall_s": round(time.time() - t0, 1)}
        return rec

    kinds = [k for k in a.bottlenecks.split(",") if k]
    sr = 16000
    header = {
        "gain_ab": {"fixture": a.fixture, "clips": a.clips,
                    "steps": a.steps, "seed": a.seed, "vq_k": a.vq_k,
                    "vq_groups": a.vq_groups,
                    "latent_hz": a.latent_hz, "kinds": kinds},
        # the VQ channel-capacity ceiling on teacher-forced CE gain
        # (G independent codebooks transmit G * ln(K) nats per latent frame)
        "vq_gain_ceiling_nats": round(
            a.latent_hz * a.vq_groups * math.log(a.vq_k) / sr, 4),
    }
    emit(header)
    ce = {}
    for kind in kinds:
        rec = run(kind)
        ce[kind] = rec["eval"]["recon_ce"]
        emit(rec)
    if "zero" in ce:
        gains = {k: round(ce["zero"] - v, 4) for k, v in ce.items()
                 if k != "zero"}
        emit({"summary": {"recon_ce": ce, "gain_vs_zero_nats": gains,
                          "vq_gain_ceiling_nats":
                              header["vq_gain_ceiling_nats"]}})
    if out_f:
        out_f.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

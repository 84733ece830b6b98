"""Diagnose the VQ codebook collapse seen in the 2,000-step flagship run
(docs/long_run_r3.jsonl: perplexity pinned ~1.0, commitment ~0.003).

Distinguishes the two candidate causes:
  (a) encoder output cloud is tiny from the start (scale/init problem), vs
  (b) optimization actively shrinks it (posterior collapse: the decoder's
      AR capacity suffices on this data, so commitment pressure wins).

Also trains an AE-bottleneck twin (continuous conditioning, upper bound)
and a ZERO-bottleneck twin (conditioning disabled, pure-AR baseline) on the
same batches: conditioning gain = zero_CE - ae_CE.  If the gain is ~0 the
fixture is AR-predictable and collapse is optimal; if the gain is real but
VQ still collapses, the failure is VQ *dynamics*.

    python scripts/diag_vq.py --steps 300
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cloud_stats(ch, batch):
    """Encoder-output cloud + codebook geometry on one batch."""
    import jax
    import jax.numpy as jnp

    from ae_wavenet_tpu.audio.mfcc import mfcc_delta_stack
    from ae_wavenet_tpu.audio.mulaw import int16_to_float
    from ae_wavenet_tpu.models import encoder as enc_mod
    from ae_wavenet_tpu.models.common import normalize_frames

    cfg, spec = ch.cfg, ch.spec
    wav_i16, spk = batch
    wav = int16_to_float(jnp.asarray(wav_i16))
    frames = mfcc_delta_stack(wav[..., spec.fb : spec.fe], cfg.spec)
    frames = normalize_frames(frames, spec=cfg.spec)
    z = enc_mod.apply(ch.params["encoder"], cfg.encoder, frames)
    b, d, t = z.shape
    zf = np.asarray(
        jnp.reshape(jnp.transpose(z, (0, 2, 1)), (b * t, d)), np.float32
    )
    out = {
        "n_frames": int(zf.shape[0]),
        "frame_norm_mean": float(np.linalg.norm(zf, axis=1).mean()),
        "cloud_rms_spread": float(
            np.sqrt(((zf - zf.mean(0)) ** 2).sum(1).mean())
        ),
        "per_dim_std_mean": float(zf.std(0).mean()),
    }
    if "codebook" in ch.bn_state:
        e = np.asarray(ch.bn_state["codebook"], np.float32)
        d2 = (
            (zf**2).sum(1, keepdims=True)
            - 2.0 * zf @ e.T
            + (e**2).sum(1)[None, :]
        )
        idx = d2.argmin(1)
        counts = np.bincount(idx, minlength=e.shape[0]).astype(np.float64)
        p = counts / counts.sum()
        nz = p[p > 0]
        out.update(
            codebook_rms_spread=float(
                np.sqrt(((e - e.mean(0)) ** 2).sum(1).mean())
            ),
            nearest_d2_mean=float(d2.min(1).mean()),
            batch_perplexity=float(np.exp(-(nz * np.log(nz)).sum())),
            batch_codes_used=int((counts > 0).sum()),
            ema_counts_max=float(np.asarray(ch.bn_state["ema_counts"]).max()),
            ema_counts_gt_thresh=int(
                (np.asarray(ch.bn_state["ema_counts"])
                 > ch.cfg.bottleneck.vq_restart_thresh).sum()
            ),
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--workdir", default="/tmp/long_run")
    ap.add_argument("--skip-ae", action="store_true")
    ap.add_argument("--aux-weight", type=float, default=0.0)
    ap.add_argument("--ema-decay", type=float, default=0.99)
    ap.add_argument("--vq-warmup", type=int, default=0)
    a = ap.parse_args()

    from ae_wavenet_tpu.data.preprocess import (make_synthetic_dataset,
                                                synthetic_fixture_current)
    from ae_wavenet_tpu.training.chassis import Chassis
    from ae_wavenet_tpu.utils.config import (BottleneckConfig, RunConfig,
                                             TrainConfig, WaveNetConfig)

    os.makedirs(a.workdir, exist_ok=True)
    prefix = os.path.join(a.workdir, "synth32")
    if not synthetic_fixture_current(prefix):
        make_synthetic_dataset(prefix, n_clips=32, n_speakers=8,
                               clip_len=(120_000, 240_000), seed=11)

    def run(kind: str):
        cfg = RunConfig(
            bottleneck=BottleneckConfig(kind=kind, ema_decay=a.ema_decay,
                                        vq_warmup_steps=a.vq_warmup),
            wavenet=WaveNetConfig(use_pallas_stack=True),
            train=TrainConfig(batch_sz=4, n_win=48000, n_steps=a.steps,
                              log_every=50, ckpt_every=0, holdout_every=5,
                              steps_per_call=4,
                              aux_frame_weight=a.aux_weight),
        )
        ch = Chassis(cfg, prefix, ckpt_dir=None, log_stream=sys.stdout)
        batch = ch.sampler.batch_at(0)
        if kind == "vq":
            print(json.dumps({"at": "init", **cloud_stats(ch, batch)}),
                  flush=True)
        ch.train(a.steps)
        if kind == "vq":
            print(json.dumps({"at": f"step{a.steps}",
                              **cloud_stats(ch, batch)}), flush=True)
        ev = ch.evaluate()
        print(json.dumps({"kind": kind,
                          "final_eval_recon_ce": float(ev["recon_ce"])}),
              flush=True)
        return float(ev["recon_ce"])

    ce = {"vq": run("vq")}
    if not a.skip_ae:
        ce["ae"] = run("ae")
        ce["zero"] = run("zero")
        print(json.dumps({
            "summary": ce,
            "conditioning_gain_nats": round(ce["zero"] - ce["ae"], 4),
            "vq_gap_to_continuous": round(ce["vq"] - ce["ae"], 4),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Generation-quality gate for the quantized weight-streaming samplers.

Reconstructs holdout clips from a trained checkpoint through the fused
Pallas AR cell at each weight precision (bf16 / int8 / int4) and reports
log-mel spectral distance vs the source (plus the silence-distance scale
reference) — the measured answer to "is --int8/--int4 safe for this
checkpoint?".  SURVEY.md §3.4's listen-to-the-wav loop, made quantitative.

    python scripts/quality_quantized.py --ckpt-dir DIR --data PREFIX \
        [--step best] [--clips 0,5,10,15] [--n-samples 16000] [--json out]

One JSON line per (precision, clip batch) + a summary line with the mean
spectral_l2 per precision.  TPU only (the fused kernel); on other
platforms this exits with a structured skip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--step", default=None,
                   help="checkpoint step (default latest; 'best' reads the "
                        "retention BEST sidecar)")
    p.add_argument("--data", required=True)
    p.add_argument("--clips", default="0,5,10,15")
    p.add_argument("--n-samples", type=int, default=16000)
    p.add_argument("--max-input", type=int, default=64000)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--modes", default="bf16,int8,int4")
    p.add_argument("--json", default=None)
    a = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform != "tpu":
        print(json.dumps({"skipped": "fused kernel needs TPU",
                          "platform": jax.devices()[0].platform}))
        return 75

    from ae_wavenet_tpu.audio.mulaw import int16_to_float, mu_decode
    from ae_wavenet_tpu.data.dataset import PackedDataset
    from ae_wavenet_tpu.eval.quality import log_mel_distance
    from ae_wavenet_tpu.models import registry
    from ae_wavenet_tpu.training import checkpoint as ckpt_mod

    if a.step == "best":
        info = ckpt_mod.best_info(a.ckpt_dir)
        if info is None:
            raise SystemExit(f"no BEST sidecar under {a.ckpt_dir}")
        a.step = info[0]
    step, tree, cfg = ckpt_mod.load(
        a.ckpt_dir, None if a.step is None else int(a.step))
    model = registry.get(cfg.model_kind)
    ref_params, ref_bn = model.init(jax.random.PRNGKey(0), cfg)
    params = ckpt_mod.merge_into(ref_params, tree["params"], "params")
    bn_state = ckpt_mod.merge_into(ref_bn, tree["bn_state"], "bn_state")

    ds = PackedDataset(a.data)
    clips = [int(c) for c in a.clips.split(",")]
    out_f = open(a.json, "a") if a.json else None

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        if out_f:
            out_f.write(line + "\n")
            out_f.flush()

    emit({"quality_quantized": {"ckpt": a.ckpt_dir, "step": int(step),
                                "clips": clips, "n_samples": a.n_samples,
                                "temperature": a.temperature}})
    modes = {"bf16": False, "int8": "int8", "int4": "int4"}
    means: dict[str, list[float]] = {}
    silence_ref = []
    for clip in clips:
        o, ln = int(ds.offsets[clip]), int(ds.lengths[clip])
        wav = np.asarray(ds.data[o : o + min(ln, a.max_input)])[None, :]
        spk = jnp.asarray(ds.speakers[clip : clip + 1])
        for name in a.modes.split(","):
            ids, start = model.reconstruct(
                params, bn_state, cfg, jnp.asarray(wav), spk,
                jax.random.PRNGKey(a.seed), temperature=a.temperature,
                n_samples=a.n_samples, quantized=modes[name],
            )
            n = ids.shape[-1]
            recon = np.asarray(mu_decode(ids, cfg.wavenet.n_quant))
            src = np.asarray(int16_to_float(jnp.asarray(wav)))[
                ..., start : start + n]
            d = log_mel_distance(recon, src, cfg.spec)
            sil = log_mel_distance(np.zeros_like(src), src, cfg.spec)
            emit({"clip": clip, "mode": name,
                  "spectral_l2": round(float(d), 4),
                  "spectral_l2_vs_silence": round(float(sil), 4),
                  "n_scored": int(n)})
            means.setdefault(name, []).append(float(d))
        silence_ref.append(float(sil))
    emit({"summary": {
        "mean_spectral_l2": {k: round(float(np.mean(v)), 4)
                             for k, v in means.items()},
        "mean_spectral_l2_vs_silence": round(float(np.mean(silence_ref)), 4),
    }})
    if out_f:
        out_f.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

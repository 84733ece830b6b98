"""Score generated audio from a checkpoint: free-running NLL + log-mel
spectral distance on dataset clips (holdout-style offsets).

    python scripts/eval_quality.py --ckpt-dir DIR --data PREFIX \
        [--clips 0,1,2] [--n-samples 16000] [--json out.json]

Prints one JSON line per clip batch + a summary line.  These are the
measurable replacements for the reference's listen-to-the-wav evaluation
loop (SURVEY.md §3.4/§4); recorded in BASELINE.md "generation quality".
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
                   help="checkpoint step (default latest); 'best' picks the "
                        "best-holdout checkpoint from the BEST sidecar "
                        "(runs with train.ckpt_keep retention write it)")
    p.add_argument("--data", required=True)
    p.add_argument("--clips", default="0", help="comma list of clip indices")
    p.add_argument("--n-samples", type=int, default=16000)
    p.add_argument("--max-input", type=int, default=64000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", default=None, help="also append records here")
    p.add_argument("--divergence", action="store_true",
                   help="temperature sweep + free_nll-vs-position curve "
                        "(eval/quality.divergence_report) instead of the "
                        "single-temperature report")
    p.add_argument("--temperatures", default="1.0,0.9,0.8,0.0",
                   help="comma list for --divergence (0 = greedy)")
    p.add_argument("--nll-buckets", type=int, default=8)
    a = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ae_wavenet_tpu.data.dataset import PackedDataset
    from ae_wavenet_tpu.eval.quality import (clip_quality_record,
                                             divergence_report)
    from ae_wavenet_tpu.models import registry
    from ae_wavenet_tpu.training import checkpoint as ckpt_mod

    if a.step == "best":
        info = ckpt_mod.best_info(a.ckpt_dir)
        if info is None:
            raise SystemExit(f"no BEST sidecar under {a.ckpt_dir} (only "
                             f"retention-enabled runs write one)")
        a.step = info[0]
        print(json.dumps({"best_checkpoint": {"step": info[0],
                                              "eval_recon_ce": info[1]}}),
              flush=True)
    step, tree, cfg = ckpt_mod.load(a.ckpt_dir,
                                    None if a.step is None else int(a.step))
    model = registry.get(cfg.model_kind)
    ref_params, ref_bn = model.init(jax.random.PRNGKey(0), cfg)
    # guarded rebuild (leaf-count/shape validation) shared with
    # Chassis.resume — a stale dir or hand-edited config fails loudly here
    params = ckpt_mod.merge_into(ref_params, tree["params"], "params")
    bn_state = ckpt_mod.merge_into(ref_bn, tree["bn_state"], "bn_state")

    ds = PackedDataset(a.data)
    records = []
    for ci in (int(x) for x in a.clips.split(",") if x):
        if a.divergence:
            o, l = int(ds.offsets[ci]), int(ds.lengths[ci])
            wav = np.asarray(ds.data[o : o + min(l, a.max_input)])[None, :]
            spk = jnp.asarray(ds.speakers[ci : ci + 1])
            rep = divergence_report(
                params, bn_state, cfg, jnp.asarray(wav), spk,
                jax.random.PRNGKey(a.seed), n_samples=a.n_samples,
                encode_fn=getattr(model, "encode", None),
                temperatures=tuple(float(x) for x in
                                   a.temperatures.split(",") if x),
                nll_buckets=a.nll_buckets,
            )
            rec = {"step": step, "clip": ci, "divergence": rep}
        else:
            rec = clip_quality_record(
                params, bn_state, cfg, ds, ci, jax.random.PRNGKey(a.seed),
                n_samples=a.n_samples, max_input=a.max_input,
                encode_fn=getattr(model, "encode", None), step=step)
        records.append(rec)
        print(json.dumps(rec), flush=True)

    if a.divergence:
        summary = {
            "step": step,
            "clips": len(records),
            "teacher_nll_mean": round(float(np.mean(
                [r["divergence"]["teacher_nll"] for r in records])), 4),
            "free_nll_by_temp": {
                t: round(float(np.mean(
                    [r["divergence"]["temperatures"][t]["free_nll"]
                     for r in records])), 4)
                for t in records[0]["divergence"]["temperatures"]
            },
            "spectral_l2_by_temp": {
                t: round(float(np.mean(
                    [r["divergence"]["temperatures"][t]["spectral_l2"]
                     for r in records])), 4)
                for t in records[0]["divergence"]["temperatures"]
            },
        }
    else:
        summary = {
            "step": step,
            "clips": len(records),
            "free_nll_mean": round(float(np.mean([r["free_nll"] for r in records])), 4),
            "teacher_nll_mean": round(float(np.mean([r["teacher_nll"] for r in records])), 4),
            "spectral_l2_mean": round(float(np.mean([r["spectral_l2"] for r in records])), 4),
        }
    print(json.dumps({"summary": summary}), flush=True)
    if a.json:
        with open(a.json, "a") as f:
            for r in records + [{"summary": summary}]:
                f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""CLI: offline evaluation from a checkpoint (rebuild of the reference's
``test.py`` entry point [M], SURVEY.md §2.1 "Generation / eval": load a
checkpoint, score a dataset).

    python -m ae_wavenet_tpu.cli.eval --ckpt-dir CKPT --data PREFIX \
        [--n-batches 16] [--quality] [--quality-clips 0] [--json out.jsonl]

Reports eval-mode teacher-forced metrics (recon CE + bottleneck terms,
deterministic latent path, no jitter) averaged over ``--n-batches`` windows —
from the HELD-OUT clip split when the checkpointed config has
``holdout_every`` set, else from unseen window offsets of the training
clips.  ``--quality`` adds the free-running generation metrics
(eval/quality.free_running_report) on the requested clips.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--data", required=True)
    p.add_argument("--n-batches", type=int, default=16)
    p.add_argument("--quality", action="store_true",
                   help="also run free-running generation quality")
    p.add_argument("--quality-clips", default="0")
    p.add_argument("--quality-samples", type=int, default=16000)
    p.add_argument("--max-input", type=int, default=64000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", default=None, help="append records here")
    a = p.parse_args(argv)

    import jax

    from ae_wavenet_tpu.training.chassis import Chassis
    from ae_wavenet_tpu.training import checkpoint as ckpt_mod

    # resume through the chassis so the eval step, holdout split, and
    # restore guards are EXACTLY the training ones (config comes from the
    # checkpoint — the two-phase contract); config-only read here, the one
    # array restore happens inside resume()
    _, cfg = ckpt_mod.load_config(a.ckpt_dir, a.step)
    import io

    ch = Chassis(cfg, a.data, ckpt_dir=a.ckpt_dir, log_stream=io.StringIO())
    step = ch.resume(a.step)
    ev = ch.evaluate(n_batches=a.n_batches)
    rec = {"step": step,
           "holdout": bool(cfg.train.holdout_every),
           "n_batches": a.n_batches,
           **{f"eval_{k}": round(float(v), 5) for k, v in ev.items()
              if isinstance(v, (int, float)) or hasattr(v, "dtype")}}
    records = [rec]
    print(json.dumps(rec), flush=True)

    if a.quality:
        from ae_wavenet_tpu.data.dataset import PackedDataset
        from ae_wavenet_tpu.eval.quality import clip_quality_record
        from ae_wavenet_tpu.models import registry

        model = registry.get(cfg.model_kind)
        ds = PackedDataset(a.data)
        for ci in (int(x) for x in a.quality_clips.split(",") if x):
            qrec = clip_quality_record(
                ch.params, ch.bn_state, cfg, ds, ci,
                jax.random.PRNGKey(a.seed), n_samples=a.quality_samples,
                max_input=a.max_input,
                encode_fn=getattr(model, "encode", None), step=step)
            records.append(qrec)
            print(json.dumps(qrec), flush=True)

    ch.close()
    if a.json:
        with open(a.json, "a") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

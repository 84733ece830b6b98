"""Measure the train-loop pause caused by a checkpoint save: legacy
blocking save vs the async Saver (training/checkpoint.py).

The number that matters is how long Chassis.train's step loop is stalled:
for the blocking path that's the full serialize+write; for the async path
it's only Saver.save()'s return latency (device->host snapshot + enqueue).

    python scripts/bench_ckpt.py [--flagship] [--repeats 3]

Prints one JSON line.  Recorded in BASELINE.md "checkpoint save pause".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--flagship", action="store_true",
                   help="flagship param sizes (default: tiny)")
    p.add_argument("--repeats", type=int, default=3)
    a = p.parse_args(argv)

    import jax

    from ae_wavenet_tpu.models import autoencoder as ae
    from ae_wavenet_tpu.training import checkpoint as ckpt_mod
    from ae_wavenet_tpu.training.chassis import make_optimizer
    from ae_wavenet_tpu.utils.config import (
        BottleneckConfig, RunConfig, tiny_config,
    )

    cfg = RunConfig(bottleneck=BottleneckConfig(kind="vq")) if a.flagship \
        else tiny_config()
    params, bn_state = ae.init(jax.random.PRNGKey(0), cfg)
    opt_state = make_optimizer(cfg).init(params)
    tree = {"params": params, "opt_state": opt_state, "bn_state": bn_state}
    n_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))

    def timed(fn):
        best = float("inf")
        for _ in range(a.repeats):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    with tempfile.TemporaryDirectory() as td:
        saver = ckpt_mod.Saver()
        step = [0]

        def do_blocking():
            step[0] += 1
            saver.save(td, step[0], tree, cfg, blocking=True)

        def do_async():
            step[0] += 1
            saver.save(td, step[0], tree, cfg, blocking=False)

        blocking_s = timed(do_blocking)
        async_s = timed(do_async)   # loop-visible pause only
        t0 = time.perf_counter()
        saver.wait()
        drain_s = time.perf_counter() - t0
        saver.close()

    print(json.dumps({
        "metric": "ckpt_save_pause_sec",
        "params_mb": round(n_bytes / 1e6, 1),
        "blocking_save_sec": round(blocking_s, 4),
        "async_save_return_sec": round(async_s, 4),
        "async_final_drain_sec": round(drain_s, 4),
        "pause_reduction": round(blocking_s / max(async_s, 1e-9), 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

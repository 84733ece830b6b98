"""Head-to-head: fused Pallas gated-conv stack vs the XLA formulation
(SURVEY.md §7 step 10 / VERDICT r1 item 3).

Measures on the real TPU, flagship decoder shapes:
  1. correctness: compiled stack_apply vs wavenet.apply (bf16 tolerance)
  2. forward-only latency of both paths
  3. (reference) full train-step latency of the XLA baseline

Usage: python scripts/bench_gated.py [--tile 1024] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ae_wavenet_tpu.models import wavenet
from ae_wavenet_tpu.ops import gated_pallas as gp
from ae_wavenet_tpu.utils.config import RunConfig, TrainConfig


def timeit(fn, iters, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-win", type=int, default=24000)
    a = ap.parse_args()

    cfg = RunConfig(train=TrainConfig(batch_sz=a.batch, n_win=a.n_win)).wavenet
    rf = wavenet.receptive_field(cfg)
    t_in = a.n_win + rf
    print(f"flagship decoder: B={a.batch} t_in={t_in} rf={rf} "
          f"layers={len(cfg.dilations)}", file=sys.stderr)

    params = wavenet.init(jax.random.PRNGKey(0), cfg)
    x_ids = jax.random.randint(jax.random.PRNGKey(1), (a.batch, t_in), 0,
                               cfg.n_quant)
    cond = (jax.random.normal(jax.random.PRNGKey(2),
                              (a.batch, cfg.n_lc_out, t_in)) * 0.5
            ).astype(jnp.bfloat16)
    spk = jax.random.randint(jax.random.PRNGKey(3), (a.batch,), 0,
                             cfg.n_speakers)

    xla_fwd = jax.jit(lambda p, i, c, s: wavenet.apply(
        p, cfg, i, c, s, dtype=jnp.bfloat16))
    pallas_fwd = jax.jit(lambda p, i, c, s: gp.stack_apply(
        p, cfg, i, c, s, tile=a.tile))
    full_fwd = jax.jit(lambda p, i, c, s: gp.stack_apply(
        p, cfg, i, c, s, tile=a.tile, full_fusion=True))

    ref = xla_fwd(params, x_ids, cond, spk)
    got = pallas_fwd(params, x_ids, cond, spk)
    d = np.abs(np.asarray(ref, np.float32) - np.asarray(got, np.float32))
    print(f"correctness: max abs diff {d.max():.5f} mean {d.mean():.6f}",
          file=sys.stderr)

    gotf = full_fwd(params, x_ids, cond, spk)
    df = np.abs(np.asarray(ref, np.float32) - np.asarray(gotf, np.float32))
    print(f"full-fusion correctness: max abs diff {df.max():.5f}",
          file=sys.stderr)

    t_xla = timeit(xla_fwd, a.iters, params, x_ids, cond, spk)
    t_pal = timeit(pallas_fwd, a.iters, params, x_ids, cond, spk)
    t_full = timeit(full_fwd, a.iters, params, x_ids, cond, spk)
    samples = a.batch * a.n_win
    ff_applies = gp.full_fusion_applies(cfg, a.tile)
    if not ff_applies:
        print(f"WARNING: full fusion does not apply at tile {a.tile} — the "
              f"'full_fusion_*' numbers below are the pair-path fallback",
              file=sys.stderr)
    print(json.dumps({
        "config": f"b{a.batch} x {a.n_win}, tile {a.tile}",
        "full_fusion_applied": ff_applies,
        "xla_fwd_ms": round(t_xla * 1e3, 2),
        "pallas_fwd_ms": round(t_pal * 1e3, 2),
        "full_fusion_fwd_ms": round(t_full * 1e3, 2),
        "xla_fwd_samples_per_sec": round(samples / t_xla),
        "pallas_fwd_samples_per_sec": round(samples / t_pal),
        "full_fusion_fwd_samples_per_sec": round(samples / t_full),
        "speedup": round(t_xla / t_pal, 3),
        "full_fusion_speedup_vs_pairs": round(t_pal / t_full, 3),
        "max_abs_diff": float(d.max()),
        "full_fusion_max_abs_diff": float(df.max()),
    }))


if __name__ == "__main__":
    main()

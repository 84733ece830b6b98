"""Head-to-head: fused Pallas VQ kernel vs the XLA formulation on TPU.

VERDICT r1 item 4: measure the flagship train step with ``vq_use_pallas``
on and off, plus the VQ op in isolation, and record the decision in
BASELINE.md.  Run on the real TPU (no env overrides).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench(fn, *args, warmup=3, iters=20):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ae_wavenet_tpu.models import autoencoder as ae
    from ae_wavenet_tpu.ops.vq_pallas import vq_lookup_fused
    from ae_wavenet_tpu.training.chassis import make_optimizer, make_train_step
    from ae_wavenet_tpu.utils.config import (
        BottleneckConfig, RunConfig, TrainConfig,
    )

    batch_sz = int(os.environ.get("BENCH_BATCH", "8"))
    n_win = int(os.environ.get("BENCH_NWIN", "24000"))

    # --- isolated op: XLA formulation vs fused kernel ----------------------
    # K sweep (round-3 verdict #9): at K=512 the [N, K] distance matrix fits
    # comfortably and the two tie (BASELINE.md decision row); K=4096/8192 is
    # the regime where XLA must materialize a 16k x 8k f32 matrix in HBM
    # while the fused kernel keeps per-tile distances in VMEM — the
    # hypothesized win region.  Settles keep-or-retire.
    rng = np.random.default_rng(0)
    d = 64
    for k in (512, 4096, 8192):
        for n in (4096, 16384):
            z = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
            e = jnp.asarray(rng.normal(size=(k, d)), jnp.float32)

            @jax.jit
            def xla_vq(zf, e, k=k):
                d2 = (
                    jnp.sum(jnp.square(zf), axis=1, keepdims=True)
                    - 2.0 * (zf @ e.T)
                    + jnp.sum(jnp.square(e), axis=1)[None, :]
                )
                idx = jnp.argmin(d2, axis=1)
                onehot = jax.nn.one_hot(idx, k, dtype=jnp.float32)
                return idx, onehot @ e, jnp.sum(onehot, 0), onehot.T @ zf

            dt_xla = _bench(xla_vq, z, e)
            # bound the kernel's VMEM-resident [tile_n, K] distance block to
            # ~2 MB as K grows
            tile_n = 512 if k <= 1024 else (128 if k <= 4096 else 64)
            dt_pl = _bench(lambda z, e: vq_lookup_fused(z, e, tile_n=tile_n),
                           z, e)
            print(json.dumps({
                "bench": "vq_op", "n": n, "k": k, "d": d, "tile_n": tile_n,
                "xla_us": round(dt_xla * 1e6, 1),
                "pallas_us": round(dt_pl * 1e6, 1),
                "speedup": round(dt_xla / dt_pl, 2),
            }), flush=True)

    # --- full flagship train step ------------------------------------------
    results = {}
    for use_pallas in (False, True):
        cfg = RunConfig(
            bottleneck=BottleneckConfig(kind="vq", vq_use_pallas=use_pallas),
            train=TrainConfig(batch_sz=batch_sz, n_win=n_win),
        )
        spec = ae.make_window_spec(cfg)
        params, bn_state = ae.init(jax.random.PRNGKey(0), cfg)
        optimizer = make_optimizer(cfg)
        opt_state = optimizer.init(params)
        step_fn = make_train_step(cfg, spec, optimizer, jax.random.PRNGKey(1))
        wav = jnp.asarray(
            rng.integers(-8000, 8000, (batch_sz, spec.u_len)), jnp.int16
        )
        spk = jnp.asarray(
            rng.integers(0, cfg.wavenet.n_speakers, (batch_sz,)), jnp.int32
        )

        state = [params, opt_state, bn_state]

        def step(wav, spk, state=state, step_fn=step_fn):
            p, o, b, m = step_fn(state[0], state[1], state[2], wav, spk,
                                 jnp.int32(0))
            state[0], state[1], state[2] = p, o, b
            return m

        dt = _bench(step, wav, spk, warmup=3, iters=15)
        sps = batch_sz * n_win / dt
        results["pallas" if use_pallas else "xla"] = sps
        print(json.dumps({
            "bench": "train_step", "vq_use_pallas": use_pallas,
            "batch": batch_sz, "n_win": n_win,
            "step_ms": round(dt * 1e3, 2),
            "samples_per_sec_per_chip": round(sps, 1),
        }), flush=True)

    print(json.dumps({
        "bench": "decision",
        "pallas_over_xla": round(results["pallas"] / results["xla"], 4),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

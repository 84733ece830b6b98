"""Localize the compute-vs-e2e throughput gap (BASELINE.md "Chassis e2e").

The e2e loop differs from the compute-only loop in four host-side costs per
K-step block: (1) sampling + np.stack block assembly, (2) the host->device
transfer of the staged block, (3) the dispatch of the jitted program, and
(4) the synchronous metrics device_get at log points.  On this deployment
(1 vCPU host driving a remote TPU through the axon tunnel) each of these is
candidate-dominant: this script measures them individually and then runs
Chassis.train at several K to show the residual.

Prints one JSON line with the breakdown (milliseconds).
"""

from __future__ import annotations

import dataclasses
import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, iters: int) -> float:
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ae_wavenet_tpu.data.dataset import PackedDataset, WindowSampler
    from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset
    from ae_wavenet_tpu.models import autoencoder as ae
    from ae_wavenet_tpu.training.chassis import (Chassis, make_optimizer,
                                                 make_train_step)
    from ae_wavenet_tpu.utils.config import (BottleneckConfig, RunConfig,
                                             TrainConfig)

    tiny = bool(os.environ.get("PROBE_TINY"))  # CPU smoke of the plumbing
    batch_sz = int(os.environ.get("BENCH_BATCH", "2" if tiny else "4"))
    n_win = int(os.environ.get("BENCH_NWIN", "320" if tiny else "48000"))
    k = int(os.environ.get("BENCH_STEPS_PER_CALL", "2" if tiny else "8"))

    if tiny:
        from ae_wavenet_tpu.utils.config import tiny_config

        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, batch_sz=batch_sz,
                                           n_win=n_win))
    else:
        cfg = RunConfig(
            bottleneck=BottleneckConfig(kind="vq"),
            train=TrainConfig(batch_sz=batch_sz, n_win=n_win,
                              aux_frame_weight=1.0),
        )
        cfg = dataclasses.replace(
            cfg, wavenet=dataclasses.replace(cfg.wavenet,
                                             use_pallas_stack=True))
    spec = ae.make_window_spec(cfg)

    out: dict = {"k": k, "batch": batch_sz, "n_win": n_win}

    # (0) tunnel RTT: synchronous device_get of one scalar
    one = jnp.float32(1.0) + 0  # device array
    jax.block_until_ready(one)
    out["rtt_scalar_get_ms"] = round(timed(lambda: jax.device_get(one), 20), 3)

    with tempfile.TemporaryDirectory() as td:
        prefix = os.path.join(td, "synth")
        make_synthetic_dataset(prefix, n_clips=8, n_speakers=4,
                               clip_len=(spec.u_len + 1000, spec.u_len + 30000))
        ds = PackedDataset(prefix)
        sampler = WindowSampler(ds, spec.u_len, batch_sz, seed=0)

        # (1) host block assembly: K batch_at + np.stack
        def assemble(s=0):
            ws, ks = zip(*(sampler.batch_at(s + i) for i in range(k)))
            return np.stack(ws), np.stack(ks)

        out["assemble_block_ms"] = round(timed(assemble, 5), 2)
        wav_blk, spk_blk = assemble()
        out["block_mbytes"] = round(wav_blk.nbytes / 1e6, 2)

        # (2) host->device transfer of the staged block (blocking)
        def put_block():
            jax.block_until_ready(jax.device_put(wav_blk))

        out["put_block_ms"] = round(timed(put_block, 5), 2)

        # (3) dispatch + compute of the K-step program
        params, bn_state = ae.init(jax.random.PRNGKey(0), cfg)
        optimizer = make_optimizer(cfg)
        opt_state = optimizer.init(params)
        step_fn = make_train_step(cfg, spec, optimizer, jax.random.PRNGKey(1),
                                  n_steps_per_call=k)
        dwav, dspk = jax.device_put(wav_blk), jax.device_put(spk_blk)
        # compile + warm
        for s in range(2):
            params, opt_state, bn_state, m = step_fn(
                params, opt_state, bn_state, dwav, dspk, jnp.int32(s * k))
        jax.block_until_ready(m)
        # dispatch latency: time for the python call to RETURN (async)
        t0 = time.perf_counter()
        params, opt_state, bn_state, m = step_fn(
            params, opt_state, bn_state, dwav, dspk, jnp.int32(2 * k))
        out["dispatch_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
        t0 = time.perf_counter()
        jax.block_until_ready(m)
        out["block_compute_rest_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        # steady-state compute-only rate over 3 blocks
        t0 = time.perf_counter()
        for i in range(3):
            params, opt_state, bn_state, m = step_fn(
                params, opt_state, bn_state, dwav, dspk,
                jnp.int32((3 + i) * k))
        jax.block_until_ready(m)
        dt = time.perf_counter() - t0
        out["compute_sps"] = round(3 * k * batch_sz * n_win / dt)

        # (4) metrics fetch (dict of ~10 scalars, one device_get)
        out["metrics_fetch_ms"] = round(
            timed(lambda: jax.device_get(m), 10), 2)

        # (5) e2e at several K
        for kk in sorted({1, k, 2 * k}):
            cfg_k = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, steps_per_call=kk,
                                               log_every=1 << 30))
            ch = Chassis(cfg_k, prefix, log_stream=io.StringIO())
            ch.train(2 * kk)
            n = max(3 * kk, 24 - 24 % kk)
            t0 = time.perf_counter()
            ch.train(n)
            dt = time.perf_counter() - t0
            sps = batch_sz * n_win * n / dt
            out[f"e2e_sps_k{kk}"] = round(sps)
            out[f"e2e_frac_k{kk}"] = round(sps / out["compute_sps"], 4)
            del ch

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

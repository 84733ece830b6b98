"""MFCC frontend throughput (BASELINE.md target table row 3: "MFCC
frames/sec — fused on-device XLA preprocessing; must not bottleneck
training").

Measures (a) the fused on-device MFCC+delta stack in isolation
(audio/mfcc.mfcc_delta_stack, the exact op compiled into the train step),
(b) the host numpy reference path (what a librosa-style DataLoader-worker
frontend costs), and (c) the implied share of the flagship train step.

    python scripts/bench_mfcc.py          # on TPU (or CPU for the host row)

Prints JSON lines; recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ae_wavenet_tpu.audio import mfcc as mfcc_mod
    from ae_wavenet_tpu.audio.mfcc import SpecConfig
    from ae_wavenet_tpu.audio.mulaw import int16_to_float

    spec = SpecConfig()
    batch, t = int(os.environ.get("MFCC_BATCH", "4")), \
        int(os.environ.get("MFCC_T", "50000"))
    rng = np.random.default_rng(0)
    wav_i16 = rng.integers(-8000, 8000, (batch, t)).astype(np.int16)
    n_frames = (t - spec.win_sz) // spec.hop_sz + 1 - 4 * spec.delta_wing
    platform = jax.devices()[0].platform

    # --- fused on-device path (the train step's input stage)
    @jax.jit
    def dev(wav_i16):
        return mfcc_mod.mfcc_delta_stack(int16_to_float(wav_i16), spec)

    x = jnp.asarray(wav_i16)
    jax.block_until_ready(dev(x))          # compile
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = dev(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    dev_fps = batch * n_frames / dt
    print(json.dumps({
        "bench": "mfcc_frontend", "path": f"fused_device_{platform}",
        "batch": batch, "wav_samples": t, "frames_per_call": batch * n_frames,
        "us_per_call": round(dt * 1e6, 1),
        "frames_per_sec": round(dev_fps, 1),
        "audio_samples_per_sec": round(batch * t / dt, 1),
    }), flush=True)

    # --- host numpy reference (librosa-style per-worker frontend)
    wav_f = wav_i16.astype(np.float32) / 32768.0
    mfcc_mod.mfcc_delta_stack_np(wav_f, spec)  # warm caches
    t0 = time.perf_counter()
    host_iters = 3
    for _ in range(host_iters):
        mfcc_mod.mfcc_delta_stack_np(wav_f, spec)
    dt_h = (time.perf_counter() - t0) / host_iters
    host_fps = batch * n_frames / dt_h
    print(json.dumps({
        "bench": "mfcc_frontend", "path": "host_numpy",
        "frames_per_sec": round(host_fps, 1),
        "audio_samples_per_sec": round(batch * t / dt_h, 1),
        "device_speedup": round(dev_fps / host_fps, 1),
    }), flush=True)

    # --- share of the flagship train step (must-not-bottleneck check):
    # at R samples/sec/chip train throughput, the frontend processes
    # R/hop_sz frames/sec; its isolated capacity above gives the share
    train_sps = float(os.environ.get("MFCC_TRAIN_SPS", "1740000"))
    need_fps = train_sps / spec.hop_sz
    print(json.dumps({
        "bench": "mfcc_frontend", "path": "train_step_share",
        "train_samples_per_sec_assumed": train_sps,
        "frames_per_sec_needed": round(need_fps, 1),
        "isolated_capacity_fraction": round(need_fps / dev_fps, 5),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

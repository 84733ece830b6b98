"""Benchmark: train throughput (audio samples/sec/chip) on the flagship
Chorowski config (MFCC frontend + VQ-EMA bottleneck + speaker-conditioned
WaveNet, bfloat16 matmuls).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline provenance (see BASELINE.md): the reference (hrbigelow/ae-wavenet)
publishes no numbers and its mount is empty, so the baseline is an equivalent
PyTorch CPU implementation of the same model/step measured on this machine
via scripts/torch_baseline.py; the stored constant below is its measured
samples/sec.  The north-star target is >= 10x.

Env: BENCH_REQUIRE_TPU=1 makes a failed backend probe exit 75 (a structured
"TPU unavailable, retry later" skip for queue scripts — see scripts/tpu_queue*)
instead of the driver-friendly rc=0 no-op.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile
import time

# Measured by scripts/torch_baseline.py on this machine (torch 2.13 CPU,
# single vCPU — nproc=1 — 109.7 s/step at batch 16 x 1600 samples; identical
# architecture/batch/window, frontend cost excluded in the baseline's favor;
# see BASELINE.md "local baseline").
REFERENCE_SAMPLES_PER_SEC = 233.5
_FALLBACK_BASELINE = 1.0


def _probe_backend() -> tuple[bool, str]:
    """Bounded-liveness probe of the default JAX backend in a SUBPROCESS.

    During a TPU-tunnel outage ``jax.devices()`` in this process can HANG
    (not error) — round-3 lost its one driver measurement to exactly that
    (BENCH_r03.json rc=1, VERDICT weak #3).  A subprocess + timeout converts
    both hang and init-error into a retryable failure.  Returns
    (ok, detail)."""
    import subprocess

    timeout_s = float(os.environ.get("BENCH_PROBE_TIMEOUT", "90"))
    code = (
        "import jax, jax.numpy as jnp; d = jax.devices(); "
        "x = jnp.ones((128, 128), jnp.bfloat16); "
        "jax.block_until_ready(x @ x); "
        "print(d[0].platform, len(d))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe hang (> {timeout_s:.0f}s)"
    if r.returncode != 0:
        return False, (r.stderr.strip().splitlines() or ["probe failed"])[-1]
    return True, r.stdout.strip()


def _probe_with_retry() -> bool:
    """Retry the probe with backoff; emit a structured skip line if the
    backend never comes up (a skipped bench is recorded, not a traceback)."""
    retries = int(os.environ.get("BENCH_PROBE_RETRIES", "3"))
    backoff = float(os.environ.get("BENCH_PROBE_BACKOFF", "45"))
    detail = ""
    for attempt in range(retries):
        ok, detail = _probe_backend()
        if ok:
            if attempt:
                print(f"backend up after {attempt} retries: {detail}",
                      file=sys.stderr)
            return True
        print(f"backend probe {attempt + 1}/{retries} failed: {detail}",
              file=sys.stderr)
        if attempt + 1 < retries:
            time.sleep(backoff * (attempt + 1))
    print(json.dumps({
        "metric": "train_audio_samples_per_sec_per_chip",
        "value": 0.0,
        "unit": "samples/sec/chip",
        "vs_baseline": 0.0,
        "skipped": "backend_unavailable",
        "detail": detail,
    }))
    return False


def main() -> int:
    if not _probe_with_retry():
        # rc contract: the DRIVER wants a structured skip with rc=0 (a
        # tunnel flap must not turn the round's artifact into a raw red);
        # the self-healing QUEUE scripts want a nonzero rc so their
        # wait-for-TPU-and-retry loop engages instead of recording the skip
        # as success.  BENCH_REQUIRE_TPU=1 selects the queue behavior
        # (75 = EX_TEMPFAIL).
        return 75 if os.environ.get("BENCH_REQUIRE_TPU") == "1" else 0
    import jax
    import jax.numpy as jnp

    from ae_wavenet_tpu.data.dataset import PackedDataset, WindowSampler
    from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset
    from ae_wavenet_tpu.models import autoencoder as ae
    from ae_wavenet_tpu.training.chassis import make_optimizer, make_train_step
    from ae_wavenet_tpu.utils.config import BottleneckConfig, RunConfig, TrainConfig

    # defaults from the measured v5e sweeps (BASELINE.md): long windows
    # amortize the 2046-sample receptive-field halo (b4 x 48000 = 96%
    # window efficiency -> 1.74M samples/s/chip with the fused pair stack;
    # b8 x 24000 1.66M; b8 x 32000 / b16 x 24000 exceed the compile/memory
    # budget)
    batch_sz = int(os.environ.get("BENCH_BATCH", "4"))
    n_win = int(os.environ.get("BENCH_NWIN", "48000"))
    warmup = 3
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    # aux frame head ships with the flagship VQ recipe (codebook health);
    # BENCH_AUX_WEIGHT=0 isolates its throughput cost in an A/B
    aux_w = float(os.environ.get("BENCH_AUX_WEIGHT", "1.0"))
    cfg = RunConfig(
        bottleneck=BottleneckConfig(kind="vq"),
        train=TrainConfig(batch_sz=batch_sz, n_win=n_win,
                          aux_frame_weight=aux_w),
    )
    if os.environ.get("BENCH_PALLAS_STACK", "1") == "1":
        # fused Pallas gated-conv stack (ops/gated_pallas.py): measured
        # faster than the XLA formulation on v5e — BASELINE.md head-to-head
        cfg = dataclasses.replace(
            cfg, wavenet=dataclasses.replace(cfg.wavenet,
                                             use_pallas_stack=True))
    # measurement-harness overrides for the kernel-schedule A/Bs (the knobs
    # themselves are config fields; these envs only configure THIS bench)
    if os.environ.get("BENCH_FULL_FUSION"):
        cfg = dataclasses.replace(
            cfg, wavenet=dataclasses.replace(
                cfg.wavenet,
                gated_full_fusion=os.environ["BENCH_FULL_FUSION"] == "1"))
    if os.environ.get("BENCH_BWD_GROUP"):
        cfg = dataclasses.replace(
            cfg, wavenet=dataclasses.replace(
                cfg.wavenet,
                gated_bwd_group=int(os.environ["BENCH_BWD_GROUP"])))
    spec = ae.make_window_spec(cfg)

    with tempfile.TemporaryDirectory() as td:
        prefix = os.path.join(td, "synth")
        make_synthetic_dataset(prefix, n_clips=8, n_speakers=4,
                               clip_len=(spec.u_len + 1000, spec.u_len + 30000))
        ds = PackedDataset(prefix)
        sampler = WindowSampler(ds, spec.u_len, batch_sz, seed=0)

        params, bn_state = ae.init(jax.random.PRNGKey(0), cfg)
        optimizer = make_optimizer(cfg)
        opt_state = optimizer.init(params)
        step_fn = make_train_step(cfg, spec, optimizer, jax.random.PRNGKey(1))

        batches = [sampler.batch_at(s) for s in range(4)]
        batches = [(jax.device_put(w), jax.device_put(k)) for w, k in batches]

        for s in range(warmup):
            w, k = batches[s % len(batches)]
            params, opt_state, bn_state, m = step_fn(
                params, opt_state, bn_state, w, k, jnp.int32(s)
            )
        jax.block_until_ready(m)

        t0 = time.perf_counter()
        for s in range(iters):
            w, k = batches[s % len(batches)]
            params, opt_state, bn_state, m = step_fn(
                params, opt_state, bn_state, w, k, jnp.int32(warmup + s)
            )
        jax.block_until_ready(m)
        dt = time.perf_counter() - t0

        samples_per_sec = batch_sz * n_win * iters / dt

        # --- end-to-end: the REAL user-visible loop (Chassis.train with the
        # loader thread + K-step dispatch amortization), same config/data.
        # Round-2 verdict weak #1: the compute-only number alone overstated
        # user throughput by the per-step host dispatch cost; both are
        # reported, the headline metric is the e2e one.
        e2e_sps = None
        if os.environ.get("BENCH_E2E", "1") == "1":
            try:
                import io

                from ae_wavenet_tpu.training.chassis import Chassis

                k = int(os.environ.get("BENCH_STEPS_PER_CALL", "8"))
                n_e2e = max(3 * k, iters - iters % k)  # >=3 dispatch blocks
                # log only at the segment end: a mid-segment log point costs a
                # synchronous metrics device_get (one full tunnel RTT) inside
                # the timed window, which is measurement overhead, not the
                # steady-state loop (steady state logs every log_every=100+)
                cfg_e2e = dataclasses.replace(
                    cfg, train=dataclasses.replace(cfg.train,
                                                   steps_per_call=k,
                                                   log_every=1 << 30))
                ch = Chassis(cfg_e2e, prefix, log_stream=io.StringIO())
                ch.train(2 * k)  # warmup: compile, fill loader buffers
                t0 = time.perf_counter()
                hist = ch.train(n_e2e)
                dt_e2e = time.perf_counter() - t0
                e2e_sps = batch_sz * n_win * n_e2e / dt_e2e
                del hist
            except Exception as e:  # never lose the bench line to the
                print(f"e2e segment failed: {e!r}", file=sys.stderr)
                e2e_sps = None      # e2e extra; fall back to compute-only

    n_chips = max(len(jax.devices()), 1)
    compute_value = samples_per_sec / n_chips
    value = (e2e_sps / n_chips) if e2e_sps else compute_value
    baseline = REFERENCE_SAMPLES_PER_SEC or _FALLBACK_BASELINE

    # --- MFU: analytic matmul-FLOP model (utils/flops.py, validated against
    # XLA cost analysis in tests/test_flops.py) x measured compute-only
    # throughput, vs the chip's published dense-bf16 peak
    from ae_wavenet_tpu.utils import flops as flops_mod

    dev = jax.devices()[0]
    fps = flops_mod.train_step_flops_per_sample(cfg, spec)
    achieved = fps * compute_value           # FLOP/s/chip, compute segment
    peak = (flops_mod.peak_bf16_flops(getattr(dev, "device_kind", None))
            if dev.platform == "tpu" else None)

    print(json.dumps({
        "metric": "train_audio_samples_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "samples/sec/chip",
        "vs_baseline": round(value / baseline, 2),
        # headline semantics marker (round-3 advisor): 'value' is the e2e
        # loop (loader + K-step dispatch) when that segment ran, else the
        # compute-only loop; pre-round-3 records of this metric were
        # compute-only
        "headline": "e2e" if e2e_sps else "compute_only",
        "compute_only_value": round(compute_value, 1),
        "e2e_fraction": round(value / compute_value, 4) if e2e_sps else None,
        "steps_per_call": int(os.environ.get("BENCH_STEPS_PER_CALL", "8"))
        if e2e_sps else None,
        "model_tflops_per_step": round(fps * batch_sz * n_win / 1e12, 4),
        "achieved_tflops_per_chip": round(achieved / 1e12, 2),
        "mfu": round(achieved / peak, 4) if peak else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

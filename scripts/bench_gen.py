"""Measure AR generation throughput (samples/sec and real-time factor).

North star: RTF > 1 at 16 kHz with batch-64 streaming on the fast-queue
path.  Run on the real TPU (no env overrides) or CPU (JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ae_wavenet_tpu.models import wavenet
    from ae_wavenet_tpu.ops import fastgen
    from ae_wavenet_tpu.utils.config import WaveNetConfig

    batch = int(os.environ.get("GEN_BATCH", "64"))
    t_gen = int(os.environ.get("GEN_STEPS", "4096"))
    dtype = jnp.bfloat16 if os.environ.get("GEN_DTYPE", "bf16") == "bf16" else jnp.float32

    cfg = WaveNetConfig()  # flagship decoder
    params = wavenet.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(
        rng.normal(size=(batch, cfg.n_lc_out, t_gen)) * 0.1, jnp.float32
    )
    spk = jnp.asarray(rng.integers(0, cfg.n_speakers, (batch,)), jnp.int32)
    state = fastgen.init_state(cfg, batch)

    if os.environ.get("GEN_SKIP_SCAN", "0") != "1":
        # compile + warmup with the SAME shape (a different length would
        # leave a recompile inside the timed region)
        t0 = time.perf_counter()
        ids, _ = fastgen.generate(
            params, cfg, state, cond, jax.random.PRNGKey(1), gc_ids=spk,
            dtype=dtype,
        )
        jax.block_until_ready(ids)
        compile_s = time.perf_counter() - t0

        dt = 1e30
        for r in range(3):
            t0 = time.perf_counter()
            ids, _ = fastgen.generate(
                params, cfg, state, cond, jax.random.PRNGKey(2 + r),
                gc_ids=spk, dtype=dtype,
            )
            jax.block_until_ready(ids)
            dt = min(dt, time.perf_counter() - t0)

        sps = t_gen / dt  # sequential samples/sec per stream
        print(json.dumps({
            "path": "xla_scan",
            "platform": jax.devices()[0].platform,
            "batch": batch,
            "dtype": str(dtype.__name__),
            "gen_steps": t_gen,
            "wall_s": round(dt, 3),
            "samples_per_sec_per_stream": round(sps, 1),
            "rtf_16k": round(sps / 16000.0, 3),
            "aggregate_samples_per_sec": round(sps * batch, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)

    # fused Pallas path (TPU only)
    from ae_wavenet_tpu.ops import fastgen_pallas as fp

    quantized = os.environ.get("GEN_INT8", "0") == "1"
    if os.environ.get("GEN_INT4", "0") == "1":
        quantized = "int4"
    if jax.devices()[0].platform == "tpu" and fp.supports_fused(cfg, batch):
        ids, _ = fp.generate_auto(params, cfg, state, cond,
                                  jax.random.PRNGKey(3), gc_ids=spk,
                                  quantized=quantized)
        jax.block_until_ready(ids)
        dt = 1e30
        for r in range(3):
            t0 = time.perf_counter()
            ids, _ = fp.generate_auto(params, cfg, state, cond,
                                      jax.random.PRNGKey(4 + r), gc_ids=spk,
                                      quantized=quantized)
            jax.block_until_ready(ids)
            dt = min(dt, time.perf_counter() - t0)
        sps = t_gen / dt
        print(json.dumps({
            "path": "pallas_fused" + (
                "_int4" if quantized == "int4"
                else "_int8" if quantized else ""),
            "batch": batch,
            "gen_steps": t_gen,
            "vmem_dil_max": cfg.fastgen_vmem_dil_max,
            "wall_s": round(dt, 3),
            "samples_per_sec_per_stream": round(sps, 1),
            "rtf_16k": round(sps / 16000.0, 3),
            "aggregate_samples_per_sec": round(sps * batch, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

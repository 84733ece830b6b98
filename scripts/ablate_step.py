"""Step-time composition of the flagship train step on TPU.

Times, at the bench config (b8 x n_win 24000, VQ, bf16, fused Pallas
stack): the conditioning path (frontend+encoder+bottleneck+upsample), the
decoder alone, and the full loss — each fwd-only and fwd+bwd — so the next
optimization target is always measured, not guessed (BASELINE.md "Saved-y
backward" used the first run of this).

Usage: python scripts/ablate_step.py [--iters 10] [--no-pallas]
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from ae_wavenet_tpu.audio import mfcc as mfcc_mod
from ae_wavenet_tpu.audio.mulaw import int16_to_float, mu_encode
from ae_wavenet_tpu.models import autoencoder as ae
from ae_wavenet_tpu.models import bottlenecks, encoder, wavenet
from ae_wavenet_tpu.models.common import normalize_frames
from ae_wavenet_tpu.utils.config import BottleneckConfig, RunConfig, TrainConfig


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-win", type=int, default=24000)
    ap.add_argument("--no-pallas", action="store_true")
    a = ap.parse_args()

    cfg = RunConfig(bottleneck=BottleneckConfig(kind="vq"),
                    train=TrainConfig(batch_sz=a.batch, n_win=a.n_win))
    if not a.no_pallas:
        cfg = dc.replace(cfg, wavenet=dc.replace(cfg.wavenet,
                                                 use_pallas_stack=True))
    spec = ae.make_window_spec(cfg)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(
        rng.integers(-20000, 20000, (a.batch, spec.u_len)), jnp.int16)
    spk = jnp.asarray(rng.integers(0, cfg.wavenet.n_speakers, (a.batch,)),
                      jnp.int32)
    params, bn_state = ae.init(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)

    def cond_path(p, w):
        wavf = int16_to_float(w)
        frames = mfcc_mod.mfcc_delta_stack(
            wavf[..., spec.fb : spec.fe], cfg.spec)
        frames = normalize_frames(frames, spec=cfg.spec)
        z = encoder.apply(p["encoder"], cfg.encoder, frames,
                          dtype=jnp.bfloat16)
        zq, _, _ = bottlenecks.apply(p["bottleneck"], bn_state,
                                     cfg.bottleneck, z, key, 0, True)
        return wavenet.upsample_apply(p["wavenet"], cfg.wavenet, zq,
                                      spec.up_steps, dtype=jnp.bfloat16)

    cond_const = jax.jit(cond_path)(params, wav)
    x_ids = mu_encode(int16_to_float(wav), cfg.wavenet.n_quant)[
        ..., spec.w0 : spec.w0 + spec.t_in]

    def dec_only(p, ids, c):
        return wavenet.apply(p["wavenet"], cfg.wavenet, ids, c, spk,
                             dtype=jnp.bfloat16)

    def loss(p, w):
        return ae.loss_fn(p, bn_state, cfg, spec, w, spk, key, 0)[0]

    def mean_of(f):
        return lambda *args: jnp.mean(f(*args))

    print(f"pallas_stack={not a.no_pallas} b{a.batch} x {a.n_win}")
    print(f"cond fwd ms:      {timeit(jax.jit(mean_of(cond_path)), params, wav, iters=a.iters):.1f}")
    g_cond = jax.jit(lambda p: jnp.sum(jax.flatten_util.ravel_pytree(
        jax.grad(lambda q: jnp.mean(cond_path(q, wav)))(p))[0] ** 2))
    print(f"cond fwd+bwd ms:  {timeit(g_cond, params, iters=a.iters):.1f}")
    dec_f = jax.jit(mean_of(dec_only))
    print(f"dec fwd ms:       {timeit(dec_f, params, x_ids, cond_const, iters=a.iters):.1f}")
    dec_g = jax.jit(lambda p: jnp.sum(jax.flatten_util.ravel_pytree(
        jax.grad(lambda q: jnp.mean(dec_only(q, x_ids, cond_const)))(p))[0] ** 2))
    print(f"dec fwd+bwd ms:   {timeit(dec_g, params, iters=a.iters):.1f}")
    loss_f = jax.jit(loss)
    print(f"loss fwd ms:      {timeit(loss_f, params, wav, iters=a.iters):.1f}")
    loss_g = jax.jit(lambda p: jnp.sum(jax.flatten_util.ravel_pytree(
        jax.grad(lambda q: loss(q, wav))(p))[0] ** 2))
    print(f"loss fwd+bwd ms:  {timeit(loss_g, params, iters=a.iters):.1f}")


if __name__ == "__main__":
    main()

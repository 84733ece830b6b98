"""MFCC inverter: the WaveNet conditioned directly on MFCC (encoder and
bottleneck bypassed) — a vocoder baseline.

Rebuild of the reference ``mfcc_inverter.py`` [M] (SURVEY.md §0, §2.1).
Shares the WaveNet decoder, upsampling, window bookkeeping, and generation
machinery with the autoencoder; the conditioning chain is just
frontend + upsampling (which must invert hop_sz alone, e.g. strides
(5,4,4,2) for hop 160).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.audio import mfcc as mfcc_mod
from ae_wavenet_tpu.audio.mulaw import int16_to_float, mu_encode
from ae_wavenet_tpu.geometry.vconv import Chain, Range
from ae_wavenet_tpu.models import autoencoder as ae
from ae_wavenet_tpu.models import wavenet
from ae_wavenet_tpu.utils.config import RunConfig


def cond_chain(cfg: RunConfig) -> Chain:
    return cfg.spec.geometry() + wavenet.upsample_geometry(cfg.wavenet)


def make_window_spec(cfg: RunConfig, n_win: int | None = None) -> ae.WindowSpec:
    n_win = cfg.train.n_win if n_win is None else n_win
    rf = wavenet.receptive_field(cfg.wavenet)
    t_in = n_win + rf
    chain = cond_chain(cfg)
    num, den = chain.total_stride()
    if (num, den) != (1, 1):
        raise ValueError(
            f"inverter cond chain resamples by {num}/{den}; upsample strides "
            f"must invert hop_sz exactly (e.g. (5,4,4,2) for hop 160)"
        )
    steps = chain.plan(Range(0, t_in))
    f_in = steps[0].in_want
    if f_in.b < 0:
        raise ValueError(f"cond chain plan reaches before window start: {f_in}")
    r0 = chain.in_range(Range(0, 1))
    c_off = (r0.b + r0.e) // 2
    u_len = max(f_in.e, c_off + t_in + 1)
    n_front = len(cfg.spec.geometry().layers)
    enc_in = steps[n_front].in_want if n_front < len(steps) else steps[-1].out_want
    n_up = len(cfg.wavenet.lc_upsample_strides)
    up_steps = steps[len(steps) - n_up:]
    return ae.WindowSpec(
        u_len=u_len, fb=f_in.b, fe=f_in.e, w0=c_off, t_in=t_in, rf=rf,
        n_win=n_win, n_frames=len(enc_in), up_steps=tuple(up_steps),
    )


def init(key: jax.Array, cfg: RunConfig):
    params = {
        "wavenet": wavenet.init(
            key, cfg.wavenet, n_lc_in=3 * cfg.spec.n_mfcc
        )
    }
    return params, {}


def forward(params, bn_state, cfg: RunConfig, spec: ae.WindowSpec,
            wav_i16, spk, rng, step, train):
    del bn_state, rng, step, train
    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    wav = int16_to_float(wav_i16)
    frames = mfcc_mod.mfcc_delta_stack(wav[..., spec.fb : spec.fe], cfg.spec)
    mean = jnp.mean(frames, axis=-1, keepdims=True)
    var = jnp.var(frames, axis=-1, keepdims=True)
    frames = (frames - mean) * jax.lax.rsqrt(var + 1e-6)
    cond = wavenet.upsample_apply(
        params["wavenet"], cfg.wavenet, frames, spec.up_steps, dtype=dtype
    )
    ids = mu_encode(wav, cfg.wavenet.n_quant)
    x_ids = ids[..., spec.w0 : spec.w0 + spec.t_in]
    logits = wavenet.apply(params["wavenet"], cfg.wavenet, x_ids, cond, spk, dtype=dtype)
    targets = ids[..., spec.tgt_b : spec.tgt_b + spec.n_win]
    return logits, targets, {}, {}


def loss_fn(params, bn_state, cfg, spec, wav_i16, spk, rng, step, train=True):
    logits, targets, new_bn_state, aux = forward(
        params, bn_state, cfg, spec, wav_i16, spk, rng, step, train
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    ce = -jnp.take_along_axis(logp, targets[:, None, :], axis=1)
    recon = jnp.mean(ce)
    metrics = {"loss": recon, "recon_ce": recon}
    return recon, (new_bn_state, metrics)

"""MFCC inverter: the WaveNet conditioned directly on MFCC (encoder and
bottleneck bypassed) — a vocoder baseline.

Rebuild of the reference ``mfcc_inverter.py`` [M] (SURVEY.md §0, §2.1).
Shares the WaveNet decoder, window bookkeeping (models/common.py), and
generation machinery with the autoencoder; the conditioning chain is just
frontend + upsampling (which must invert hop_sz alone, e.g. strides
(5,4,4,2) for hop 160).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.audio import mfcc as mfcc_mod
from ae_wavenet_tpu.audio.mulaw import int16_to_float, mu_encode
from ae_wavenet_tpu.geometry.vconv import Chain, Range
from ae_wavenet_tpu.models import wavenet
from ae_wavenet_tpu.models.common import (
    WindowSpec, btq_layout, make_window_spec as _make_window_spec, mu_ce,
    normalize_frames,
)
from ae_wavenet_tpu.utils.config import RunConfig


def cond_chain(cfg: RunConfig) -> Chain:
    return cfg.spec.geometry() + wavenet.upsample_geometry(cfg.wavenet)


def make_window_spec(cfg: RunConfig, n_win: int | None = None) -> WindowSpec:
    return _make_window_spec(cfg, cond_chain(cfg), n_win, "mfcc_inverter")


def init(key: jax.Array, cfg: RunConfig):
    params = {
        "wavenet": wavenet.init(key, cfg.wavenet, n_lc_in=3 * cfg.spec.n_mfcc)
    }
    return params, {}


def forward(params, bn_state, cfg: RunConfig, spec: WindowSpec,
            wav_i16, spk, rng, step, train):
    del bn_state, rng, step, train
    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    wav = int16_to_float(wav_i16)
    frames = mfcc_mod.mfcc_delta_stack(wav[..., spec.fb : spec.fe], cfg.spec)
    frames = normalize_frames(frames, spec=cfg.spec)
    cond = wavenet.upsample_apply(
        params["wavenet"], cfg.wavenet, frames, spec.up_steps, dtype=dtype
    )
    ids = mu_encode(wav, cfg.wavenet.n_quant)
    x_ids = ids[..., spec.w0 : spec.w0 + spec.t_in]
    logits = wavenet.apply(params["wavenet"], cfg.wavenet, x_ids, cond, spk,
                           dtype=dtype, btq=btq_layout(cfg))
    targets = ids[..., spec.tgt_b : spec.tgt_b + spec.n_win]
    return logits, targets, {}, {}


def loss_fn(params, bn_state, cfg, spec, wav_i16, spk, rng, step, train=True,
            axis_name=None):  # no cross-replica state; axis unused
    logits, targets, new_bn_state, aux = forward(
        params, bn_state, cfg, spec, wav_i16, spk, rng, step, train
    )
    recon = mu_ce(logits, targets, btq=btq_layout(cfg))
    metrics = {"loss": recon, "recon_ce": recon}
    return recon, (new_bn_state, metrics)


def encode(params: dict, bn_state: dict, cfg: RunConfig, wav_i16: jax.Array,
           rng: jax.Array):
    """Full-utterance conditioning (vocoder path): wav -> (cond, c_off)."""
    del bn_state, rng
    chain = cond_chain(cfg)
    r0 = chain.in_range(Range(0, 1))
    c_off = (r0.b + r0.e) // 2
    wav = int16_to_float(wav_i16)
    frames = mfcc_mod.mfcc_delta_stack(wav, cfg.spec)
    spec = make_window_spec(cfg)
    frames = normalize_frames(frames, n_ref=spec.n_frames, spec=cfg.spec)
    up = wavenet.upsample_geometry(cfg.wavenet)
    steps = up.plan(Range(0, up.out_len(frames.shape[-1])))
    cond = wavenet.upsample_apply(params["wavenet"], cfg.wavenet, frames, steps)
    return cond, c_off


def reconstruct(params, bn_state, cfg: RunConfig, wav_i16, spk, rng,
                temperature: float = 1.0, n_samples: int | None = None,
                quantized: bool = False):
    """Vocode a whole utterance from its own MFCC (same contract as
    autoencoder.reconstruct; shared driver in models/common.py)."""
    from ae_wavenet_tpu.models.common import reconstruct as _reconstruct

    return _reconstruct(encode, params, bn_state, cfg, wav_i16, spk, rng,
                        temperature, n_samples, quantized)

"""The assembled WaveNet autoencoder + exact window bookkeeping.

Rebuild of the reference ``model.py``/``autoencoder.py`` [M] (SURVEY.md
§2.1, §3.3): encoder -> bottleneck -> upsampled local conditioning ->
WaveNet decoder, combined loss = reconstruction CE + bottleneck terms.

WindowSpec — the TPU-first replacement for runtime vconv threading
------------------------------------------------------------------
All coordinate bookkeeping is resolved ONCE at config time into static ints.
Within a loader window U = [0, u_len) (wav samples):

* frontend input     U[fb : fe]           -> MFCC stack -> latents -> cond
* cond lattice       cond[j] is "centered" at wav position j + c_off where
                     c_off = center of the cond chain's receptive field; we
                     request cond outputs [0, t_in) and align them with the
                     decoder input lattice starting at wav position c_off
* decoder AR input   U[w0 : w0 + t_in),        w0 = c_off
* loss targets       U[w0 + 1 + rf : w0 + 1 + rf + n_win)

so ``logits[:, :, j]`` predicts the mu-law class of ``U[w0 + 1 + rf + j]``.
The data loader draws random clip offsets for U and ships raw int16; mu-law
targets and MFCC are computed on device inside the jitted step (the fused
input stage of the north star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.audio import mfcc as mfcc_mod
from ae_wavenet_tpu.audio.mulaw import int16_to_float, mu_encode
from ae_wavenet_tpu.geometry.vconv import Chain, Range
from ae_wavenet_tpu.models import bottlenecks, encoder, wavenet
from ae_wavenet_tpu.models.common import (  # re-exported API
    WindowSpec, btq_layout, make_window_spec as _make_window_spec, mu_ce,
    normalize_frames,
)
from ae_wavenet_tpu.utils.config import RunConfig


def cond_chain(cfg: RunConfig) -> Chain:
    """wav -> cond lattice: frontend + encoder + upsampling."""
    return (
        cfg.spec.geometry()
        + encoder.geometry(cfg.encoder)
        + wavenet.upsample_geometry(cfg.wavenet)
    )


def make_window_spec(cfg: RunConfig, n_win: int | None = None) -> WindowSpec:
    return _make_window_spec(cfg, cond_chain(cfg), n_win, "autoencoder")


def aux_frame_active(cfg: RunConfig) -> bool:
    """The latent->MFCC aux head applies when weighted AND conditioning
    exists — under the 'zero' ablation there is no latent information to
    pressure, so the head is skipped (no params, no loss term)."""
    return cfg.train.aux_frame_weight > 0 and cfg.bottleneck.kind != "zero"


def frame_align(cfg: RunConfig) -> tuple[int, int]:
    """Latent position t <-> encoder-input frame index c0 + s*t (receptive-
    field center of the encoder geometry).  Static config-time ints."""
    ch = encoder.geometry(cfg.encoder)
    r0, r1 = ch.in_range(Range(0, 1)), ch.in_range(Range(1, 2))
    c0 = (r0.b + r0.e - 1) // 2
    return c0, max((r1.b + r1.e - 1) // 2 - c0, 1)


def init(key: jax.Array, cfg: RunConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "encoder": encoder.init(k1, cfg.encoder),
        "wavenet": wavenet.init(k2, cfg.wavenet),
    }
    bn_params, bn_state = bottlenecks.init(k3, cfg.bottleneck)
    params["bottleneck"] = bn_params
    if aux_frame_active(cfg):
        # linear head zq -> normalized MFCC frame at the aligned position.
        # Guarantees the latents carry frame information from step 0: the
        # collapse measured in scripts/diag_vq.py happens because early in
        # training the decoder treats (not-yet-informative) conditioning as
        # input noise and the recon gradient drives z to a constant; this
        # head keeps information pressure on z until the decoder learns to
        # consume it (Chorowski's latents-should-encode-phonetics goal,
        # SURVEY.md §0, expressed as an explicit objective).
        n_ch = 3 * cfg.spec.n_mfcc
        d = cfg.bottleneck.n_dim
        params["aux_frame"] = {
            "w": jax.random.normal(k4, (n_ch, d), jnp.float32) / jnp.sqrt(d),
            "b": jnp.zeros((n_ch,), jnp.float32),
        }
    return params, bn_state


def forward(
    params: dict,
    bn_state: dict,
    cfg: RunConfig,
    spec: WindowSpec,
    wav_i16: jax.Array,   # [B, u_len] int16
    spk: jax.Array,       # [B] int32 speaker ids
    rng: jax.Array,
    step: jax.Array,
    train: bool,
    axis_name=None,
):
    """One teacher-forcing pass. Returns (logits, targets, new_bn_state, aux).

    axis_name: DP axis when called inside shard_map (threads to the VQ-EMA
    psum; see models/bottlenecks.apply)."""
    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    wav = int16_to_float(wav_i16)

    # --- fused on-device frontend (frame lattice matches the plan because
    # fb is hop-aligned; the stack output is exactly the encoder's input)
    frames = mfcc_mod.mfcc_delta_stack(wav[..., spec.fb : spec.fe], cfg.spec)
    frames = normalize_frames(frames, spec=cfg.spec)

    # --- encoder + bottleneck
    z = encoder.apply(params["encoder"], cfg.encoder, frames, dtype=dtype)
    rng_bn, rng_j = jax.random.split(rng)
    zq, new_bn_state, aux = bottlenecks.apply(
        params["bottleneck"], bn_state, cfg.bottleneck, z, rng_j, step, train,
        axis_name=axis_name,
    )

    # pre-jitter latents: jitter regularizes the DECODER's conditioning; aux
    # targets must stay aligned (post-jitter targets are ~jitter_p label
    # noise in exactly the loss that keeps the codebook alive)
    zq_clean = aux.pop("zq_pre_jitter", zq)
    if aux_frame_active(cfg):
        c0, s = frame_align(cfg)
        tz = zq_clean.shape[-1]
        tgt = jax.lax.stop_gradient(frames[..., c0 : c0 + s * tz : s])
        head = params["aux_frame"]
        pred = (
            jnp.einsum("bdt,cd->bct", zq_clean.astype(jnp.float32), head["w"])
            + head["b"][None, :, None]
        )
        mse = jnp.mean(jnp.square(pred - tgt.astype(jnp.float32)))
        aux = {**aux, "aux_frame_mse": mse,
               "aux_frame_loss": cfg.train.aux_frame_weight * mse}

    # --- upsample to wav rate, decoder
    cond = wavenet.upsample_apply(
        params["wavenet"], cfg.wavenet, zq, spec.up_steps, dtype=dtype
    )
    ids = mu_encode(wav, cfg.wavenet.n_quant)
    x_ids = ids[..., spec.w0 : spec.w0 + spec.t_in]
    # time-major logits when the fused Pallas stack is active: its native
    # layout, and mu_ce consumes it without the [B, Q, T] transpose
    logits = wavenet.apply(
        params["wavenet"], cfg.wavenet, x_ids, cond, spk, dtype=dtype,
        btq=btq_layout(cfg),
    )
    targets = ids[..., spec.tgt_b : spec.tgt_b + spec.n_win]
    return logits, targets, new_bn_state, aux


def encode(
    params: dict,
    bn_state: dict,
    cfg: RunConfig,
    wav_i16: jax.Array,   # [B, T] int16 — a whole utterance
    rng: jax.Array,
):
    """Full-utterance conditioning for generation: wav -> cond [B, C, Tc].

    cond column t conditions the AR step that consumes wav position
    t + c_off, where c_off is the cond-chain center offset (same alignment
    as training; see make_window_spec).  Returns (cond, c_off).
    """
    chain = cond_chain(cfg)
    r0 = chain.in_range(Range(0, 1))
    c_off = (r0.b + r0.e) // 2
    wav = int16_to_float(wav_i16)
    frames = mfcc_mod.mfcc_delta_stack(wav, cfg.spec)
    # statistics over a train-window-length slice so the conditioning
    # distribution matches training (see common.normalize_frames); with
    # spec.norm="dataset" the fixed stats make train/gen identical
    spec = make_window_spec(cfg)
    frames = normalize_frames(frames, n_ref=spec.n_frames, spec=cfg.spec)
    z = encoder.apply(params["encoder"], cfg.encoder, frames)
    zq, _, _ = bottlenecks.apply(
        params["bottleneck"], bn_state, cfg.bottleneck, z, rng,
        jnp.int32(0), train=False,
    )
    up_chain = wavenet.upsample_geometry(cfg.wavenet)
    steps = up_chain.plan(Range(0, up_chain.out_len(zq.shape[-1])))
    cond = wavenet.upsample_apply(params["wavenet"], cfg.wavenet, zq, steps)
    return cond, c_off


def reconstruct(
    params: dict,
    bn_state: dict,
    cfg: RunConfig,
    wav_i16: jax.Array,   # [B, T] int16
    spk: jax.Array,       # [B]
    rng: jax.Array,
    temperature: float = 1.0,
    n_samples: int | None = None,
    quantized: bool = False,
):
    """Autoencode a whole utterance: encode -> prime on real left context ->
    autoregressively sample (shared driver in models/common.py)."""
    from ae_wavenet_tpu.models.common import reconstruct as _reconstruct

    return _reconstruct(encode, params, bn_state, cfg, wav_i16, spk, rng,
                        temperature, n_samples, quantized)


def loss_fn(
    params, bn_state, cfg, spec, wav_i16, spk, rng, step, train: bool = True,
    axis_name=None,
):
    logits, targets, new_bn_state, aux = forward(
        params, bn_state, cfg, spec, wav_i16, spk, rng, step, train, axis_name
    )
    recon = mu_ce(logits, targets, btq=btq_layout(cfg))
    total = recon + aux.get("bn_loss", 0.0) + aux.get("aux_frame_loss", 0.0)
    metrics = {"loss": total, "recon_ce": recon, **aux}
    return total, (new_bn_state, metrics)

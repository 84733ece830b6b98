"""Shared model plumbing: window-spec construction and frame normalization.

One parameterized implementation serves both model families (autoencoder and
MFCC inverter) so alignment changes cannot silently diverge between them.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.geometry.vconv import Chain, PlanStep, Range
from ae_wavenet_tpu.models import wavenet
from ae_wavenet_tpu.utils.config import RunConfig


@dataclasses.dataclass(frozen=True)
class WindowSpec:
    """Static window layout; see models/autoencoder.py module docstring."""

    u_len: int                      # loader window length (wav samples)
    fb: int                         # frontend input = U[fb:fe] (fb is
    fe: int                         #   hop-aligned so frame lattices match)
    w0: int                         # decoder AR input start = U[w0 : w0+t_in]
    t_in: int                       # decoder input length
    rf: int                         # decoder receptive field (left context)
    n_win: int                      # loss samples per window
    n_frames: int                   # frontend frames fed downstream
    up_steps: Tuple[PlanStep, ...]  # upsample-chain trims

    @property
    def tgt_b(self) -> int:
        return self.w0 + 1 + self.rf


def btq_layout(cfg: RunConfig) -> bool:
    """True when training logits are time-major [B, T, Q].

    The ONE place the layout predicate lives: wavenet.apply's btq argument
    (producer) and mu_ce's btq argument (consumer) must both be driven by
    this, or the two silently desynchronize."""
    return (cfg.wavenet.use_pallas_stack
            and cfg.train.compute_dtype == "bfloat16")


def mu_ce(logits: jax.Array, targets: jax.Array, btq: bool = False) -> jax.Array:
    """Mean mu-law cross-entropy (reference loss: 256-way softmax CE).

    btq=True: logits are time-major [B, T, Q] — the fused Pallas stack's
    native layout (models/wavenet.apply(btq=True)).  The logsumexp
    formulation keeps the softmax reduction on the 128-lane axis and lets
    XLA fuse it with the gather — no [B, Q, T] transpose and no
    materialized log-probability tensor.  btq=False: channel-major
    [B, Q, T] (the XLA stack's native layout)."""
    lg = logits.astype(jnp.float32)
    if btq:
        lse = jax.nn.logsumexp(lg, axis=-1)
        picked = jnp.take_along_axis(lg, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(lse - picked)
    logp = jax.nn.log_softmax(lg, axis=1)
    return jnp.mean(-jnp.take_along_axis(logp, targets[:, None, :], axis=1))


def make_window_spec(cfg: RunConfig, chain: Chain, n_win: int | None,
                     what: str) -> WindowSpec:
    """Build the static window layout for a cond chain ``frontend + ... +
    upsample`` whose net stride must be 1."""
    n_win = cfg.train.n_win if n_win is None else n_win
    rf = wavenet.receptive_field(cfg.wavenet)
    t_in = n_win + rf
    num, den = chain.total_stride()
    if (num, den) != (1, 1):
        raise ValueError(
            f"{what} cond chain resamples by {num}/{den}; upsample strides "
            f"must invert the frontend stride exactly"
        )
    steps = chain.plan(Range(0, t_in))
    f_in = steps[0].in_want
    if f_in.b < 0:
        raise ValueError(f"cond chain plan reaches before window start: {f_in}")
    assert f_in.b % cfg.spec.hop_sz == 0  # plan guarantees stride alignment
    r0 = chain.in_range(Range(0, 1))
    c_off = (r0.b + r0.e) // 2
    u_len = max(f_in.e, c_off + t_in + 1)
    n_front = len(cfg.spec.geometry().layers)
    if n_front < len(steps):
        # frontend output lattice must hand off exactly to the next stage
        assert (steps[n_front - 1].out_want.as_tuple()
                == steps[n_front].in_want.as_tuple()), (
            "geometry bug: frontend/encoder plan discontinuity"
        )
        enc_in = steps[n_front].in_want
    else:
        enc_in = steps[-1].out_want
    n_up = len(cfg.wavenet.lc_upsample_strides)
    up_steps = steps[len(steps) - n_up:]
    return WindowSpec(
        u_len=u_len, fb=f_in.b, fe=f_in.e, w0=c_off, t_in=t_in, rf=rf,
        n_win=n_win, n_frames=len(enc_in), up_steps=tuple(up_steps),
    )


@dataclasses.dataclass(frozen=True)
class GenPrep:
    """Primed generation state + the alignment lattice, shared by every
    free-running driver (reconstruct, eval/quality NLL).  The offsets live
    HERE only: generation runs ``n`` steps over ``gen_cond`` and the output
    aligns with the input mu-law ``ids[..., start : start + n]``."""

    state: object                   # fastgen queue state, primed on context
    cond: jax.Array                 # full conditioning [B, C, tc]
    rng_g: jax.Array
    ids: jax.Array                  # mu-law ids of the full input [B, U']
    c_off: int                      # cond frame 0 = input sample c_off
    rf: int
    n: int

    @property
    def gen_cond(self) -> jax.Array:
        return self.cond[..., self.rf : self.rf + self.n]

    @property
    def start(self) -> int:
        return self.c_off + self.rf + 1


def prime_for_generation(encode_fn, params: dict, bn_state: dict,
                         cfg: RunConfig, wav_i16: jax.Array, spk: jax.Array,
                         rng: jax.Array,
                         n_samples: int | None = None) -> GenPrep:
    """Shared free-running prologue: encode a whole utterance with
    ``encode_fn(params, bn_state, cfg, wav_i16, rng) -> (cond, c_off)``,
    mu-law-encode the ground truth, and prime the fast queues on real left
    context (the alignment-sensitive part — keep single-sourced)."""
    from ae_wavenet_tpu.audio.mulaw import int16_to_float, mu_encode
    from ae_wavenet_tpu.ops import fastgen

    rng_e, rng_g = jax.random.split(rng)
    cond, c_off = encode_fn(params, bn_state, cfg, wav_i16, rng_e)
    rf = wavenet.receptive_field(cfg.wavenet)
    tc = int(cond.shape[-1])
    if tc <= rf + 1:
        raise ValueError(f"utterance too short: {tc} cond frames <= rf+1")
    n = tc - rf - 1 if n_samples is None else min(n_samples, tc - rf - 1)
    ids = mu_encode(int16_to_float(wav_i16), cfg.wavenet.n_quant)
    ctx = ids[..., c_off : c_off + rf + 1]
    state = fastgen.init_state(cfg.wavenet, wav_i16.shape[0])
    state = fastgen.prime(params["wavenet"], cfg.wavenet, state, ctx, cond, spk)
    return GenPrep(state=state, cond=cond, rng_g=rng_g, ids=ids,
                   c_off=c_off, rf=rf, n=n)


def reconstruct(encode_fn, params: dict, bn_state: dict, cfg: RunConfig,
                wav_i16: jax.Array, spk: jax.Array, rng: jax.Array,
                temperature: float = 1.0, n_samples: int | None = None,
                quantized: bool = False):
    """Shared generation driver: :func:`prime_for_generation`, then sample
    autoregressively with the fused cell.  Returns (mu-law ids [B, n],
    start) where the output corresponds to input positions
    [start, start + n)."""
    from ae_wavenet_tpu.ops.fastgen_pallas import generate_auto

    prep = prime_for_generation(encode_fn, params, bn_state, cfg, wav_i16,
                                spk, rng, n_samples)
    out, _ = generate_auto(
        params["wavenet"], cfg.wavenet, prep.state, prep.gen_cond,
        prep.rng_g, gc_ids=spk, temperature=temperature, quantized=quantized,
    )
    return out, prep.start


def normalize_frames(frames: jax.Array, n_ref: int | None = None,
                     spec=None) -> jax.Array:
    """Normalization of the MFCC stack, per ``spec.norm``:

    * ``"window"`` (default / reference behavior): per-window mean/var over
      the window's frames.  Generation processes whole utterances, which
      would see different statistics than training did; passing ``n_ref``
      (the training window's frame count) computes the statistics over a
      CENTERED n_ref-frame slice so the conditioning distribution matches
      training up to signal non-stationarity.
    * ``"dataset"``: fixed per-channel statistics baked into the config
      (computed once over the dataset at Chassis init, persisted in the
      checkpoint) — train and generation normalize IDENTICALLY, removing
      the mismatch entirely.
    """
    if spec is not None and spec.norm == "dataset":
        if not spec.stats_mean:
            raise ValueError(
                'spec.norm="dataset" but stats_mean/stats_var are unset '
                "(Chassis computes them at init; generation reads them "
                "from the checkpointed config)"
            )
        mean = jnp.asarray(spec.stats_mean, jnp.float32)[:, None]
        var = jnp.asarray(spec.stats_var, jnp.float32)[:, None]
        return (frames - mean) * jax.lax.rsqrt(var + 1e-6)
    t = frames.shape[-1]
    if n_ref is not None and t > n_ref:
        b = (t - n_ref) // 2
        ref = frames[..., b : b + n_ref]
    else:
        ref = frames
    mean = jnp.mean(ref, axis=-1, keepdims=True)
    var = jnp.var(ref, axis=-1, keepdims=True)
    return (frames - mean) * jax.lax.rsqrt(var + 1e-6)

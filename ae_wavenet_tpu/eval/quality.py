"""Generated-audio quality metrics.

The reference's evaluation loop ended in *listening* to generated audio
(SURVEY.md §3.4/§4) — unmeasurable.  This module replaces the ear with two
numbers, both computed on free-running generation (the model fed its OWN
samples, so compounding autoregressive error is captured — teacher-forced
CE cannot see it):

* **free-running NLL**: mean -log p(ground-truth sample | generated past)
  under the per-step predictive distributions of the AR stream.  A model
  whose rollout drifts off the data manifold scores badly here even if its
  teacher-forced CE is excellent.
* **log-mel spectral distance**: mean per-frame L2 distance between the
  log-mel spectrograms (audio/mfcc framing, pre-DCT) of the reconstruction
  and the source segment.  The metric the int8 sampling path is gated on
  (tests_tpu/test_quality_tpu.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ae_wavenet_tpu.audio.mfcc import SpecConfig, log_mel_frames_np
from ae_wavenet_tpu.audio.mulaw import int16_to_float, mu_decode
from ae_wavenet_tpu.models import common
from ae_wavenet_tpu.models import wavenet as wn
from ae_wavenet_tpu.ops import fastgen
from ae_wavenet_tpu.utils.config import RunConfig


def log_mel_distance(x, y, spec: SpecConfig) -> float:
    """Mean per-frame L2 distance between log-mel spectrograms.

    x, y: float wav arrays [..., T] on the same sample lattice (trimmed to
    the shorter length; both must cover >= one analysis window)."""
    n = min(x.shape[-1], y.shape[-1])
    if n < spec.win_sz:
        raise ValueError(f"need >= {spec.win_sz} samples, got {n}")
    a = log_mel_frames_np(np.asarray(x, np.float32)[..., :n], spec)
    b = log_mel_frames_np(np.asarray(y, np.float32)[..., :n], spec)
    return float(np.mean(np.linalg.norm(a - b, axis=-2)))


def free_running_report(
    params: dict,
    bn_state: dict,
    cfg: RunConfig,
    wav_i16,               # [B, T] int16 source utterances
    spk,                   # [B] speaker ids
    rng,
    n_samples: int | None = None,
    encode_fn=None,
    temperature: float = 1.0,
    nll_buckets: int = 0,
) -> dict:
    """Free-running quality on whole utterances.

    Encodes the source, primes the fast queues on real left context, rolls
    the sampler forward at temperature 1 feeding its OWN samples, and
    scores:

    * ``free_nll``    — mean ground-truth NLL under the rollout's per-step
                        distributions (nats; teacher-forced CE is the lower
                        bound, the gap measures AR error compounding)
    * ``teacher_nll`` — same positions, teacher forcing (the baseline)
    * ``spectral_l2`` — log-mel distance reconstruction vs source
    * ``n_scored``    — samples scored per utterance

    ``temperature`` shapes the ROLLOUT trajectory only (greedy at 0.0);
    ground truth is always scored under the untempered per-step softmax so
    free_nll stays comparable across temperatures.  ``nll_buckets`` > 0 adds
    ``free_nll_curve``: mean NLL over that many equal rollout-position
    segments — the free_nll-vs-length trend that separates compounding AR
    drift (starts near teacher_nll, grows) from a broken model (flat-high
    from position 0).

    Interpretation caveat (measured in BASELINE.md "divergence" +
    docs/divergence_fine_r5.jsonl): a rollout is a DIFFERENT sample from the
    audio distribution, so p(ground truth | generated past) falls even for a
    perfect model once trajectories decorrelate — and the 16-sample-bucket
    measurement shows the onset scales inversely with clip predictability:
    on strongly pitched clips (teacher NLL ~1 nat) decorrelation begins
    within the FIRST 16 samples, while the noisiest holdout clip never
    decorrelates over 2k samples.  ``free_nll_early`` (first 64 samples /
    4 ms) therefore *includes* the onset on pitched content: it is
    comparable across checkpoints of the same data but is NOT expected to
    approach teacher_nll.  The long-horizon quality signal is spectral_l2.

    Returns the metrics dict plus the generated ids/start offset.
    """
    prep = _prime(params, bn_state, cfg, wav_i16, spk, rng, n_samples,
                  encode_fn)
    rep = _score_rollout(prep, params, cfg, wav_i16, spk, temperature,
                         nll_buckets)
    rep.update(_teacher_and_silence(prep, params, cfg, wav_i16, spk))
    return rep


#: the JSON-reported scalar metrics of a quality record, in report order
QUALITY_KEYS = ("free_nll", "free_nll_early", "teacher_nll", "spectral_l2",
                "spectral_l2_vs_silence")


def clip_quality_record(params, bn_state, cfg, ds, clip: int, rng, *,
                        n_samples: int = 16000, max_input: int = 64000,
                        encode_fn=None, step: int | None = None) -> dict:
    """One dataset clip -> the JSON-ready free-running quality record.

    The single source of the record schema (clip slicing, metric selection,
    rounding) shared by ``cli.eval`` and ``scripts/eval_quality`` — so a
    metric added to :func:`free_running_report` reaches every reporting
    surface at once instead of drifting between hand-copied loops."""
    o, ln = int(ds.offsets[clip]), int(ds.lengths[clip])
    wav = np.asarray(ds.data[o : o + min(ln, max_input)])[None, :]
    spk = jnp.asarray(ds.speakers[clip : clip + 1])
    rep = free_running_report(params, bn_state, cfg, jnp.asarray(wav), spk,
                              rng, n_samples=n_samples, encode_fn=encode_fn)
    rec: dict = {} if step is None else {"step": step}
    rec["clip"] = clip
    rec.update({k: round(float(rep[k]), 4) for k in QUALITY_KEYS})
    rec["n_scored"] = int(rep["n_scored"])
    return rec


def _prime(params, bn_state, cfg, wav_i16, spk, rng, n_samples, encode_fn):
    """Encode + prime the fast queues (temperature-invariant; the expensive
    part shared across a divergence sweep).  Lattice single-sourced in
    models/common.prime_for_generation (shared with reconstruct())."""
    if encode_fn is None:
        from ae_wavenet_tpu.models import autoencoder as ae
        encode_fn = ae.encode
    return common.prime_for_generation(
        encode_fn, params, bn_state, cfg, wav_i16, spk,
        jax.random.PRNGKey(0) if rng is None else rng, n_samples)


def _score_rollout(prep, params, cfg, wav_i16, spk, temperature,
                   nll_buckets):
    """One rollout at ``temperature`` + its scores (per-temperature part)."""
    wcfg = cfg.wavenet
    n, ids = prep.n, prep.ids
    gen_ids, _, logits = fastgen.generate(
        params["wavenet"], wcfg, prep.state, prep.gen_cond, prep.rng_g,
        gc_ids=spk, temperature=temperature, return_logits=True,
    )
    start = prep.start
    truth = ids[..., start : start + n]                    # [B, n]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    per_pos_nll = -jnp.take_along_axis(logp, truth[:, None, :], axis=1)
    free_nll = float(jnp.mean(per_pos_nll))
    # short-horizon NLL: ground truth is only a valid conditional target
    # until the rollout's waveform phase decorrelates (~one pitch period;
    # measured: per-position NLL starts at ~teacher_nll and oscillates
    # 4<->20 nats with the pitch period thereafter — BASELINE.md "rollout
    # divergence"), so the first ~64 samples are the comparable
    # model-health number; the long-horizon signal is spectral_l2
    free_nll_early = float(jnp.mean(per_pos_nll[..., : min(64, n)]))
    curve = None
    if nll_buckets > 0:
        # never more buckets than positions (empty segments mean() to NaN,
        # which json.dumps would emit as a non-standard token)
        seg = np.array_split(np.asarray(per_pos_nll).mean(axis=(0, 1)),
                             min(nll_buckets, n))
        curve = [round(float(s.mean()), 4) for s in seg]

    recon = np.asarray(mu_decode(gen_ids, wcfg.n_quant))
    src = np.asarray(int16_to_float(wav_i16))[..., start : start + n]
    rep = {
        "free_nll": free_nll,
        "free_nll_early": free_nll_early,
        "spectral_l2": log_mel_distance(recon, src, cfg.spec),
        "temperature": temperature,
        "n_scored": n,
        "ids": gen_ids,
        "start": start,
    }
    if curve is not None:
        rep["free_nll_curve"] = curve
    return rep


def _teacher_and_silence(prep, params, cfg, wav_i16, spk):
    """Teacher-forced NLL at the same positions (the non-compounding bound:
    feed the real past, score the same targets) + the silence-distance scale
    reference.  Temperature-invariant."""
    wcfg = cfg.wavenet
    rf, n, ids, cond, start = prep.rf, prep.n, prep.ids, prep.cond, prep.start
    truth = ids[..., start : start + n]
    t_in = rf + n
    x_ids = ids[..., start - 1 - rf : start - 1 - rf + t_in]
    tf_logits = wn.apply(params["wavenet"], wcfg,
                         x_ids, cond[..., : t_in], spk)
    tf_logp = jax.nn.log_softmax(tf_logits.astype(jnp.float32), axis=1)
    teacher_nll = float(jnp.mean(
        -jnp.take_along_axis(tf_logp, truth[:, None, :], axis=1)))
    # scale reference: distance of the source to silence (a reconstruction
    # must beat this to carry any signal content at all)
    src = np.asarray(int16_to_float(wav_i16))[..., start : start + n]
    silence = log_mel_distance(np.zeros_like(src), src, cfg.spec)
    return {"teacher_nll": teacher_nll, "spectral_l2_vs_silence": silence}


def divergence_report(
    params: dict,
    bn_state: dict,
    cfg: RunConfig,
    wav_i16,
    spk,
    rng,
    n_samples: int | None = None,
    encode_fn=None,
    temperatures=(1.0, 0.9, 0.8, 0.0),
    nll_buckets: int = 8,
) -> dict:
    """Rollout-divergence diagnosis (round-3 verdict #3): sweep the sampling
    temperature and bucket free_nll by rollout position, isolating WHERE the
    teacher/free gap comes from:

    * gap shrinks a lot at lower temperature -> temperature-1.0 sampling
      noise kicks trajectories off the manifold (set the generate CLI
      default accordingly)
    * early buckets near teacher_nll, late buckets high at ALL temperatures
      -> trajectory decorrelation (inherent to the metric, judge by
      spectral_l2)
    * flat-high from bucket 0 -> the model itself is off-manifold
      (undertraining / conditioning failure)
    """
    # prime + teacher-force + silence scale ONCE (temperature-invariant);
    # only the rollout + its scoring re-run per temperature
    prep = _prime(params, bn_state, cfg, wav_i16, spk, rng, n_samples,
                  encode_fn)
    out = {"temperatures": {}, "n_scored": prep.n,
           **_teacher_and_silence(prep, params, cfg, wav_i16, spk)}
    for t in temperatures:
        rep = _score_rollout(prep, params, cfg, wav_i16, spk, t,
                             nll_buckets)
        key = "greedy" if t == 0.0 else f"{t:g}"
        out["temperatures"][key] = {
            k: rep[k] for k in ("free_nll", "free_nll_early", "spectral_l2",
                                "free_nll_curve")
            if k in rep
        }
    return out

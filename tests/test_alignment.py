"""WindowSpec alignment property (SURVEY.md §7 hard part #2): the
conditioning computed inside a training window must EQUAL the conditioning
computed over the whole utterance at the same wav positions — i.e. the
teacher-forcing targets and the upsampled latents line up sample-exactly
regardless of where the window was cut."""

import numpy as np

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.audio import mfcc as mfcc_mod
from ae_wavenet_tpu.audio.mulaw import int16_to_float
from ae_wavenet_tpu.models import autoencoder as ae
from ae_wavenet_tpu.models import encoder as enc_mod
from ae_wavenet_tpu.models import wavenet as wn_mod
from ae_wavenet_tpu.utils.config import tiny_config


def _cond_from_frames(params, cfg, frames, up_steps):
    z = enc_mod.apply(params["encoder"], cfg.encoder, frames)
    return wn_mod.upsample_apply(params["wavenet"], cfg.wavenet, z, up_steps)


def test_window_cond_matches_full_utterance():
    cfg = tiny_config()
    spec = ae.make_window_spec(cfg)
    params, _ = ae.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    wav = rng.integers(-8000, 8000, (1, 40000)).astype(np.int16)
    wavf = int16_to_float(jnp.asarray(wav))

    # full-utterance cond on the chain lattice (NO per-window normalization,
    # to isolate geometry)
    chain = ae.cond_chain(cfg)
    from ae_wavenet_tpu.geometry.vconv import Range

    frames_full = mfcc_mod.mfcc_delta_stack(wavf, cfg.spec)
    z_full = enc_mod.apply(params["encoder"], cfg.encoder, frames_full)
    up_chain = wn_mod.upsample_geometry(cfg.wavenet)
    steps_full = up_chain.plan(Range(0, up_chain.out_len(z_full.shape[-1])))
    cond_full = np.asarray(
        wn_mod.upsample_apply(params["wavenet"], cfg.wavenet, z_full, steps_full)
    )

    # Window offsets must be aligned to the chain's full lattice period
    # (hop_sz * down_stride = 320) for window cond to be a SLICE of the
    # full-utterance cond.  At other offsets the window computes a different
    # (equally valid) sub-lattice phase — within-window alignment is still
    # exact, which is what training needs; this test pins the geometry by
    # checking the aligned case exactly.
    period = cfg.spec.hop_sz * cfg.encoder.down_stride
    for g in (0, period * 7, period * 20):
        u = jnp.asarray(wav[:, g : g + spec.u_len])
        wf = int16_to_float(u)
        frames_w = mfcc_mod.mfcc_delta_stack(wf[..., spec.fb : spec.fe], cfg.spec)
        cond_w = np.asarray(
            _cond_from_frames(params, cfg, frames_w, spec.up_steps)
        )
        # window cond index j corresponds to full-utterance chain index
        # origin + j where origin is the first chain output computable from
        # wav[g + fb : ...] == (g + fb) scaled through the chain; since the
        # chain starts with Conv(win,hop) and g+fb is hop-aligned, origin =
        # out index of frame (g+fb)/hop propagated: compute via out_range.
        origin = chain.out_range(
            Range(g + spec.fb, g + spec.fe), wav.shape[1]
        ).b
        want = cond_full[..., origin : origin + spec.t_in]
        assert want.shape[-1] == spec.t_in
        np.testing.assert_allclose(
            cond_w, want, rtol=2e-4, atol=2e-4,
            err_msg=f"window at g={g} misaligned (origin {origin})",
        )


def test_targets_and_ar_inputs_are_shifted_by_one():
    """logits[j] must predict target U[tgt_b + j] from AR inputs ending at
    U[tgt_b + j - 1]: spec guarantees tgt_b == w0 + 1 + rf."""
    cfg = tiny_config()
    spec = ae.make_window_spec(cfg)
    assert spec.tgt_b == spec.w0 + 1 + spec.rf
    # the last AR input consumed for logits[j] is position w0 + rf + j
    # == tgt_b + j - 1  (strictly causal teacher forcing)
    assert spec.w0 + spec.rf == spec.tgt_b - 1
    # window long enough for targets and frontend
    assert spec.u_len >= spec.tgt_b + spec.n_win
    assert spec.u_len >= spec.fe

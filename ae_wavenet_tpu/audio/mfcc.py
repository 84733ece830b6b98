"""Jittable MFCC (+Δ, +ΔΔ) frontend — the fused on-device preprocessing stage.

Rebuild of the reference's host-side librosa frontend (``mfcc.py``,
~``ProcessWav``: 16 kHz, 25 ms / 400-sample window, 10 ms / 160-sample hop,
13 coefficients + deltas + delta-deltas = 39 channels; SURVEY.md §2.1).

TPU-first redesign (north star, BASELINE.json): instead of per-item librosa
calls in DataLoader workers, raw int16 wav streams host→HBM and the whole
frontend runs inside the compiled train step as matmul-heavy XLA ops —
framing is a gather, the mel projection and DCT are matmuls (MXU), deltas are
tiny valid convolutions.  Everything is static-shape.

Geometry: one output frame of the 39-channel stack depends on wav samples
through the chain ``Conv(win_sz, hop) ∘ Conv(2*delta_wing+1) ∘
Conv(2*delta_wing+1)`` (see :meth:`SpecConfig.geometry`); the data loader
sizes windows with it, so NO centering/padding is used (unlike librosa's
``center=True``) — valid frames only, exact alignment.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.geometry.vconv import Chain, Conv


@dataclasses.dataclass(frozen=True)
class SpecConfig:
    sample_rate: int = 16000
    win_sz: int = 400          # 25 ms
    hop_sz: int = 160          # 10 ms
    n_fft: int = 512
    n_mels: int = 40
    n_mfcc: int = 13
    delta_wing: int = 2        # delta window = 2*wing + 1 frames
    mel_fmin: float = 0.0
    mel_fmax: float | None = None  # default sample_rate / 2
    # frame normalization: "window" = per-training-window statistics (the
    # reference behavior; generation approximates them with a centered
    # slice), "dataset" = fixed per-channel statistics computed over the
    # whole dataset at Chassis init and persisted in the checkpointed
    # config — train and generation then normalize IDENTICALLY.
    norm: str = "window"
    stats_mean: Tuple[float, ...] = ()   # per-channel, len 3*n_mfcc
    stats_var: Tuple[float, ...] = ()

    @property
    def n_out_channels(self) -> int:
        return 3 * self.n_mfcc  # mfcc + delta + delta-delta

    def geometry(self) -> Chain:
        """wav -> aligned 39-ch frame lattice (valid frames only)."""
        dw = 2 * self.delta_wing + 1
        return Chain(
            [
                Conv(self.win_sz, stride=self.hop_sz, name="stft_frame"),
                Conv(dw, name="delta"),
                Conv(dw, name="delta2"),
            ]
        )


def mel_filterbank(cfg: SpecConfig) -> np.ndarray:
    """Slaney-style mel filterbank [n_mels, n_fft//2 + 1] (host constant)."""
    fmax = cfg.mel_fmax if cfg.mel_fmax is not None else cfg.sample_rate / 2.0

    def hz_to_mel(f):
        # Slaney: linear below 1 kHz, log above
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3.0)
        log_step = np.log(6.4) / 27.0
        return np.where(f >= 1000.0, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / log_step, mel)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        log_step = np.log(6.4) / 27.0
        return np.where(m >= 15.0, 1000.0 * np.exp(log_step * (m - 15.0)), m * (200.0 / 3.0))

    n_bins = cfg.n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, cfg.sample_rate / 2.0, n_bins)
    mel_pts = mel_to_hz(
        np.linspace(hz_to_mel(cfg.mel_fmin), hz_to_mel(fmax), cfg.n_mels + 2)
    )
    fb = np.zeros((cfg.n_mels, n_bins))
    for i in range(cfg.n_mels):
        lo, ctr, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        # Slaney area normalization
        fb[i] *= 2.0 / (hi - lo)
    return fb.astype(np.float32)


def dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II matrix [n_mfcc, n_mels] (host constant)."""
    k = np.arange(n_mfcc)[:, None]
    n = np.arange(n_mels)[None, :]
    m = np.cos(np.pi * k * (2 * n + 1) / (2 * n_mels)) * np.sqrt(2.0 / n_mels)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m.astype(np.float32)


def delta_kernel(wing: int) -> np.ndarray:
    """Regression delta filter, width 2*wing+1 (applied as a valid conv)."""
    n = np.arange(-wing, wing + 1, dtype=np.float32)
    return n / np.sum(n * n)


@functools.lru_cache(maxsize=8)
def _dft_matrices(win_sz: int, n_fft: int):
    """Real-DFT as two matmuls (XLA's TPU FFT is emulated and slow; the MXU
    eats a [win, 2*(nfft/2+1)] matmul for breakfast).  Returns [win, bins]
    cos/sin matrices folded with zero-padding to n_fft."""
    if win_sz > n_fft:
        raise ValueError(
            f"win_sz {win_sz} > n_fft {n_fft}: the DFT matmul would alias "
            f"samples modulo n_fft instead of truncating like rfft(n=...)"
        )
    n_bins = n_fft // 2 + 1
    t = np.arange(win_sz)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    return (
        np.cos(ang).astype(np.float32),
        np.sin(ang).astype(np.float32),
    )


@functools.partial(jax.jit, static_argnums=(1,))
def mfcc_frames(wav: jax.Array, cfg: SpecConfig) -> jax.Array:
    """wav [..., T] float32 -> MFCC [..., n_mfcc, F] with
    F = (T - win_sz)//hop + 1 (valid frames, no padding)."""
    t = wav.shape[-1]
    f = (t - cfg.win_sz) // cfg.hop_sz + 1
    idx = (
        np.arange(f)[:, None] * cfg.hop_sz + np.arange(cfg.win_sz)[None, :]
    )  # [F, win]
    frames = wav[..., idx]  # [..., F, win]
    window = jnp.asarray(np.hanning(cfg.win_sz + 1)[:-1].astype(np.float32))
    fw = frames * window
    cosm, sinm = _dft_matrices(cfg.win_sz, cfg.n_fft)
    re = fw @ jnp.asarray(cosm)
    im = fw @ jnp.asarray(sinm)
    power = jnp.square(re) + jnp.square(im)  # [..., F, bins]
    mel = power @ jnp.asarray(mel_filterbank(cfg)).T  # [..., F, n_mels]
    logmel = jnp.log(jnp.maximum(mel, 1e-10))
    mf = logmel @ jnp.asarray(dct_matrix(cfg.n_mfcc, cfg.n_mels)).T
    return jnp.swapaxes(mf, -1, -2)  # [..., n_mfcc, F]


def _delta(x: jax.Array, wing: int) -> jax.Array:
    """Valid-conv regression delta along the last axis: [..., C, F] ->
    [..., C, F - 2*wing]."""
    k = delta_kernel(wing)
    # depthwise via correlation on the last axis
    out = sum(
        k[i] * x[..., i : x.shape[-1] - 2 * wing + i] for i in range(2 * wing + 1)
    )
    return out


@functools.partial(jax.jit, static_argnums=(1,))
def mfcc_delta_stack(wav: jax.Array, cfg: SpecConfig) -> jax.Array:
    """wav [..., T] -> [..., 3*n_mfcc, F'] aligned stack of MFCC/Δ/ΔΔ.

    F' = cfg.geometry().out_len(T).  Output frame j is centered where MFCC
    frame j + 2*delta_wing is: the MFCC rows are trimmed by 2*wing per side,
    Δ by wing per side, ΔΔ untrimmed — all three aligned on the ΔΔ lattice.
    """
    w = cfg.delta_wing
    mf = mfcc_frames(wav, cfg)
    d1 = _delta(mf, w)
    d2 = _delta(d1, w)
    return jnp.concatenate(
        [mf[..., 2 * w : mf.shape[-1] - 2 * w], d1[..., w : d1.shape[-1] - w], d2],
        axis=-2,
    )


def log_mel_frames_np(wav: np.ndarray, cfg: SpecConfig) -> np.ndarray:
    """wav [..., T] float -> log-mel spectrogram [..., n_mels, F] (numpy,
    host-side).  The quality metric's representation (eval/quality): the
    same framing/filterbank as the MFCC frontend, stopped before the DCT."""
    t = wav.shape[-1]
    f = (t - cfg.win_sz) // cfg.hop_sz + 1
    idx = np.arange(f)[:, None] * cfg.hop_sz + np.arange(cfg.win_sz)[None, :]
    frames = wav[..., idx] * np.hanning(cfg.win_sz + 1)[:-1].astype(np.float32)
    cosm, sinm = _dft_matrices(cfg.win_sz, cfg.n_fft)
    power = (frames @ cosm) ** 2 + (frames @ sinm) ** 2
    mel = power @ mel_filterbank(cfg).T
    return np.swapaxes(
        np.log(np.maximum(mel, 1e-10)), -1, -2
    ).astype(np.float32)


# ------------------------------------------------------------- numpy twin

def mfcc_delta_stack_np(wav: np.ndarray, cfg: SpecConfig) -> np.ndarray:
    """Numpy twin of :func:`mfcc_delta_stack` (same matrices, same trims).

    Used for host-side work with per-clip dynamic shapes (dataset-level
    statistics at preprocess time) where jit would recompile per length.
    Framing/window/DFT/mel are single-sourced in :func:`log_mel_frames_np`
    (the quality metric's representation IS this frontend minus the DCT)."""
    logmel = np.swapaxes(log_mel_frames_np(wav, cfg), -1, -2)  # [..., F, M]
    mf = np.swapaxes(logmel @ dct_matrix(cfg.n_mfcc, cfg.n_mels).T, -1, -2)
    w = cfg.delta_wing
    k = delta_kernel(w)

    def delta(x):
        return sum(k[i] * x[..., i : x.shape[-1] - 2 * w + i]
                   for i in range(2 * w + 1))

    d1 = delta(mf)
    d2 = delta(d1)
    return np.concatenate(
        [mf[..., 2 * w : mf.shape[-1] - 2 * w],
         d1[..., w : d1.shape[-1] - w], d2], axis=-2,
    ).astype(np.float32)

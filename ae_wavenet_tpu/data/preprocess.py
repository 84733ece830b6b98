"""Offline preprocessing: sample catalog -> packed int16 ``.dat`` + index.

Rebuild of the reference ``preprocess.py`` [M] (SURVEY.md §3.5): reads a
catalog of ``<speaker_id> <audio_path>`` lines, decodes each clip at 16 kHz,
concatenates raw int16 PCM into one flat binary, and writes a JSON index of
(offset, length, speaker).  MFCC is NOT precomputed — the frontend runs
on-device at train time (north-star fused input stage).

Decoders: stdlib ``wave`` + scipy for .wav; ffmpeg subprocess for anything
else (librosa/soundfile are not in this image).  A synthetic-dataset
generator provides the hermetic test/bench fixture (BASELINE config 1's
"10 clips" stand-in, since LibriSpeech isn't bundled).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import wave
from typing import Sequence

import numpy as np


def _decode_wav(path: str) -> tuple[np.ndarray, int]:
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        sw = w.getsampwidth()
        ch = w.getnchannels()
    if sw != 2:
        raise ValueError(f"{path}: only 16-bit PCM wav supported, got width {sw}")
    x = np.frombuffer(raw, dtype="<i2")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1).astype(np.int16)
    return x, sr


def _decode_ffmpeg(path: str, sample_rate: int) -> tuple[np.ndarray, int]:
    if shutil.which("ffmpeg") is None:
        raise RuntimeError(
            f"cannot decode {path}: ffmpeg not available and file is not .wav"
        )
    out = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", path, "-f", "s16le", "-ac", "1",
         "-ar", str(sample_rate), "-"],
        capture_output=True, check=True,
    ).stdout
    return np.frombuffer(out, dtype="<i2"), sample_rate


def _resample(x: np.ndarray, sr: int, target: int) -> np.ndarray:
    if sr == target:
        return x
    from scipy.signal import resample_poly

    g = np.gcd(sr, target)
    y = resample_poly(x.astype(np.float32), target // g, sr // g)
    return np.clip(np.rint(y), -32768, 32767).astype(np.int16)


def load_clip(path: str, sample_rate: int = 16000) -> np.ndarray:
    if path.lower().endswith(".wav"):
        x, sr = _decode_wav(path)
    else:
        x, sr = _decode_ffmpeg(path, sample_rate)
    return _resample(x, sr, sample_rate)


def preprocess_catalog(
    catalog_path: str, out_prefix: str, sample_rate: int = 16000
) -> dict:
    """Catalog lines: ``<speaker_id> <audio_path>``. Writes
    ``<out_prefix>.dat`` (raw int16) and ``<out_prefix>.json`` (index)."""
    entries = []
    with open(catalog_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            spk, path = line.split(None, 1)
            entries.append((spk, path))
    speakers = sorted({spk for spk, _ in entries})
    spk_id = {s: i for i, s in enumerate(speakers)}

    clips = []
    offset = 0
    with open(out_prefix + ".dat", "wb") as dat:
        for spk, path in entries:
            x = load_clip(path, sample_rate)
            dat.write(x.astype("<i2").tobytes())
            clips.append(
                {"offset": offset, "length": int(len(x)), "speaker": spk_id[spk]}
            )
            offset += len(x)
    index = {
        "sample_rate": sample_rate,
        "n_speakers": len(speakers),
        "speakers": speakers,
        "clips": clips,
    }
    with open(out_prefix + ".json", "w") as f:
        json.dump(index, f)
    return index


def make_synthetic_dataset(
    out_prefix: str,
    n_clips: int = 10,
    n_speakers: int = 4,
    clip_len: tuple[int, int] = (40000, 80000),
    sample_rate: int = 16000,
    seed: int = 0,
) -> dict:
    """Deterministic speech-like fixture: random piecewise segments
    (~0.1-0.25 s) alternating voiced harmonics (random f0/amplitude per
    segment) and band-filtered noise bursts, with silences.  The segment
    identities are UNPREDICTABLE from past audio, so the conditioning path
    genuinely carries information (a purely stationary tone is predictable
    from AR context alone, which makes any bottleneck collapse optimal and
    useless as a test fixture).  Hermetic stand-in for the 10-clip
    LibriSpeech fixture of BASELINE config 1.

    Within every segment, pitch / per-harmonic amplitude / noise envelope
    follow random walks with fresh innovations at ~50 Hz (the latent frame
    rate), smoothly interpolated to sample rate.  This mirrors prosody in
    real speech: the drift is unpredictable from past audio at EVERY sample,
    but the non-causal encoder sees it, so conditioning lowers teacher-forced
    CE everywhere — not just at the handful of segment boundaries.  Without
    this (round-3 finding, docs/long_run_r3.jsonl), segments are exactly
    AR-predictable except at onsets, conditioning is worth ~4% of samples,
    and VQ posterior collapse (perplexity -> 1) is near-optimal."""
    rng = np.random.default_rng(seed)
    clips = []
    offset = 0
    with open(out_prefix + ".dat", "wb") as dat:
        for i in range(n_clips):
            spk = i % n_speakers
            n = int(rng.integers(*clip_len))
            x = np.zeros(n)
            pos = 0
            f0_base = 90.0 + 30.0 * spk
            hop = sample_rate // 50  # innovation rate ~= latent frame rate

            def walk(seg: int, sigma: float) -> np.ndarray:
                """exp(random walk) at 50 Hz, interpolated to sample rate;
                starts at 1.0 so segment-level scales stay meaningful."""
                nfr = seg // hop + 2
                w = np.cumsum(rng.normal(0.0, sigma, size=nfr))
                w -= w[0]
                return np.exp(np.interp(np.arange(seg) / hop,
                                        np.arange(nfr), w))

            while pos < n:
                seg = int(rng.integers(sample_rate // 10, sample_rate // 4))
                seg = min(seg, n - pos)
                kind = rng.random()
                if kind < 0.45:  # voiced: harmonics, drifting f0 + AM
                    f0 = f0_base * rng.uniform(0.7, 2.2)
                    ph = rng.uniform(0, 2 * np.pi)
                    # integrate the instantaneous (drifting) f0 to a phase
                    phase = 2.0 * np.pi * np.cumsum(f0 * walk(seg, 0.035)) / sample_rate
                    s = np.zeros(seg)
                    for k in range(1, 5):
                        a_k = (rng.uniform(0.1, 1.0) / k) * walk(seg, 0.12)
                        s += a_k * np.sin(k * phase + ph * k)
                    s *= rng.uniform(0.3, 1.0)
                elif kind < 0.8:  # unvoiced: band-passed noise burst, AM
                    w = rng.normal(size=seg)
                    fc = rng.uniform(500, 6000)
                    bw = rng.uniform(300, 1500)
                    spec = np.fft.rfft(w)
                    f = np.fft.rfftfreq(seg, 1 / sample_rate)
                    spec *= np.exp(-0.5 * ((f - fc) / bw) ** 2)
                    s = np.fft.irfft(spec, seg) * walk(seg, 0.18)
                    s *= rng.uniform(0.2, 0.7) / (np.std(s) + 1e-9)
                else:  # silence-ish
                    s = 0.01 * rng.normal(size=seg)
                # short fade at the segment edges to avoid clicks
                env = np.minimum(1.0, np.minimum(np.arange(seg), seg - 1 - np.arange(seg)) / 80.0)
                x[pos : pos + seg] = s * env
                pos += seg
            x += 0.005 * rng.normal(size=n)
            x16 = np.clip(np.rint(x / np.max(np.abs(x)) * 12000), -32768, 32767).astype("<i2")
            dat.write(x16.tobytes())
            clips.append({"offset": offset, "length": n, "speaker": spk})
            offset += n
    index = {
        "sample_rate": sample_rate,
        "n_speakers": n_speakers,
        "speakers": [f"synth{j}" for j in range(n_speakers)],
        "clips": clips,
    }
    with open(out_prefix + ".json", "w") as f:
        json.dump(index, f)
    return index


def dataset_frame_stats(prefix: str, spec_cfg) -> tuple:
    """Per-channel mean/variance of the 39-ch MFCC stack over the whole
    packed dataset (host-side, numpy).  Backs ``SpecConfig.norm="dataset"``:
    fixed statistics shared by training and generation, removing the
    train/gen window-statistics mismatch of ``norm="window"``.

    Returns (mean, var) as float tuples of length 3*n_mfcc."""
    from ae_wavenet_tpu.audio.mfcc import mfcc_delta_stack_np
    from ae_wavenet_tpu.geometry.vconv import Range

    with open(prefix + ".json") as f:
        index = json.load(f)
    dat = np.memmap(prefix + ".dat", dtype="<i2", mode="r")
    n_ch = 3 * spec_cfg.n_mfcc
    s1 = np.zeros(n_ch, np.float64)
    s2 = np.zeros(n_ch, np.float64)
    count = 0
    min_len = len(spec_cfg.geometry().in_range(Range(0, 1)))
    for clip in index["clips"]:
        x = dat[clip["offset"] : clip["offset"] + clip["length"]]
        if len(x) < min_len:
            continue
        frames = mfcc_delta_stack_np(
            x.astype(np.float32) * (1.0 / 32768.0), spec_cfg
        )  # [n_ch, F]
        s1 += frames.sum(axis=-1)
        s2 += (frames.astype(np.float64) ** 2).sum(axis=-1)
        count += frames.shape[-1]
    if count == 0:
        raise ValueError(f"no clip under {prefix} is long enough for stats")
    mean = s1 / count
    var = np.maximum(s2 / count - mean**2, 1e-12)
    return tuple(float(v) for v in mean), tuple(float(v) for v in var)

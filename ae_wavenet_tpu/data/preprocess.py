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
    """Deterministic speech-like fixture: per-speaker fundamental with
    harmonics, amplitude modulation and noise.  Hermetic stand-in for the
    10-clip LibriSpeech fixture of BASELINE config 1."""
    rng = np.random.default_rng(seed)
    clips = []
    offset = 0
    with open(out_prefix + ".dat", "wb") as dat:
        for i in range(n_clips):
            spk = i % n_speakers
            n = int(rng.integers(*clip_len))
            t = np.arange(n) / sample_rate
            f0 = 90.0 + 35.0 * spk + 8.0 * np.sin(2 * np.pi * 1.3 * t)
            phase = 2 * np.pi * np.cumsum(f0) / sample_rate
            x = sum(
                (0.5 / k) * np.sin(k * phase) for k in range(1, 5)
            )
            am = 0.55 + 0.45 * np.sin(2 * np.pi * (2.0 + 0.5 * spk) * t + rng.uniform(0, 6.28))
            x = x * am + 0.01 * rng.normal(size=n)
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

"""MFCC frontend: parity vs an independent numpy/scipy oracle + geometry.

librosa is not installed in this image (SURVEY.md §4), so the oracle is an
independent straight-line numpy implementation (different code path: scipy
DCT, per-frame python loop, np.fft) checked to ~1e-4.
"""

import numpy as np
import pytest
import scipy.fft

from ae_wavenet_tpu.audio import mfcc as M


CFG = M.SpecConfig()


def oracle_mfcc(wav: np.ndarray, cfg: M.SpecConfig) -> np.ndarray:
    """Independent per-frame MFCC: [T] -> [n_mfcc, F]."""
    fb = M.mel_filterbank(cfg)
    window = np.hanning(cfg.win_sz + 1)[:-1]
    f = (len(wav) - cfg.win_sz) // cfg.hop_sz + 1
    out = np.zeros((cfg.n_mfcc, f), np.float64)
    for j in range(f):
        fr = wav[j * cfg.hop_sz : j * cfg.hop_sz + cfg.win_sz] * window
        spec = np.fft.rfft(fr, n=cfg.n_fft)
        mel = fb @ (np.abs(spec) ** 2)
        logmel = np.log(np.maximum(mel, 1e-10))
        out[:, j] = scipy.fft.dct(logmel, type=2, norm="ortho")[: cfg.n_mfcc]
    return out


def oracle_delta(c: np.ndarray, wing: int) -> np.ndarray:
    k = np.arange(-wing, wing + 1)
    denom = np.sum(k * k)
    f = c.shape[-1] - 2 * wing
    return np.stack(
        [sum(k[i] * c[:, j + i] for i in range(2 * wing + 1)) / denom for j in range(f)],
        axis=-1,
    )


@pytest.fixture(scope="module")
def wav():
    rng = np.random.default_rng(0)
    t = np.arange(16000 * 2) / 16000
    x = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.normal(size=t.shape)
    return x.astype(np.float32)


def test_mfcc_matches_oracle(wav):
    ours = np.asarray(M.mfcc_frames(wav, CFG))
    ref = oracle_mfcc(wav.astype(np.float64), CFG)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_stack_matches_oracle_and_geometry(wav):
    ours = np.asarray(M.mfcc_delta_stack(wav, CFG))
    geo_f = CFG.geometry().out_len(len(wav))
    assert ours.shape == (3 * CFG.n_mfcc, geo_f)

    c = oracle_mfcc(wav.astype(np.float64), CFG)
    d1 = oracle_delta(c, CFG.delta_wing)
    d2 = oracle_delta(d1, CFG.delta_wing)
    w = CFG.delta_wing
    ref = np.concatenate(
        [c[:, 2 * w : c.shape[-1] - 2 * w], d1[:, w : d1.shape[-1] - w], d2], axis=0
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_batched_and_jit_consistent(wav):
    two = np.stack([wav, wav[::-1].copy()])
    batched = np.asarray(M.mfcc_delta_stack(two, CFG))
    single0 = np.asarray(M.mfcc_delta_stack(two[0], CFG))
    single1 = np.asarray(M.mfcc_delta_stack(two[1], CFG))
    np.testing.assert_allclose(batched[0], single0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(batched[1], single1, rtol=1e-5, atol=1e-5)


def test_windowed_equals_full_via_geometry(wav):
    """The loader contract: computing the stack on a geometry-sized window
    must equal the full computation on the target frame range."""
    from ae_wavenet_tpu.geometry.vconv import Range

    chain = CFG.geometry()
    full = np.asarray(M.mfcc_delta_stack(wav, CFG))
    fmax = full.shape[-1]
    want = Range(fmax // 3, fmax // 3 + 20)
    r = chain.in_range(want, len(wav))
    win = np.asarray(M.mfcc_delta_stack(wav[r.b : r.e], CFG))
    np.testing.assert_allclose(
        win, full[:, want.b : want.e], rtol=1e-4, atol=1e-4
    )

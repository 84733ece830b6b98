"""Mu-law codec correctness (BASELINE.md: exact round-trip on decodable set)."""

import numpy as np

from ae_wavenet_tpu.audio import mulaw


def test_round_trip_exact_all_ids():
    for n_quant in (16, 256):
        q = np.arange(n_quant, dtype=np.int32)
        x = mulaw.mu_decode_np(q, n_quant)
        q2 = mulaw.mu_encode_np(x, n_quant)
        np.testing.assert_array_equal(q, q2)


def test_jax_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=4096).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(mulaw.mu_encode(x)), mulaw.mu_encode_np(x)
    )
    q = rng.integers(0, 256, size=4096).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(mulaw.mu_decode(q)), mulaw.mu_decode_np(q), rtol=0, atol=1e-6
    )


def test_jax_round_trip_exact_all_ids():
    q = np.arange(256, dtype=np.int32)
    q2 = np.asarray(mulaw.mu_encode(mulaw.mu_decode(q)))
    np.testing.assert_array_equal(q, q2)


def test_encode_monotonic_and_symmetric():
    x = np.linspace(-1, 1, 100001).astype(np.float32)
    q = mulaw.mu_encode_np(x)
    assert (np.diff(q) >= 0).all()
    assert q[0] == 0 and q[-1] == 255
    # symmetry: encode(-x) == 255 - encode(x), up to +-1 at exact rounding
    # ties (rint is round-half-to-even)
    s = q + q[::-1]
    assert s.min() >= 254 and s.max() <= 256


def test_idempotent_through_quantization():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=8192).astype(np.float32)
    q1 = mulaw.mu_encode_np(x)
    q2 = mulaw.mu_encode_np(mulaw.mu_decode_np(q1))
    np.testing.assert_array_equal(q1, q2)


def test_int16_scaling():
    x = np.array([-32768, 0, 16384, 32767], dtype=np.int16)
    f = np.asarray(mulaw.int16_to_float(x))
    np.testing.assert_allclose(f, [-1.0, 0.0, 0.5, 32767 / 32768], atol=1e-7)

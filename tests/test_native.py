"""Native gather library: builds, matches numpy, bounds-checked."""

import numpy as np
import pytest

from ae_wavenet_tpu.data import native


def test_gather_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.integers(-30000, 30000, 100000).astype(np.int16)
    offs = rng.integers(0, 100000 - 512, 32).astype(np.int64)
    got = native.gather_windows(data, offs, 512)
    want = np.stack([data[o : o + 512] for o in offs])
    np.testing.assert_array_equal(got, want)
    # report which path ran (informational; both must be correct)
    assert got.dtype == np.int16


def test_gather_bounds_checked():
    data = np.zeros(1000, np.int16)
    with pytest.raises(IndexError):
        native.gather_windows(data, np.array([900], np.int64), 200)
    with pytest.raises(IndexError):
        native.gather_windows(data, np.array([-1], np.int64), 10)


def test_native_mu_encode_matches_reference():
    if not native.available():
        pytest.skip("no C toolchain")
    # exhaustive: every representable int16 input must map to the identical
    # mu-law id as the numpy encoder (the C path uses rint round-to-even to
    # match np.rint on exact ties)
    x = np.arange(-32768, 32768, dtype=np.int32).astype(np.int16)
    got = native.mu_encode_host(x)
    from ae_wavenet_tpu.audio.mulaw import mu_encode_np

    want = mu_encode_np(x.astype(np.float64) / 32768.0)
    np.testing.assert_array_equal(got.astype(int), want.astype(int))
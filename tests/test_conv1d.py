"""ops/conv1d: the phase-decomposed transposed conv vs the zero-stuffing
lax oracle (both must realize vconv.TConv's complete-range lattice
exactly; reference counterpart: torch ConvTranspose1d in ``wavenet.py``
upsampling [SURVEY.md §2.1])."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import lax

from ae_wavenet_tpu.ops.conv1d import _tconv1d_phased, tconv1d


def _oracle(x, w, b, stride):
    f = w.shape[-1]
    from ae_wavenet_tpu.ops.conv1d import _DN

    y = lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(f - 1, f - 1)],
        lhs_dilation=(stride,), dimension_numbers=_DN,
    )
    y = y[..., (f - 1) : y.shape[-1] - (f - 1)]
    if b is not None:
        y = y + b[None, :, None].astype(y.dtype)
    return y


@pytest.mark.parametrize("stride,f,t", [
    (5, 10, 7),    # flagship stage 1 (f = 2s)
    (4, 8, 33),    # flagship stages 2-4
    (2, 4, 9),     # inverter final stage
    (4, 12, 11),   # m = 3 taps per phase
    (3, 3, 6),     # m = 1 (f == s)
    (2, 8, 5),     # m = 4
])
def test_phased_matches_zero_stuffing(stride, f, t):
    rng = np.random.default_rng(stride * 100 + f)
    x = jnp.asarray(rng.normal(size=(2, 6, t)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(5, 6, f)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(5,)), jnp.float32)
    want = _oracle(x, w, b, stride)
    got = _tconv1d_phased(x, w, b, stride=stride)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # and the public entry point routes to the phased path for these shapes
    via_public = tconv1d(x, w, b, stride=stride)
    np.testing.assert_allclose(np.asarray(via_public), np.asarray(got),
                               rtol=0, atol=0)


def test_fallback_for_ragged_filter():
    """F not a multiple of stride keeps the zero-stuffing path (same
    lattice, same values)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 3, 12)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(4, 3, 7)), jnp.float32)
    want = _oracle(x, w, None, 3)
    got = tconv1d(x, w, stride=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

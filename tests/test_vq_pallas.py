"""Fused Pallas VQ kernel vs the XLA formulation (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.ops.vq_pallas import vq_lookup_fused


@pytest.mark.parametrize("n,k,d,tile", [(512, 128, 64, 256), (300, 128, 64, 256)])
def test_fused_matches_xla(n, k, d, tile):
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(k, d)), jnp.float32)

    codes, quant, counts, sums = vq_lookup_fused(z, e, tile_n=tile, interpret=True)

    d2 = (
        jnp.sum(z**2, 1, keepdims=True) - 2 * z @ e.T + jnp.sum(e**2, 1)[None]
    )
    want_codes = jnp.argmin(d2, 1)
    onehot = jax.nn.one_hot(want_codes, k)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(want_codes))
    np.testing.assert_allclose(np.asarray(quant), np.asarray(e)[np.asarray(want_codes)],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(counts), np.asarray(onehot.sum(0)),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(onehot.T @ z),
                               rtol=1e-4, atol=1e-4)

"""Driver-contract guards: __graft_entry__ must keep compiling and the
reconstruction API must produce sane audio end-to-end."""

import sys
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on any sharding/compile regression


@pytest.mark.slow
def test_dryrun_multichip_self_provisions():
    """The driver imports this module on a 1-TPU machine where fewer devices
    exist than requested; the dryrun must re-exec itself with a virtual CPU
    mesh rather than assert (MULTICHIP_r01 regression guard)."""
    import __graft_entry__ as g

    # More devices than this conftest-forced 8-CPU backend exposes -> must
    # take the subprocess re-exec path and still succeed.
    g.dryrun_multichip(16)


def test_reconstruct_roundtrip_tiny():
    from ae_wavenet_tpu.models import autoencoder as ae
    from ae_wavenet_tpu.utils.config import tiny_config

    cfg = tiny_config()
    params, bn_state = ae.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    t = 20000
    wav = (8000 * np.sin(np.arange(t) / 16000 * 2 * np.pi * 220)).astype(np.int16)
    ids, start = ae.reconstruct(
        params, bn_state, cfg, jnp.asarray(wav[None]), jnp.zeros((1,), jnp.int32),
        jax.random.PRNGKey(1), temperature=1.0, n_samples=500,
    )
    ids = np.asarray(ids)
    assert ids.shape == (1, 500)
    assert ids.min() >= 0 and ids.max() < 256
    assert start > 0 and start + 500 <= t

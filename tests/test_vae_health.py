"""VAE posterior-collapse regression (round-4; the VAE analogue of the
round-3 VQ collapse lesson — unit-green bottlenecks can be uselessly
collapsed in real training).

Measured on the tiny config + v2 fixture (scripts/diag_vae.py, 2026-08-18):

* aux_frame_weight=0: active units 16 -> 0 by step ~250, KL pinned to the
  free-bits floor (n_dim * free_nats = 1.6 nats exactly), mu_var ~ 0.002.
* aux_frame_weight=1: all 16 units active through step 300, KL slightly
  above the floor.

The slow test pins both arms; the fast test pins the in-step diagnostics.
"""

import dataclasses as dc
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ae_wavenet_tpu.models import bottlenecks
from ae_wavenet_tpu.utils.config import BottleneckConfig, tiny_config


def test_vae_aux_diagnostics_present():
    """active_units/mu_var respond to the posterior's actual state."""
    cfg = BottleneckConfig(kind="vae", n_dim=8, free_nats=0.1)
    params, state = bottlenecks.init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16))
    _, _, aux = bottlenecks.apply(params, state, cfg, z,
                                  jax.random.PRNGKey(2), jnp.int32(0), True)
    # random init: mu = W z is far from the prior on every dim
    assert float(aux["active_units"]) == 8.0
    assert float(aux["mu_var"]) > 0.0
    # collapsed posterior: zero weights -> mu = 0, log_sig = 0 -> KL = 0
    dead = jax.tree.map(jnp.zeros_like, params)
    _, _, aux0 = bottlenecks.apply(dead, state, cfg, z,
                                   jax.random.PRNGKey(2), jnp.int32(0), True)
    assert float(aux0["active_units"]) == 0.0
    # free-bits floor: KL reports exactly n_dim * free_nats when collapsed
    np.testing.assert_allclose(float(aux0["kl"]), 8 * 0.1, rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("aux_w,healthy", [(0.0, False), (1.0, True)])
def test_vae_collapse_and_rescue(tmp_path, aux_w, healthy):
    """300-step tiny training: without the aux head the posterior collapses
    (active units -> ~0); with it every unit stays active."""
    from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset
    from ae_wavenet_tpu.training.chassis import Chassis

    prefix = str(tmp_path / "synth")
    make_synthetic_dataset(prefix, n_clips=8, n_speakers=4,
                           clip_len=(12_000, 20_000), seed=11)
    cfg = tiny_config()
    cfg = dc.replace(
        cfg,
        bottleneck=dc.replace(cfg.bottleneck, kind="vae", free_nats=0.1,
                              kl_anneal_steps=150),
        train=dc.replace(cfg.train, n_steps=300, log_every=30, ckpt_every=0,
                         holdout_every=4, learning_rate=2e-3,
                         aux_frame_weight=aux_w),
    )
    ch = Chassis(cfg, prefix, log_stream=io.StringIO())
    hist = ch.train(300)
    active = [int(h["active_units"]) for h in hist]
    kl = [float(h["kl"]) for h in hist]
    floor = cfg.bottleneck.n_dim * cfg.bottleneck.free_nats
    assert all(k >= floor - 1e-4 for k in kl), kl
    if healthy:
        # measured 15-16/16 from step 0; margin for fixture/BLAS noise
        assert active[-1] >= 12, active
        assert min(active[-3:]) >= 12, active
    else:
        # measured 0 by step ~250; collapse must be visible in the trend
        assert active[-1] <= 4, active

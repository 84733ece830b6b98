"""Loss-curve parity vs the independent PyTorch mirror (SURVEY.md §6 north
star "matched reconstruction loss curves"; reference mount empty, so parity
is demonstrated against scripts/torch_mirror.py — same math, independent
implementation/framework).

The 200-step run lives in docs/parity_curves.json (scripts/parity_curves.py);
this test keeps a fast 25-step version in CI.
"""

import dataclasses as dc
import io

import jax
import numpy as np
import pytest

from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset
from ae_wavenet_tpu.data.dataset import PackedDataset, WindowSampler
from ae_wavenet_tpu.models import autoencoder as ae
from ae_wavenet_tpu.training.chassis import Chassis
from ae_wavenet_tpu.utils.config import tiny_config

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts import torch_mirror as tm  # noqa: E402

pytestmark = pytest.mark.slow  # heavy: opt-in via `pytest -m slow`

STEPS = 25


@pytest.fixture(scope="module")
def data_prefix(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    prefix = str(d / "synth")
    make_synthetic_dataset(prefix, n_clips=10, n_speakers=4, seed=0)
    return prefix


def test_single_loss_bit_close(data_prefix):
    cfg = tiny_config()
    spec = ae.make_window_spec(cfg)
    ds = PackedDataset(data_prefix)
    sampler = WindowSampler(ds, spec.u_len, cfg.train.batch_sz, cfg.train.seed)
    params, bn_state = ae.init(jax.random.PRNGKey(cfg.train.seed + 1), cfg)
    wav, spk = sampler.batch_at(0)
    import jax.numpy as jnp
    _, (_, metrics) = ae.loss_fn(
        params, bn_state, cfg, spec, jnp.asarray(wav), jnp.asarray(spk),
        jax.random.PRNGKey(9), jnp.int32(0),
    )
    ce_t = tm.loss(tm.params_to_torch(params), cfg, spec, wav, spk)
    assert abs(float(metrics["recon_ce"]) - float(ce_t.detach())) < 1e-4


def _vq_parity_config():
    """Deterministic VQ twin config: jitter/restarts off (they draw JAX RNG
    the torch mirror cannot reproduce); EMA + STE + commitment warmup + the
    latent->MFCC aux head all active."""
    from ae_wavenet_tpu.utils.config import BottleneckConfig

    cfg = tiny_config()
    return dc.replace(
        cfg,
        bottleneck=BottleneckConfig(kind="vq", n_dim=16, vq_k=64,
                                    jitter_p=0.0, vq_restart_thresh=0.0,
                                    vq_warmup_steps=50),
        train=dc.replace(cfg.train, n_steps=STEPS, log_every=1,
                         learning_rate=1e-3, aux_frame_weight=1.0),
    )


def test_vq_single_loss_bit_close(data_prefix):
    cfg = _vq_parity_config()
    spec = ae.make_window_spec(cfg)
    ds = PackedDataset(data_prefix)
    sampler = WindowSampler(ds, spec.u_len, cfg.train.batch_sz, cfg.train.seed)
    params, bn_state = ae.init(jax.random.PRNGKey(cfg.train.seed + 1), cfg)
    wav, spk = sampler.batch_at(0)
    import jax.numpy as jnp
    total_j, (_, metrics) = ae.loss_fn(
        params, bn_state, cfg, spec, jnp.asarray(wav), jnp.asarray(spk),
        jax.random.PRNGKey(9), jnp.int32(0),
    )
    import torch
    bn_t = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in bn_state.items()}
    total_t, ce_t, _ = tm.step_loss(tm.params_to_torch(params), cfg, spec,
                                    wav, spk, bn_t, step=0)
    assert abs(float(metrics["recon_ce"]) - float(ce_t.detach())) < 1e-4
    assert abs(float(total_j) - float(total_t.detach())) < 1e-3


def test_vq_training_curves_match(data_prefix):
    """EMA + STE + warmup + aux-head training parity: the recon-CE curves and
    the final EMA codebook must agree between JAX and the torch mirror."""
    cfg = _vq_parity_config()
    ch = Chassis(cfg, data_prefix, log_stream=io.StringIO())
    init_params = jax.tree.map(lambda x: np.array(x), ch.params)
    init_bn = jax.tree.map(lambda x: np.array(x), ch.bn_state)
    hist = ch.train(STEPS)
    jax_ce = [h["recon_ce"] for h in hist]

    ds = PackedDataset(data_prefix)
    sampler = WindowSampler(ds, ch.spec.u_len, cfg.train.batch_sz,
                            cfg.train.seed)
    torch_ce, bn_t = tm.train_curve(cfg, ch.spec, init_params, sampler,
                                    STEPS, bn_state=init_bn,
                                    return_state=True)

    diffs = [abs(a - b) for a, b in zip(jax_ce, torch_ce)]
    assert max(diffs) < 0.02, diffs
    np.testing.assert_allclose(
        np.asarray(ch.bn_state["codebook"]),
        np.asarray(bn_t["codebook"]), rtol=1e-3, atol=1e-4,
    )


def test_inverter_single_loss_bit_close(data_prefix):
    """MFCC-inverter (vocoder baseline) teacher-forcing CE matches the
    torch mirror at identical init."""
    from ae_wavenet_tpu.models import mfcc_inverter as mi

    cfg = tiny_config()
    cfg = dc.replace(
        cfg,
        model_kind="mfcc_inverter",
        wavenet=dc.replace(cfg.wavenet, lc_upsample_strides=(5, 4, 4, 2),
                           lc_upsample_filters=(10, 8, 8, 4)),
    )
    spec = mi.make_window_spec(cfg)
    ds = PackedDataset(data_prefix)
    sampler = WindowSampler(ds, spec.u_len, cfg.train.batch_sz, cfg.train.seed)
    params, bn_state = mi.init(jax.random.PRNGKey(cfg.train.seed + 1), cfg)
    wav, spk = sampler.batch_at(0)
    import jax.numpy as jnp
    _, (_, metrics) = mi.loss_fn(
        params, bn_state, cfg, spec, jnp.asarray(wav), jnp.asarray(spk),
        jax.random.PRNGKey(9), jnp.int32(0),
    )
    ce_t = tm.inverter_loss(tm.params_to_torch(params), cfg, spec, wav, spk)
    assert abs(float(metrics["recon_ce"]) - float(ce_t.detach())) < 1e-4


def test_training_curves_match(data_prefix):
    cfg = tiny_config()
    cfg = dc.replace(cfg, train=dc.replace(cfg.train, n_steps=STEPS,
                                           log_every=1, learning_rate=1e-3))
    ch = Chassis(cfg, data_prefix, log_stream=io.StringIO())
    init_params = jax.tree.map(lambda x: np.array(x), ch.params)
    hist = ch.train(STEPS)
    jax_ce = [h["recon_ce"] for h in hist]

    ds = PackedDataset(data_prefix)
    sampler = WindowSampler(ds, ch.spec.u_len, cfg.train.batch_sz,
                            cfg.train.seed)
    torch_ce = tm.train_curve(cfg, ch.spec, init_params, sampler, STEPS)

    diffs = [abs(a - b) for a, b in zip(jax_ce, torch_ce)]
    # measured: max 0.005 over the first 50 steps of the 200-step run
    # (docs/parity_curves.json); 0.02 leaves slack for BLAS reassociation
    assert max(diffs) < 0.02, diffs


def _vae_parity_config():
    """Deterministic VAE twin config: parity runs the EVAL latent path
    (zq = mu; the reparameterization eps is JAX RNG the mirror cannot
    reproduce) while keeping the FULL KL objective (free-bits floor +
    linear annealing) and the latent->MFCC aux head — covering the mu/sig
    heads, the KL math, and the gradient flow through both."""
    from ae_wavenet_tpu.utils.config import BottleneckConfig

    cfg = tiny_config()
    return dc.replace(
        cfg,
        bottleneck=BottleneckConfig(kind="vae", n_dim=16, free_nats=0.1,
                                    kl_anneal_steps=50),
        train=dc.replace(cfg.train, n_steps=STEPS, log_every=1,
                         learning_rate=1e-3, aux_frame_weight=1.0),
    )


def test_vae_single_loss_bit_close(data_prefix):
    cfg = _vae_parity_config()
    spec = ae.make_window_spec(cfg)
    ds = PackedDataset(data_prefix)
    sampler = WindowSampler(ds, spec.u_len, cfg.train.batch_sz, cfg.train.seed)
    params, bn_state = ae.init(jax.random.PRNGKey(cfg.train.seed + 1), cfg)
    wav, spk = sampler.batch_at(0)
    import jax.numpy as jnp
    total_j, (_, metrics) = ae.loss_fn(
        params, bn_state, cfg, spec, jnp.asarray(wav), jnp.asarray(spk),
        jax.random.PRNGKey(9), jnp.int32(0), train=False,
    )
    total_t, ce_t, _ = tm.step_loss(tm.params_to_torch(params), cfg, spec,
                                    wav, spk, step=0)
    assert abs(float(metrics["recon_ce"]) - float(ce_t.detach())) < 1e-4
    assert abs(float(total_j) - float(total_t.detach())) < 1e-3
    # KL must be a real term at init (not already collapsed to the floor
    # on every dim), else the parity covers nothing
    assert float(metrics["kl"]) > cfg.bottleneck.n_dim * cfg.bottleneck.free_nats


def test_vae_training_curves_match(data_prefix):
    """mu/sig heads + KL(free-bits, annealed) + aux-head training parity on
    the deterministic objective: recon-CE curves must agree step by step."""
    from scripts.parity_common import det_vae_jax_curve

    cfg = _vae_parity_config()
    spec = ae.make_window_spec(cfg)
    ds = PackedDataset(data_prefix)
    sampler = WindowSampler(ds, spec.u_len, cfg.train.batch_sz, cfg.train.seed)
    jax_ce, init_params = det_vae_jax_curve(cfg, spec, sampler, STEPS)
    torch_ce = tm.train_curve(cfg, spec, init_params, sampler, STEPS)
    diffs = [abs(a - b) for a, b in zip(jax_ce, torch_ce)]
    assert max(diffs) < 0.02, diffs

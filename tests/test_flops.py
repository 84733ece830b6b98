"""Validate the analytic FLOP model (utils/flops.py) against XLA's own HLO
cost analysis on the compiled forward/train step.

XLA's `compiled.cost_analysis()['flops']` counts the same matmul work the
analytic model does plus the elementwise ops the model deliberately ignores,
so the analytic number must land BELOW the XLA number but within a modest
band of it (the ignored work is small by design)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ae_wavenet_tpu.models import autoencoder as ae
from ae_wavenet_tpu.utils import flops as flops_mod
from ae_wavenet_tpu.utils.config import BottleneckConfig, RunConfig, tiny_config


def _xla_flops(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    if not ca or "flops" not in ca:
        pytest.skip("cost_analysis() has no flops key on this backend")
    return float(ca["flops"])


def _cfg(kind: str) -> RunConfig:
    cfg = tiny_config()
    if kind == "vq":
        cfg = dataclasses.replace(
            cfg,
            bottleneck=BottleneckConfig(kind="vq", n_dim=16, vq_k=32),
            train=dataclasses.replace(cfg.train, aux_frame_weight=1.0),
        )
    return cfg


@pytest.mark.parametrize("kind", ["ae", "vq"])
def test_forward_flops_vs_xla(kind):
    cfg = _cfg(kind)
    spec = ae.make_window_spec(cfg)
    params, bn_state = ae.init(jax.random.PRNGKey(0), cfg)
    b = cfg.train.batch_sz
    wav = np.random.default_rng(0).integers(
        -8000, 8000, size=(b, spec.u_len)).astype(np.int16)
    spk = np.zeros((b,), np.int32)
    rng = jax.random.PRNGKey(1)

    def fwd(params, bn_state, wav, spk):
        logits, targets, _, _ = ae.forward(
            params, bn_state, cfg, spec, wav, spk, rng, jnp.int32(0),
            train=True)
        return logits.sum()

    xla = _xla_flops(fwd, params, bn_state, jnp.asarray(wav), jnp.asarray(spk))
    model = flops_mod.forward_flops(cfg, spec)["total"] * b
    # analytic <= XLA (we ignore elementwise/LN/jitter work), and the ignored
    # part must be small: the GEMMs dominate
    assert model <= xla * 1.02, (model, xla)
    assert model >= 0.75 * xla, (model, xla)


def test_train_multiplier_vs_xla():
    cfg = _cfg("vq")
    spec = ae.make_window_spec(cfg)
    params, bn_state = ae.init(jax.random.PRNGKey(0), cfg)
    b = cfg.train.batch_sz
    wav = np.random.default_rng(0).integers(
        -8000, 8000, size=(b, spec.u_len)).astype(np.int16)
    spk = np.zeros((b,), np.int32)
    rng = jax.random.PRNGKey(1)

    def step(params, bn_state, wav, spk):
        def lf(p):
            loss, (new_bn, m) = ae.loss_fn(
                p, bn_state, cfg, spec, wav, spk, rng, jnp.int32(0))
            return loss
        return jax.grad(lf)(params)

    xla = _xla_flops(step, params, bn_state, jnp.asarray(wav),
                     jnp.asarray(spk))
    model = flops_mod.train_step_flops_per_item(cfg, spec) * b
    # fwd+bwd ~= 3x fwd; XLA counts extra elementwise + rematerialized work,
    # so allow a wider band but require the right order
    assert 0.6 * xla <= model <= 1.15 * xla, (model, xla)


def test_peak_lookup(monkeypatch):
    assert flops_mod.peak_bf16_flops("TPU v5e") == 197e12
    assert flops_mod.peak_bf16_flops("TPU v5 lite") == 197e12
    assert flops_mod.peak_bf16_flops("TPU v4") == 275e12
    assert flops_mod.peak_bf16_flops("TPU v5p") == 459e12
    # env fallback names the machine's TPU generation when device_kind
    # doesn't resolve (the axon tunnel reports a generic kind)
    monkeypatch.setenv("PALLAS_AXON_TPU_GEN", "v5e")
    assert flops_mod.peak_bf16_flops(None) == 197e12
    monkeypatch.delenv("PALLAS_AXON_TPU_GEN")
    assert flops_mod.peak_bf16_flops("cpu-host") is None
    assert flops_mod.peak_bf16_flops(None) is None

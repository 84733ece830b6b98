"""Shared parity-harness pieces used by both scripts/parity_curves.py and
tests/test_parity_torch.py (import-safe: no top-level execution)."""

from __future__ import annotations

import jax
import numpy as np


def det_vae_jax_curve(cfg, spec, sampler, steps: int):
    """Train the JAX autoencoder on the DETERMINISTIC VAE objective
    (train=False latent path: zq = mu — the reparameterization eps is JAX
    RNG the torch mirror cannot follow — with the full KL free-bits /
    annealing term) via a direct optax Adam loop.

    Returns (per-step recon-CE list, initial params snapshot) — the snapshot
    feeds torch_mirror.train_curve for the twin run."""
    import jax.numpy as jnp
    import optax

    from ae_wavenet_tpu.models import autoencoder as ae

    params, bn_state = ae.init(jax.random.PRNGKey(cfg.train.seed + 1), cfg)
    init_params = jax.tree.map(lambda x: np.array(x), params)

    t = cfg.train
    opt = optax.adam(t.learning_rate, b1=t.adam_b1, b2=t.adam_b2,
                     eps=t.adam_eps)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, wav, spk, step):
        def lf(p):
            total, (_, m) = ae.loss_fn(
                p, bn_state, cfg, spec, wav, spk, jax.random.PRNGKey(9),
                step, train=False)
            return total, m
        (total, m), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, m

    ces = []
    for s in range(steps):
        wav, spk = sampler.batch_at(s)
        params, opt_state, m = step_fn(params, opt_state, jnp.asarray(wav),
                                       jnp.asarray(spk), jnp.int32(s))
        ces.append(float(m["recon_ce"]))
    return ces, init_params

"""Data-parallel correctness on the fake 8-device CPU mesh (SURVEY.md §4):
the sharded train step must compute the SAME result as single-device — in
particular the VQ-EMA statistics must reduce over the global batch."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.models import autoencoder as ae
from ae_wavenet_tpu.parallel import mesh as mesh_mod
from ae_wavenet_tpu.training.chassis import make_optimizer, make_train_step
from ae_wavenet_tpu.utils.config import BottleneckConfig, tiny_config


def _cfg(vq_groups: int = 1):
    cfg = tiny_config()
    return dataclasses.replace(
        cfg,
        bottleneck=BottleneckConfig(kind="vq", n_dim=16, vq_k=16, jitter_p=0.0,
                                    vq_groups=vq_groups),
        train=dataclasses.replace(cfg.train, batch_sz=8),
    )


def _setup(cfg, spec):
    params, bn_state = ae.init(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(0)
    wav = rng.integers(-8000, 8000, (8, spec.u_len)).astype(np.int16)
    spk = rng.integers(0, cfg.wavenet.n_speakers, (8,)).astype(np.int32)
    return params, bn_state, optimizer, opt_state, wav, spk


def test_mesh_step_matches_single_device():
    _check_mesh_matches_single(_cfg())


def test_mesh_step_matches_single_device_grouped_vq():
    """vq_groups=4: the per-group EMA statistics must ALSO reduce over the
    global batch (grouped/product VQ is the shipped gain preset).

    params_rtol: the G skinny per-group contractions change the f32
    reduction order of the auto-psum'd gradients, and Adam's rsqrt(v)+eps
    at step 0 amplifies that; measured worst case is 1 element / 6912 at
    0.23% relative on the 8-device CPU mesh.  The EMA state (the thing
    this test pins) stays at the tight tolerance."""
    _check_mesh_matches_single(_cfg(vq_groups=4), params_rtol=5e-3,
                               params_atol=5e-5)


def _check_mesh_matches_single(cfg, params_rtol=2e-4, params_atol=2e-5):
    spec = ae.make_window_spec(cfg)
    params, bn_state, optimizer, opt_state, wav, spk = _setup(cfg, spec)
    key = jax.random.PRNGKey(1)

    single = make_train_step(cfg, spec, optimizer, key)
    p1, o1, b1, m1 = single(params, opt_state, bn_state,
                            jnp.asarray(wav), jnp.asarray(spk), jnp.int32(0))

    mesh = mesh_mod.make_mesh()
    assert mesh.devices.size == 8
    repl, data = mesh_mod.replicated(mesh), mesh_mod.batch_sharding(mesh)
    params2, bn2 = ae.init(jax.random.PRNGKey(0), cfg)
    opt2 = optimizer.init(params2)
    params2 = jax.device_put(params2, repl)
    bn2 = jax.device_put(bn2, repl)
    opt2 = jax.device_put(opt2, repl)
    sharded = make_train_step(cfg, spec, optimizer, key, mesh)
    p2, o2, b2, m2 = sharded(params2, opt2, bn2,
                             jax.device_put(wav, data), jax.device_put(spk, data),
                             jnp.int32(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # VQ EMA state identical: statistics were reduced over the global batch
    np.testing.assert_allclose(
        np.asarray(b1["ema_counts"]), np.asarray(b2["ema_counts"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b1["codebook"]), np.asarray(b2["codebook"]), rtol=1e-4, atol=1e-5
    )
    # updated params match across the whole tree
    flat1, flat2 = jax.tree.leaves(p1), jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=params_rtol, atol=params_atol)


def test_mesh_two_steps_stay_in_sync():
    """Replicated params remain identical across devices after several steps
    (no drift from the sharded input path)."""
    cfg = _cfg()
    spec = ae.make_window_spec(cfg)
    params, bn_state, optimizer, opt_state, wav, spk = _setup(cfg, spec)
    mesh = mesh_mod.make_mesh()
    repl, data = mesh_mod.replicated(mesh), mesh_mod.batch_sharding(mesh)
    params = jax.device_put(params, repl)
    bn_state = jax.device_put(bn_state, repl)
    opt_state = jax.device_put(opt_state, repl)
    step = make_train_step(cfg, spec, optimizer, jax.random.PRNGKey(1), mesh)
    for s in range(2):
        params, opt_state, bn_state, m = step(
            params, opt_state, bn_state,
            jax.device_put(wav, data), jax.device_put(spk, data), jnp.int32(s)
        )
    # fetch per-device copies of one replicated leaf and compare
    leaf = jax.tree.leaves(params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for sh in shards[1:]:
        np.testing.assert_array_equal(shards[0], sh)
    assert np.isfinite(float(m["loss"]))


def test_shard_map_step_matches_single_device():
    """dp_impl="shard_map" (the explicit per-shard program required by the
    fused Pallas stack) computes the same step as single-device: grads are
    pmean'd and the VQ-EMA statistics psum to the global batch."""
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, dp_impl="shard_map"))
    spec = ae.make_window_spec(cfg)
    params, bn_state, optimizer, opt_state, wav, spk = _setup(cfg, spec)
    key = jax.random.PRNGKey(1)

    single = make_train_step(cfg, spec, optimizer, key)
    p1, o1, b1, m1 = single(params, opt_state, bn_state,
                            jnp.asarray(wav), jnp.asarray(spk), jnp.int32(0))

    mesh = mesh_mod.make_mesh()
    repl, data = mesh_mod.replicated(mesh), mesh_mod.batch_sharding(mesh)
    params2, bn2 = ae.init(jax.random.PRNGKey(0), cfg)
    opt2 = optimizer.init(params2)
    params2 = jax.device_put(params2, repl)
    bn2 = jax.device_put(bn2, repl)
    opt2 = jax.device_put(opt2, repl)
    sharded = make_train_step(cfg, spec, optimizer, key, mesh)
    p2, o2, b2, m2 = sharded(params2, opt2, bn2,
                             jax.device_put(wav, data),
                             jax.device_put(spk, data), jnp.int32(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(b1["ema_counts"]), np.asarray(b2["ema_counts"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b1["codebook"]), np.asarray(b2["codebook"]),
        rtol=1e-4, atol=1e-5
    )
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_shard_map_restarts_stay_identical():
    """Dead-code restarts under shard_map must re-seed every replica with
    the SAME candidate vectors (broadcast from replica 0)."""
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg,
        bottleneck=dataclasses.replace(cfg.bottleneck,
                                       vq_restart_thresh=10.0),  # force
        train=dataclasses.replace(cfg.train, dp_impl="shard_map"),
    )
    spec = ae.make_window_spec(cfg)
    params, bn_state, optimizer, opt_state, wav, spk = _setup(cfg, spec)
    mesh = mesh_mod.make_mesh()
    repl, data = mesh_mod.replicated(mesh), mesh_mod.batch_sharding(mesh)
    params = jax.device_put(params, repl)
    bn_state = jax.device_put(bn_state, repl)
    opt_state = jax.device_put(opt_state, repl)
    step = make_train_step(cfg, spec, optimizer, jax.random.PRNGKey(1), mesh)
    _, _, b2, _ = step(params, opt_state, bn_state,
                       jax.device_put(wav, data), jax.device_put(spk, data),
                       jnp.int32(0))
    leaf = b2["codebook"]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for sh in shards[1:]:
        np.testing.assert_array_equal(shards[0], sh)


def test_mesh_k_step_block_matches_two_singles():
    """steps_per_call=2 under the 8-device mesh (shard_map, block sharding
    P(None, 'data')) == two consecutive single-step mesh dispatches."""
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, dp_impl="shard_map"))
    spec = ae.make_window_spec(cfg)
    params, bn_state, optimizer, opt_state, wav, spk = _setup(cfg, spec)
    rng = np.random.default_rng(3)
    wav2 = rng.integers(-8000, 8000, (8, spec.u_len)).astype(np.int16)
    spk2 = rng.integers(0, cfg.wavenet.n_speakers, (8,)).astype(np.int32)
    key = jax.random.PRNGKey(1)
    mesh = mesh_mod.make_mesh()
    repl = mesh_mod.replicated(mesh)
    data = mesh_mod.batch_sharding(mesh)
    blk = mesh_mod.block_sharding(mesh)
    # host copies: both step programs donate their inputs, and device_put
    # of an already-on-device tree can alias (donating would delete the
    # shared fixture arrays)
    params = jax.tree.map(np.asarray, params)
    opt_state = jax.tree.map(np.asarray, opt_state)
    bn_state = jax.tree.map(np.asarray, bn_state)

    def rep(tree):
        return jax.device_put(tree, repl)

    single = make_train_step(cfg, spec, optimizer, key, mesh)
    p, o, b, _ = single(rep(params), rep(opt_state), rep(bn_state),
                        jax.device_put(wav, data), jax.device_put(spk, data),
                        jnp.int32(0))
    p, o, b, m1 = single(p, o, b, jax.device_put(wav2, data),
                         jax.device_put(spk2, data), jnp.int32(1))

    block = make_train_step(cfg, spec, optimizer, key, mesh,
                            n_steps_per_call=2)
    wavs = jax.device_put(np.stack([wav, wav2]), blk)
    spks = jax.device_put(np.stack([spk, spk2]), blk)
    p2, o2, b2, m2 = block(rep(params), rep(opt_state), rep(bn_state),
                           wavs, spks, jnp.int32(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5, atol=1e-6)
    for x, y in zip(jax.tree.leaves(p), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=1e-5, atol=1e-6)

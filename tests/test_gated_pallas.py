"""Fused gated-residual-conv training-forward kernel vs the XLA stack
(ops/gated_pallas.py; SURVEY.md §2.0 row 1, §7 step 10), interpret mode.

The compiled-Mosaic equivalent runs in tests_tpu/test_pallas_tpu.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.models import wavenet
from ae_wavenet_tpu.ops import gated_pallas as gp
from ae_wavenet_tpu.utils.config import WaveNetConfig

CFG = WaveNetConfig(n_blocks=2, n_block_layers=4, n_res=128, n_dil=128,
                    n_skp=128, n_post=128, n_quant=256, n_lc_in=16,
                    n_lc_out=64, n_speakers=8, n_global_embed=16)
RF = wavenet.receptive_field(CFG)


def _inputs(t_out, batch=2, seed=0):
    t_in = t_out + RF
    params = wavenet.init(jax.random.PRNGKey(seed), CFG)
    x_ids = jax.random.randint(jax.random.PRNGKey(seed + 1), (batch, t_in),
                               0, CFG.n_quant)
    cond = jax.random.normal(jax.random.PRNGKey(seed + 2),
                             (batch, CFG.n_lc_out, t_in)) * 0.5
    spk = jax.random.randint(jax.random.PRNGKey(seed + 3), (batch,), 0,
                             CFG.n_speakers)
    return params, x_ids, cond, spk


@pytest.mark.parametrize("t_out,tile,fuse_pairs", [
    (170, 64, False),  # ragged head tile (tile divides no layer length)
    (128, 64, False),  # t_out a multiple of tile (lengths still vary)
    (70, 128, False),  # single tile per layer (tile > every layer length)
    (170, 64, True),   # two-layer pair fusion (persistent VMEM tail)
    (70, 128, True),   # pairs at a single tile per layer
])
def test_stack_matches_xla(t_out, tile, fuse_pairs):
    params, x_ids, cond, spk = _inputs(t_out)
    ref = wavenet.apply(params, CFG, x_ids, cond, spk, dtype=jnp.bfloat16)
    got = gp.stack_apply(params, CFG, x_ids, cond, spk, tile=tile,
                         interpret=True, fuse_pairs=fuse_pairs)
    assert got.shape == ref.shape
    d = np.abs(np.asarray(ref, np.float32) - np.asarray(got, np.float32))
    assert d.max() < 0.02, d.max()   # bf16 reduction-order tolerance


def test_no_gc_path():
    params, x_ids, cond, _ = _inputs(96)
    ref = wavenet.apply(params, CFG, x_ids, cond, None, dtype=jnp.bfloat16)
    got = gp.stack_apply(params, CFG, x_ids, cond, None, tile=64,
                         interpret=True)
    d = np.abs(np.asarray(ref, np.float32) - np.asarray(got, np.float32))
    assert d.max() < 0.02, d.max()


def test_supports_guard():
    assert gp.supports_pallas_stack(WaveNetConfig(), 24000 + 2046)
    assert not gp.supports_pallas_stack(WaveNetConfig(n_res=100), 26046)
    assert not gp.supports_pallas_stack(WaveNetConfig(), 500)


def test_stack_grads_match_xla():
    """custom_vjp fused backward vs jax.grad of the XLA stack: the fused
    path must sit within the same distance of the f32 reference as XLA's
    own bf16 backward."""
    params, x_ids, cond, spk = _inputs(170)
    t_out = 170
    probe = jax.random.normal(jax.random.PRNGKey(9),
                              (x_ids.shape[0], CFG.n_quant, t_out))

    def loss_f32(p, c):
        out = wavenet.apply(p, CFG, x_ids, c, spk, dtype=jnp.float32)
        return jnp.mean(out.astype(jnp.float32) * probe)

    def loss_xla(p, c):
        out = wavenet.apply(p, CFG, x_ids, c, spk, dtype=jnp.bfloat16)
        return jnp.mean(out.astype(jnp.float32) * probe)

    def loss_pal(p, c):
        out = gp.stack_apply(p, CFG, x_ids, c, spk, tile=64, interpret=True)
        return jnp.mean(out.astype(jnp.float32) * probe)

    g32 = jax.grad(loss_f32, argnums=(0, 1))(params, cond)
    gx = jax.grad(loss_xla, argnums=(0, 1))(params, cond)
    gpl = jax.grad(loss_pal, argnums=(0, 1))(params, cond)

    def flat(t):
        return np.concatenate(
            [np.asarray(x, np.float32).ravel() for x in jax.tree.leaves(t)])

    f32, fx, fp = flat(g32), flat(gx), flat(gpl)
    assert np.isfinite(fp).all()
    rms_xla = float(np.sqrt(((fx - f32) ** 2).mean()))
    rms_pal = float(np.sqrt(((fp - f32) ** 2).mean()))
    # measured: pallas 4.3e-7 vs xla-bf16 5.3e-7 (f32 in-kernel dW accum)
    assert rms_pal < 3.0 * rms_xla + 1e-8, (rms_pal, rms_xla)


def test_pair_fused_grads_match_xla():
    """Pair-fused forward + pair-fused backward (gated_pair_fused /
    gated_pair_bwd: inter-layer streams in VMEM, descending-tile persistent
    head) vs jax.grad of the XLA stack."""
    params, x_ids, cond, spk = _inputs(170)
    t_out = 170
    probe = jax.random.normal(jax.random.PRNGKey(9),
                              (x_ids.shape[0], CFG.n_quant, t_out))

    def loss_xla(p, c):
        out = wavenet.apply(p, CFG, x_ids, c, spk, dtype=jnp.bfloat16)
        return jnp.mean(out.astype(jnp.float32) * probe)

    def loss_pal(p, c):
        out = gp.stack_apply(p, CFG, x_ids, c, spk, tile=64,
                             interpret=True, fuse_pairs=True)
        return jnp.mean(out.astype(jnp.float32) * probe)

    gx = jax.grad(loss_xla, argnums=(0, 1))(params, cond)
    gpl = jax.grad(loss_pal, argnums=(0, 1))(params, cond)

    def flat(t):
        return np.concatenate(
            [np.asarray(x, np.float32).ravel() for x in jax.tree.leaves(t)])

    fx, fp = flat(gx), flat(gpl)
    assert np.isfinite(fp).all()
    scale = np.abs(fx).max() + 1e-9
    assert np.abs(fp - fx).max() / scale < 0.05, np.abs(fp - fx).max() / scale


@pytest.mark.slow
def test_pair_fused_odd_layers_and_recompute_bwd():
    """Pair fusion with an ODD layer count (trailing single layer) and with
    save_y off (paired forward + per-layer recompute backward): both fall
    back correctly around the pair segmentation."""
    cfg = WaveNetConfig(n_blocks=1, n_block_layers=5, n_res=128, n_dil=128,
                        n_skp=128, n_post=128, n_quant=256, n_lc_in=16,
                        n_lc_out=64, n_speakers=8, n_global_embed=16)
    rf = wavenet.receptive_field(cfg)
    t_out = 96
    t_in = t_out + rf
    params = wavenet.init(jax.random.PRNGKey(3), cfg)
    x_ids = jax.random.randint(jax.random.PRNGKey(4), (2, t_in), 0, 256)
    cond = jax.random.normal(jax.random.PRNGKey(5),
                             (2, cfg.n_lc_out, t_in)) * 0.5
    spk = jax.random.randint(jax.random.PRNGKey(6), (2,), 0, 8)
    probe = jax.random.normal(jax.random.PRNGKey(9), (2, 256, t_out))

    ref = wavenet.apply(params, cfg, x_ids, cond, spk, dtype=jnp.bfloat16)

    def loss_xla(p, c):
        out = wavenet.apply(p, cfg, x_ids, c, spk, dtype=jnp.bfloat16)
        return jnp.mean(out.astype(jnp.float32) * probe)

    gx = jax.grad(loss_xla, argnums=(0, 1))(params, cond)

    def flat(t):
        return np.concatenate(
            [np.asarray(x, np.float32).ravel() for x in jax.tree.leaves(t)])

    fx = flat(gx)
    scale = np.abs(fx).max() + 1e-9
    for save_y in (True, False):
        got = gp.stack_apply(params, cfg, x_ids, cond, spk, tile=64,
                             interpret=True, fuse_pairs=True, save_y=save_y)
        d = np.abs(np.asarray(ref, np.float32) - np.asarray(got, np.float32))
        assert d.max() < 0.02, (save_y, d.max())

        def loss_pal(p, c, _s=save_y):
            out = gp.stack_apply(p, cfg, x_ids, c, spk, tile=64,
                                 interpret=True, fuse_pairs=True, save_y=_s)
            return jnp.mean(out.astype(jnp.float32) * probe)

        gpl = jax.grad(loss_pal, argnums=(0, 1))(params, cond)
        fp = flat(gpl)
        assert np.isfinite(fp).all()
        err = np.abs(fp - fx).max() / scale
        assert err < 0.05, (save_y, err)


@pytest.mark.slow
def test_stack_grads_nonzero_bias():
    """Regression: the backward must add b_in when rebuilding the gate
    pre-activations.  Freshly-initialized biases are zero, so the plain
    grad test cannot see a dropped bias — this one perturbs every bias
    (the state after any real optimizer step) and checks both backward
    variants (saved-y and recompute) against the XLA stack."""
    params, x_ids, cond, spk = _inputs(170)
    for i, p in enumerate(params["layers"]):
        for j, k in enumerate(("w_prev", "w_cur", "w_cond", "w_res", "w_skip")):
            b = p[k]["b"]
            key = jax.random.PRNGKey(1000 + 10 * i + j)
            p[k]["b"] = b + 0.3 * jax.random.normal(key, b.shape)
    t_out = 170
    probe = jax.random.normal(jax.random.PRNGKey(9),
                              (x_ids.shape[0], CFG.n_quant, t_out))

    def loss_xla(p, c):
        out = wavenet.apply(p, CFG, x_ids, c, spk, dtype=jnp.bfloat16)
        return jnp.mean(out.astype(jnp.float32) * probe)

    gx = jax.grad(loss_xla, argnums=(0, 1))(params, cond)

    def flat(t):
        return np.concatenate(
            [np.asarray(x, np.float32).ravel() for x in jax.tree.leaves(t)])

    fx = flat(gx)
    scale = np.abs(fx).max() + 1e-9
    for save_y in (True, False):
        def loss_pal(p, c, _s=save_y):
            out = gp.stack_apply(p, CFG, x_ids, c, spk, tile=64,
                                 interpret=True, save_y=_s)
            return jnp.mean(out.astype(jnp.float32) * probe)

        gpl = jax.grad(loss_pal, argnums=(0, 1))(params, cond)
        fp = flat(gpl)
        assert np.isfinite(fp).all()
        err = np.abs(fp - fx).max() / scale
        assert err < 0.05, (save_y, err)


def test_mesh_routes_through_shard_map():
    """pallas_call does not auto-partition under pjit annotations, so a mesh
    + use_pallas_stack must build the explicit shard_map step (which on this
    CPU backend runs the XLA stack per shard — the semantics under test are
    the shard_map program itself; see tests/test_dp.py for equivalence)."""
    import dataclasses as dc
    from ae_wavenet_tpu.parallel import mesh as mesh_mod
    from ae_wavenet_tpu.training.chassis import make_optimizer, make_train_step
    from ae_wavenet_tpu.models import autoencoder as ae
    from ae_wavenet_tpu.utils.config import tiny_config

    cfg = tiny_config()
    cfg = dc.replace(
        cfg,
        wavenet=dc.replace(cfg.wavenet, use_pallas_stack=True),
        train=dc.replace(cfg.train, batch_sz=4),
    )
    mesh = mesh_mod.make_mesh(jax.devices()[:2])
    spec = ae.make_window_spec(cfg)
    opt = make_optimizer(cfg)
    step = make_train_step(cfg, spec, opt, jax.random.PRNGKey(0), mesh)
    params, bn_state = ae.init(jax.random.PRNGKey(1), cfg)
    opt_state = opt.init(params)
    repl = mesh_mod.replicated(mesh)
    data = mesh_mod.batch_sharding(mesh)
    params = jax.device_put(params, repl)
    bn_state = jax.device_put(bn_state, repl)
    opt_state = jax.device_put(opt_state, repl)
    rng = np.random.default_rng(0)
    wav = jax.device_put(
        rng.integers(-8000, 8000, (4, spec.u_len)).astype(np.int16), data)
    spk = jax.device_put(rng.integers(0, 10, (4,)).astype(np.int32), data)
    _, _, _, metrics = step(params, opt_state, bn_state, wav, spk,
                            jnp.int32(0))
    assert np.isfinite(float(metrics["loss"]))


def test_kernel_knobs_are_config_not_env():
    """Round-2 verdict #3 contract: numerics-affecting kernel knobs are
    RunConfig fields (serialized into checkpoints), with ZERO environment
    reads left anywhere in ops/ — a checkpoint's embedded config fully
    determines the computation."""
    import glob
    import os

    import ae_wavenet_tpu.ops as ops_pkg

    for f in glob.glob(os.path.join(os.path.dirname(ops_pkg.__file__), "*.py")):
        src = open(f).read()
        assert "os.environ" not in src and "getenv" not in src, f

    # the knobs round-trip through the checkpointed JSON config
    from ae_wavenet_tpu.utils.config import RunConfig, from_json, to_json
    import dataclasses

    cfg = RunConfig()
    wn = dataclasses.replace(cfg.wavenet, gated_tile=512, gated_bwd_tile=256,
                             gated_save_y=False, gated_fuse_pairs=False,
                             fastgen_vmem_dil_max=8)
    cfg = dataclasses.replace(cfg, wavenet=wn)
    assert from_json(to_json(cfg)) == cfg


def test_stack_apply_reads_knobs_from_config():
    """cfg.gated_save_y / gated_fuse_pairs / gated_tile drive the stack when
    the kwargs are left unset — identical output to passing them explicitly."""
    import dataclasses

    params, x_ids, cond, spk = _inputs(170)
    explicit = gp.stack_apply(params, CFG, x_ids, cond, spk, tile=64,
                              interpret=True, save_y=False, fuse_pairs=True)
    cfg2 = dataclasses.replace(CFG, gated_tile=64, gated_save_y=False,
                               gated_fuse_pairs=True)
    implicit = gp.stack_apply(params, cfg2, x_ids, cond, spk, interpret=True)
    np.testing.assert_array_equal(np.asarray(explicit), np.asarray(implicit))


@pytest.mark.parametrize("t_out,tile", [(170, 64), (70, 128)])
def test_full_fusion_matches_xla(t_out, tile):
    """Whole-stack single-kernel forward (gated_stack_fused): logits match
    the XLA stack, and the saved mids/y feed the UNCHANGED pair backward
    (grads match XLA)."""
    params, x_ids, cond, spk = _inputs(t_out)
    ref = wavenet.apply(params, CFG, x_ids, cond, spk, dtype=jnp.bfloat16)
    got = gp.stack_apply(params, CFG, x_ids, cond, spk, tile=tile,
                         interpret=True, full_fusion=True)
    d = np.abs(np.asarray(ref, np.float32) - np.asarray(got, np.float32))
    assert d.max() < 0.05, d.max()

    # identical to the pair-fused path bit-for-bit is NOT required (dot
    # grouping differs), but it must agree to the same bf16 tolerance
    pair = gp.stack_apply(params, CFG, x_ids, cond, spk, tile=tile,
                          interpret=True, fuse_pairs=True)
    dp = np.abs(np.asarray(pair, np.float32) - np.asarray(got, np.float32))
    assert dp.max() < 0.05, dp.max()


def test_full_fusion_grads_match_xla():
    params, x_ids, cond, spk = _inputs(170)
    probe = jax.random.normal(jax.random.PRNGKey(9),
                              (x_ids.shape[0], CFG.n_quant, 170)) * 0.1

    def loss_xla(p, c):
        out = wavenet.apply(p, CFG, x_ids, c, spk, dtype=jnp.bfloat16)
        return jnp.mean(out.astype(jnp.float32) * probe)

    def loss_full(p, c):
        out = gp.stack_apply(p, CFG, x_ids, c, spk, tile=64, interpret=True,
                             full_fusion=True)
        return jnp.mean(out.astype(jnp.float32) * probe)

    gx = jax.grad(loss_xla, argnums=(0, 1))(params, cond)
    gf = jax.grad(loss_full, argnums=(0, 1))(params, cond)

    def flat(t):
        return np.concatenate(
            [np.asarray(v, np.float32).ravel() for v in jax.tree.leaves(t)])

    fx, ff = flat(gx), flat(gf)
    assert np.isfinite(ff).all()
    scale = np.abs(fx).max() + 1e-9
    assert np.abs(ff - fx).max() / scale < 0.05, np.abs(ff - fx).max() / scale


def test_full_fusion_no_save_y_recompute_bwd():
    """full_fusion forward + save_y=False: the backward takes the
    single-layer recompute path off the saved mids."""
    params, x_ids, cond, spk = _inputs(70)
    ref = gp.stack_apply(params, CFG, x_ids, cond, spk, tile=128,
                         interpret=True, save_y=False, fuse_pairs=False)
    got = gp.stack_apply(params, CFG, x_ids, cond, spk, tile=128,
                         interpret=True, save_y=False, full_fusion=True)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(got, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("group", [3, 4, 8])
def test_grouped_bwd_grads_match_xla(group):
    """Grouped backward (gated_group_bwd, G consecutive layers per kernel,
    cotangent streams VMEM-resident across the group) vs XLA grads."""
    params, x_ids, cond, spk = _inputs(170)
    probe = jax.random.normal(jax.random.PRNGKey(9),
                              (x_ids.shape[0], CFG.n_quant, 170)) * 0.1

    def loss_xla(p, c):
        out = wavenet.apply(p, CFG, x_ids, c, spk, dtype=jnp.bfloat16)
        return jnp.mean(out.astype(jnp.float32) * probe)

    def loss_grp(p, c):
        out = gp.stack_apply(p, CFG, x_ids, c, spk, tile=64, interpret=True,
                             full_fusion=True, bwd_group=group)
        return jnp.mean(out.astype(jnp.float32) * probe)

    gx = jax.grad(loss_xla, argnums=(0, 1))(params, cond)
    gg = jax.grad(loss_grp, argnums=(0, 1))(params, cond)

    def flat(t):
        return np.concatenate(
            [np.asarray(v, np.float32).ravel() for v in jax.tree.leaves(t)])

    fx, fg = flat(gx), flat(gg)
    assert np.isfinite(fg).all()
    scale = np.abs(fx).max() + 1e-9
    assert np.abs(fg - fx).max() / scale < 0.05, np.abs(fg - fx).max() / scale


def test_full_fusion_single_tile_and_bwd_group_combo():
    """Edge shapes: one tile per layer (nt==1) and full fusion composed
    with the grouped backward."""
    params, x_ids, cond, spk = _inputs(40)
    ref = wavenet.apply(params, CFG, x_ids, cond, spk, dtype=jnp.bfloat16)
    got = gp.stack_apply(params, CFG, x_ids, cond, spk, tile=128,
                         interpret=True, full_fusion=True, bwd_group=4)
    d = np.abs(np.asarray(ref, np.float32) - np.asarray(got, np.float32))
    assert d.max() < 0.05, d.max()

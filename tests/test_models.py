"""Unit tests: WaveNet causality/alignment, VQ-EMA math vs numpy oracle,
VAE KL behavior, encoder/geometry consistency (SURVEY.md §4)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.models import bottlenecks, encoder, wavenet
from ae_wavenet_tpu.utils.config import (
    BottleneckConfig, EncoderConfig, WaveNetConfig,
)


WN_CFG = WaveNetConfig(
    n_blocks=1, n_block_layers=4, n_res=16, n_dil=16, n_skp=16, n_post=16,
    n_lc_in=8, n_lc_out=12, n_speakers=5, n_global_embed=4,
)


def test_wavenet_receptive_field_and_shapes():
    rf = wavenet.receptive_field(WN_CFG)
    assert rf == sum(WN_CFG.dilations)  # k=2
    params = wavenet.init(jax.random.PRNGKey(0), WN_CFG)
    t_in = rf + 20
    ids = jnp.zeros((2, t_in), jnp.int32)
    cond = jnp.zeros((2, WN_CFG.n_lc_out, t_in), jnp.float32)
    logits = wavenet.apply(params, WN_CFG, ids, cond, jnp.zeros((2,), jnp.int32))
    assert logits.shape == (2, WN_CFG.n_quant, 20)


def test_wavenet_causality():
    """Output j may depend on inputs [j, j+rf] only — never on later inputs."""
    rf = wavenet.receptive_field(WN_CFG)
    params = wavenet.init(jax.random.PRNGKey(1), WN_CFG)
    t_out = 12
    t_in = rf + t_out
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 256, (1, t_in)), jnp.int32)
    cond = jnp.asarray(rng.normal(size=(1, WN_CFG.n_lc_out, t_in)), jnp.float32)
    spk = jnp.zeros((1,), jnp.int32)
    base = np.asarray(wavenet.apply(params, WN_CFG, ids, cond, spk))

    for p in [rf + 3, t_in - 1]:  # perturb input at position p
        ids2 = ids.at[0, p].set((ids[0, p] + 128) % 256)
        out = np.asarray(wavenet.apply(params, WN_CFG, ids2, cond, spk))
        diff = np.abs(out - base).max(axis=(0, 1))  # per output position
        # outputs j with j + rf < p must be identical
        unaffected = diff[: max(p - rf, 0)]
        affected = diff[max(p - rf, 0) :]
        assert unaffected.max(initial=0.0) == 0.0, p
        assert affected.max() > 0.0, p


def test_wavenet_cond_locality():
    """Conditioning at position p only affects outputs with j + rf >= p."""
    rf = wavenet.receptive_field(WN_CFG)
    params = wavenet.init(jax.random.PRNGKey(2), WN_CFG)
    t_out, t_in = 10, rf + 10
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 256, (1, t_in)), jnp.int32)
    cond = jnp.asarray(rng.normal(size=(1, WN_CFG.n_lc_out, t_in)), jnp.float32)
    spk = jnp.zeros((1,), jnp.int32)
    base = np.asarray(wavenet.apply(params, WN_CFG, ids, cond, spk))
    p = rf + 5
    cond2 = cond.at[:, :, p].add(1.0)
    out = np.asarray(wavenet.apply(params, WN_CFG, ids, cond2, spk))
    diff = np.abs(out - base).max(axis=(0, 1))
    assert diff[: p - rf].max(initial=0.0) == 0.0
    assert diff[p - rf :].max() > 0.0


def test_speaker_embedding_matters():
    params = wavenet.init(jax.random.PRNGKey(3), WN_CFG)
    rf = wavenet.receptive_field(WN_CFG)
    ids = jnp.zeros((1, rf + 4), jnp.int32)
    cond = jnp.zeros((1, WN_CFG.n_lc_out, rf + 4), jnp.float32)
    a = np.asarray(wavenet.apply(params, WN_CFG, ids, cond, jnp.array([0])))
    b = np.asarray(wavenet.apply(params, WN_CFG, ids, cond, jnp.array([1])))
    assert np.abs(a - b).max() > 0.0


# ----------------------------------------------------------------- VQ oracle

def test_vq_ema_matches_numpy_oracle():
    cfg = BottleneckConfig(kind="vq", n_dim=4, vq_k=8, jitter_p=0.0)
    _, state = bottlenecks.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    z = rng.normal(size=(2, 4, 6)).astype(np.float32)

    zq, new_state, aux = bottlenecks.apply(
        {}, state, cfg, jnp.asarray(z), jax.random.PRNGKey(1), jnp.int32(0), True
    )

    # numpy oracle
    e = np.asarray(state["codebook"])
    zf = z.transpose(0, 2, 1).reshape(-1, 4)
    d2 = ((zf[:, None, :] - e[None, :, :]) ** 2).sum(-1)
    idx = d2.argmin(1)
    onehot = np.eye(8)[idx]
    counts = onehot.sum(0)
    sums = onehot.T @ zf
    dec = cfg.ema_decay
    nc = dec * np.asarray(state["ema_counts"]) + (1 - dec) * counts
    ns = dec * np.asarray(state["ema_sums"]) + (1 - dec) * sums
    n = nc.sum()
    smoothed = (nc + cfg.ema_eps) / (n + 8 * cfg.ema_eps) * n
    want_codebook = ns / smoothed[:, None]

    np.testing.assert_allclose(np.asarray(new_state["ema_counts"]), nc, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["codebook"]), want_codebook, rtol=1e-4)
    # quantized values are codebook rows (pre-jitter)
    q = np.asarray(zq).transpose(0, 2, 1).reshape(-1, 4)
    np.testing.assert_allclose(q, e[idx], rtol=1e-5, atol=1e-6)
    # commitment matches
    want_commit = ((zf - e[idx]) ** 2).sum(-1).mean()
    np.testing.assert_allclose(float(aux["commitment"]), want_commit, rtol=1e-5)


def test_vq_straight_through_gradient():
    cfg = BottleneckConfig(kind="vq", n_dim=4, vq_k=8, jitter_p=0.0)
    _, state = bottlenecks.init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 3))

    def f(z):
        zq, _, _ = bottlenecks.apply(
            {}, state, cfg, z, jax.random.PRNGKey(1), jnp.int32(0), True
        )
        return jnp.sum(zq * jnp.arange(1.0, 4.0)[None, None, :])

    g = jax.grad(f)(z)
    # STE: d zq / d z == identity, so grad == broadcast weights
    want = jnp.broadcast_to(jnp.arange(1.0, 4.0)[None, None, :], z.shape)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), rtol=1e-6)


def test_vq_jitter_moves_codes():
    cfg = BottleneckConfig(kind="vq", n_dim=2, vq_k=4, jitter_p=1.0)
    _, state = bottlenecks.init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 50))
    zq_j, _, _ = bottlenecks.apply(
        {}, state, cfg, z, jax.random.PRNGKey(4), jnp.int32(0), True
    )
    cfg0 = dataclasses.replace(cfg, jitter_p=0.0)
    zq_0, _, _ = bottlenecks.apply(
        {}, state, cfg0, z, jax.random.PRNGKey(4), jnp.int32(0), True
    )
    assert np.abs(np.asarray(zq_j) - np.asarray(zq_0)).max() > 0.0
    # eval mode: no jitter, no state change
    zq_e, st_e, _ = bottlenecks.apply(
        {}, state, cfg, z, jax.random.PRNGKey(4), jnp.int32(0), False
    )
    np.testing.assert_array_equal(np.asarray(st_e["codebook"]), np.asarray(state["codebook"]))


def test_vq_commitment_warmup():
    """bn_loss ramps 0 -> vq_beta * commitment over vq_warmup_steps; the
    raw commitment diagnostic stays unweighted."""
    cfg = BottleneckConfig(kind="vq", n_dim=4, vq_k=8, jitter_p=0.0,
                           vq_warmup_steps=100)
    _, state = bottlenecks.init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 6))

    def bn_loss_at(step):
        _, _, aux = bottlenecks.apply(
            {}, state, cfg, z, jax.random.PRNGKey(2), jnp.int32(step), True
        )
        return float(aux["bn_loss"]), float(aux["commitment"])

    l0, c0 = bn_loss_at(0)
    l50, c50 = bn_loss_at(50)
    l100, c100 = bn_loss_at(100)
    assert c0 == c50 == c100 > 0.0
    assert l0 == 0.0
    assert l50 == pytest.approx(0.5 * cfg.vq_beta * c0, rel=1e-5)
    assert l100 == pytest.approx(cfg.vq_beta * c0, rel=1e-5)
    cfg_now = dataclasses.replace(cfg, vq_warmup_steps=0)
    _, _, aux = bottlenecks.apply(
        {}, state, cfg_now, z, jax.random.PRNGKey(2), jnp.int32(0), True
    )
    assert float(aux["bn_loss"]) == pytest.approx(cfg.vq_beta * c0, rel=1e-5)


def test_zero_bottleneck_disables_conditioning():
    """kind='zero' is the pure-AR ablation: zq == 0 regardless of z, no
    params/state, zero bottleneck loss."""
    cfg = BottleneckConfig(kind="zero", n_dim=4)
    params, state = bottlenecks.init(jax.random.PRNGKey(0), cfg)
    assert params == {} and state == {}
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 6))
    zq, st, aux = bottlenecks.apply(
        params, state, cfg, z, jax.random.PRNGKey(2), jnp.int32(0), True
    )
    assert float(jnp.abs(zq).max()) == 0.0 and zq.shape == z.shape
    assert float(aux["bn_loss"]) == 0.0 and st == {}
    # and gradients through it vanish (conditioning path truly severed)
    g = jax.grad(lambda z: jnp.sum(bottlenecks.apply(
        params, state, cfg, z, jax.random.PRNGKey(2), jnp.int32(0), True
    )[0] ** 2))(z)
    assert float(jnp.abs(g).max()) == 0.0


# ---------------------------------------------------------------------- VAE

def test_vae_kl_and_annealing():
    cfg = BottleneckConfig(kind="vae", n_dim=8, kl_anneal_steps=100)
    params, _ = bottlenecks.init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 5))
    _, _, aux0 = bottlenecks.apply(params, {}, cfg, z, jax.random.PRNGKey(2), jnp.int32(0), True)
    _, _, aux50 = bottlenecks.apply(params, {}, cfg, z, jax.random.PRNGKey(2), jnp.int32(50), True)
    assert float(aux0["kl"]) > 0.0
    assert float(aux0["kl_weight"]) == 0.0
    assert float(aux50["kl_weight"]) == pytest.approx(0.5)
    # eval: deterministic (zq == mu)
    a, _, _ = bottlenecks.apply(params, {}, cfg, z, jax.random.PRNGKey(5), jnp.int32(0), False)
    b, _, _ = bottlenecks.apply(params, {}, cfg, z, jax.random.PRNGKey(6), jnp.int32(0), False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ------------------------------------------------------------------ encoder

def test_encoder_matches_geometry():
    cfg = EncoderConfig(n_ch=16, n_pre_res=1, n_post_res=2, n_out=8)
    params = encoder.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.n_in, 57))
    z = encoder.apply(params, cfg, x)
    assert z.shape == (2, 8, encoder.geometry(cfg).out_len(57))


def test_mu_ce_layouts_agree():
    """models/common.mu_ce: the time-major logsumexp formulation (fused
    Pallas stack's native [B, T, Q] layout) == the channel-major
    log_softmax one."""
    import numpy as _np
    import jax.numpy as _jnp
    from ae_wavenet_tpu.models import common as _common

    rng = _np.random.default_rng(0)
    logits = _jnp.asarray(rng.normal(size=(2, 7, 50)) * 3, _jnp.float32)
    targets = _jnp.asarray(rng.integers(0, 7, (2, 50)), _jnp.int32)
    a = _common.mu_ce(logits, targets, btq=False)
    b = _common.mu_ce(_jnp.transpose(logits, (0, 2, 1)), targets, btq=True)
    _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b), rtol=1e-6)


# ------------------------------------------------------------- grouped VQ

def test_vq_grouped_matches_numpy_oracle():
    """vq_groups=2: per-group argmin/EMA/quantize equal an independent
    numpy implementation over each D/G-dim sub-vector."""
    cfg = BottleneckConfig(kind="vq", n_dim=4, vq_k=8, jitter_p=0.0,
                           vq_groups=2)
    _, state = bottlenecks.init(jax.random.PRNGKey(0), cfg)
    assert np.asarray(state["codebook"]).shape == (2, 8, 2)
    rng = np.random.default_rng(0)
    z = rng.normal(size=(2, 4, 6)).astype(np.float32)

    zq, new_state, aux = bottlenecks.apply(
        {}, state, cfg, jnp.asarray(z), jax.random.PRNGKey(1), jnp.int32(0),
        True)

    zf = z.transpose(0, 2, 1).reshape(-1, 4)
    q_want = np.zeros_like(zf)
    for g in range(2):
        e = np.asarray(state["codebook"])[g]          # [8, 2]
        zg = zf[:, g * 2 : (g + 1) * 2]
        d2 = ((zg[:, None, :] - e[None, :, :]) ** 2).sum(-1)
        idx = d2.argmin(1)
        q_want[:, g * 2 : (g + 1) * 2] = e[idx]
        onehot = np.eye(8)[idx]
        dec = cfg.ema_decay
        nc = dec * np.asarray(state["ema_counts"])[g] + (1 - dec) * onehot.sum(0)
        ns = dec * np.asarray(state["ema_sums"])[g] + (1 - dec) * (onehot.T @ zg)
        n = nc.sum()
        smoothed = (nc + cfg.ema_eps) / (n + 8 * cfg.ema_eps) * n
        np.testing.assert_allclose(np.asarray(new_state["ema_counts"])[g],
                                   nc, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new_state["codebook"])[g],
                                   ns / smoothed[:, None], rtol=1e-4)
    q = np.asarray(zq).transpose(0, 2, 1).reshape(-1, 4)
    np.testing.assert_allclose(q, q_want, rtol=1e-4, atol=1e-6)
    want_commit = ((zf - q_want) ** 2).sum(-1).mean()
    np.testing.assert_allclose(float(aux["commitment"]), want_commit,
                               rtol=1e-4)


def test_vq_grouped_straight_through_and_restarts():
    # threshold above the one-step EMA floor (0.99*1 + 0.01*0 = 0.99) so
    # codes unused in this single step count as dead
    cfg = BottleneckConfig(kind="vq", n_dim=4, vq_k=8, jitter_p=0.0,
                           vq_groups=2, vq_restart_thresh=0.995)
    _, state = bottlenecks.init(jax.random.PRNGKey(0), cfg)
    z = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 5)),
                    jnp.float32)

    def f(zz):
        zq, _, aux = bottlenecks.apply({}, state, cfg, zz,
                                       jax.random.PRNGKey(1), jnp.int32(0),
                                       True)
        return jnp.sum(zq * 2.0)

    g = jax.grad(f)(z)
    # STE: gradient passes through the quantizer unchanged
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(g),
                               rtol=1e-6)
    # aggressive restart threshold: unused codes get re-seeded this step
    _, ns, aux = bottlenecks.apply({}, state, cfg, z, jax.random.PRNGKey(1),
                                   jnp.int32(0), True)
    assert float(aux["restarts"]) > 0
    assert np.asarray(ns["codebook"]).shape == (2, 8, 2)
    assert np.isfinite(np.asarray(ns["codebook"])).all()


def test_vq_groups_config_validation():
    with pytest.raises(ValueError, match="vq_groups"):
        BottleneckConfig(kind="vq", n_dim=6, vq_groups=4)
    with pytest.raises(ValueError, match="vq_use_pallas"):
        BottleneckConfig(kind="vq", n_dim=8, vq_groups=2, vq_use_pallas=True)

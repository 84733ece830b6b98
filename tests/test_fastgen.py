"""Fast-queue sampler equivalence vs teacher forcing and the naive
O(R)/sample oracle (SURVEY.md §4: "fast-queue sampler vs naive sampler
equivalence").  This is the correctness anchor for all generation-path
optimizations (Pallas fusion must preserve these properties)."""

import numpy as np

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.models import wavenet
from ae_wavenet_tpu.ops import fastgen
from ae_wavenet_tpu.utils.config import WaveNetConfig

CFG = WaveNetConfig(
    n_blocks=2, n_block_layers=3, n_res=16, n_dil=16, n_skp=16, n_post=16,
    n_lc_in=8, n_lc_out=12, n_speakers=5, n_global_embed=4,
)  # dilations (1,2,4)x2, rf = 14


def _setup(seed=0, batch=2, t_extra=40):
    rf = wavenet.receptive_field(CFG)
    t_in = rf + t_extra
    params = wavenet.init(jax.random.PRNGKey(seed), CFG)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, 256, (batch, t_in)), jnp.int32)
    cond = jnp.asarray(rng.normal(size=(batch, CFG.n_lc_out, t_in)) * 0.3, jnp.float32)
    spk = jnp.asarray(rng.integers(0, 5, (batch,)), jnp.int32)
    return params, ids, cond, spk, rf, t_in


def test_primed_scan_matches_teacher_forcing():
    """Scanning the per-sample cell over teacher inputs reproduces the
    batched teacher-forcing logits exactly (after the warmup region)."""
    params, ids, cond, spk, rf, t_in = _setup()
    logits_tf = np.asarray(wavenet.apply(params, CFG, ids, cond, spk))

    state = fastgen.init_state(CFG, batch=ids.shape[0])
    _, logits_scan = fastgen.prime(
        params, CFG, state, ids, cond, spk, return_logits=True
    )
    logits_scan = np.asarray(logits_scan)  # [B, Q, t_in - 1]
    # scan step t consumes ids[t] and emits the prediction for t+1;
    # teacher-forcing column j predicts position rf+j+1 (consumed ids[rf+j])
    got = logits_scan[..., rf:]
    np.testing.assert_allclose(got, logits_tf[..., : got.shape[-1]],
                               rtol=2e-4, atol=2e-4)


def test_generate_matches_naive_greedy():
    params, ids, cond, spk, rf, t_in = _setup(seed=1)
    n = 20
    ctx = ids[..., : rf + 1]

    naive = np.asarray(
        fastgen.generate_naive(
            params, CFG, ctx, cond[..., : rf + n], jax.random.PRNGKey(0),
            gc_ids=spk, n_steps=n, temperature=0.0,
        )
    )

    state = fastgen.init_state(CFG, batch=ids.shape[0])
    state = fastgen.prime(params, CFG, state, ctx, cond, spk)
    fast, _ = fastgen.generate(
        params, CFG, state, cond[..., rf : rf + n], jax.random.PRNGKey(0),
        gc_ids=spk, temperature=0.0,
    )
    np.testing.assert_array_equal(naive, np.asarray(fast))


def test_generate_stateful_chunking():
    """Generating 30 steps == generating 10 then 20 with the carried state."""
    params, ids, cond, spk, rf, t_in = _setup(seed=2)
    ctx = ids[..., : rf + 1]
    state0 = fastgen.prime(
        params, CFG, fastgen.init_state(CFG, ids.shape[0]), ctx, cond, spk
    )
    whole, _ = fastgen.generate(
        params, CFG, state0, cond[..., rf : rf + 30], jax.random.PRNGKey(7),
        gc_ids=spk, temperature=0.0,
    )
    a, st = fastgen.generate(
        params, CFG, state0, cond[..., rf : rf + 10], jax.random.PRNGKey(7),
        gc_ids=spk, temperature=0.0,
    )
    b, _ = fastgen.generate(
        params, CFG, st, cond[..., rf + 10 : rf + 30], jax.random.PRNGKey(7),
        gc_ids=spk, temperature=0.0,
    )
    np.testing.assert_array_equal(
        np.asarray(whole), np.concatenate([np.asarray(a), np.asarray(b)], axis=1)
    )


def test_sampling_temperature_zero_vs_one_differ():
    params, ids, cond, spk, rf, t_in = _setup(seed=3)
    ctx = ids[..., : rf + 1]
    st = fastgen.prime(
        params, CFG, fastgen.init_state(CFG, ids.shape[0]), ctx, cond, spk
    )
    greedy, _ = fastgen.generate(
        params, CFG, st, cond[..., rf : rf + 25], jax.random.PRNGKey(0),
        gc_ids=spk, temperature=0.0,
    )
    hot, _ = fastgen.generate(
        params, CFG, st, cond[..., rf : rf + 25], jax.random.PRNGKey(0),
        gc_ids=spk, temperature=1.0,
    )
    assert not np.array_equal(np.asarray(greedy), np.asarray(hot))
    assert np.asarray(hot).min() >= 0 and np.asarray(hot).max() < 256

"""Fused Pallas sampling cell vs the lax.scan reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.models import wavenet
from ae_wavenet_tpu.ops import fastgen, fastgen_pallas as fp
from ae_wavenet_tpu.utils.config import WaveNetConfig

CFG = WaveNetConfig(
    n_blocks=2, n_block_layers=3, n_res=16, n_dil=16, n_skp=16, n_post=16,
    n_lc_in=8, n_lc_out=12, n_speakers=5, n_global_embed=4,
)
RF = sum(CFG.dilations)


def _setup(seed=0, batch=2, n=24):
    params = wavenet.init(jax.random.PRNGKey(seed), CFG)
    rng = np.random.default_rng(seed)
    t_in = RF + 1 + n
    ids = jnp.asarray(rng.integers(0, 256, (batch, t_in)), jnp.int32)
    cond = jnp.asarray(rng.normal(size=(batch, CFG.n_lc_out, t_in)) * 0.3,
                       jnp.float32)
    spk = jnp.asarray(rng.integers(0, 5, (batch,)), jnp.int32)
    state = fastgen.init_state(CFG, batch)
    state = fastgen.prime(params, CFG, state, ids[..., : RF + 1], cond, spk)
    return params, ids, cond, spk, state


def test_fused_matches_scan_greedy():
    n = 24
    params, ids, cond, spk, state = _setup(n=n)
    gen_cond = cond[..., RF : RF + n]

    want, _ = fastgen.generate(
        params, CFG, state, gen_cond, jax.random.PRNGKey(0), gc_ids=spk,
        temperature=0.0, dtype=jnp.bfloat16,
    )

    packed = fp.pack_for_pallas(params, CFG)
    flat = fp.state_to_flat(state, CFG)
    cond_gc = fastgen._with_gc(params, CFG, gen_cond, spk)
    got, new_flat, last, logits = fp.generate_fused(
        packed, CFG, flat, state.prev_id, state.t, cond_gc,
        jnp.int32(0), temperature=0.0, debug_logits=True, interpret=True,
    )
    got, want = np.asarray(got), np.asarray(want)
    assert got.shape == want.shape
    agree = (got == want).mean()
    assert agree == 1.0, f"greedy ids agree {agree}\n{got}\n{want}"
    np.testing.assert_array_equal(np.asarray(last), want[:, -1])


def test_fused_state_carry_chunks():
    """10 + 14 fused steps == 24 fused steps (buffer phase via t0)."""
    n = 24
    params, ids, cond, spk, state = _setup(seed=1, n=n)
    gen_cond = fastgen._with_gc(params, CFG, cond[..., RF : RF + n], spk)
    packed = fp.pack_for_pallas(params, CFG)
    flat = fp.state_to_flat(state, CFG)

    whole, _, _ = fp.generate_fused(
        packed, CFG, flat, state.prev_id, state.t, gen_cond,
        jnp.int32(0), temperature=0.0, interpret=True,
    )
    a, flat2, last2 = fp.generate_fused(
        packed, CFG, flat, state.prev_id, state.t, gen_cond[..., :10],
        jnp.int32(0), temperature=0.0, interpret=True,
    )
    b, _, _ = fp.generate_fused(
        packed, CFG, flat2, last2, state.t + 10, gen_cond[..., 10:],
        jnp.int32(0), temperature=0.0, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(whole),
        np.concatenate([np.asarray(a), np.asarray(b)], axis=1),
    )


def test_int8_quantized_logits_close():
    """int8 weight+activation quantized path: logits within a few percent of
    the bf16 path (good enough for sampling; it's an opt-in speed mode)."""
    n = 12
    params, ids, cond, spk, state = _setup(seed=3, n=n)
    gen_cond = fastgen._with_gc(params, CFG, cond[..., RF : RF + n], spk)
    flat = fp.state_to_flat(state, CFG)

    _, _, _, logits_bf16 = fp.generate_fused(
        fp.pack_for_pallas(params, CFG), CFG, flat, state.prev_id, state.t,
        gen_cond, jnp.int32(0), temperature=0.0, debug_logits=True,
        interpret=True,
    )
    _, _, _, logits_q = fp.generate_fused(
        fp.pack_for_pallas_int8(params, CFG), CFG, flat, state.prev_id,
        state.t, gen_cond, jnp.int32(0), temperature=0.0, debug_logits=True,
        interpret=True, quantized=True,
    )
    a, b = np.asarray(logits_bf16[0]), np.asarray(logits_q[0])  # first step
    scale = np.abs(a).max() + 1e-6
    assert np.abs(a - b).max() / scale < 0.08, np.abs(a - b).max() / scale


def test_flat_state_roundtrip():
    params, ids, cond, spk, state = _setup(seed=2)
    flat = fp.state_to_flat(state, CFG)
    back = fp.flat_to_state(flat, state.prev_id, state.t, CFG)
    for a, b in zip(state.bufs, back.bufs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-2)  # bf16 storage


def test_pad_gen_batch_roundtrip():
    """generate_auto pads any batch to a sublane multiple for the fused
    kernel; padded rows must not leak into (or alter) real rows."""
    params, ids, cond, spk, state = _setup(seed=3, batch=3)
    gen_cond = cond[..., RF : RF + 8]
    state_p, cond_p, gc_p = fp._pad_gen_batch(state, gen_cond, spk, pad=5)
    assert cond_p.shape[0] == 8 and gc_p.shape[0] == 8
    for b, bp in zip(state.bufs, state_p.bufs):
        assert bp.shape[0] == 8
        np.testing.assert_array_equal(np.asarray(bp[:3]), np.asarray(b))
        assert float(jnp.abs(bp[3:]).max()) == 0.0
    np.testing.assert_array_equal(np.asarray(state_p.prev_id[:3]),
                                  np.asarray(state.prev_id))
    # dummy prev_id rows get mu-law silence (a valid id)
    assert set(np.asarray(state_p.prev_id[3:]).tolist()) == {128}
    fake_ids = jnp.arange(8 * 4, dtype=jnp.int32).reshape(8, 4)
    ids_u, state_u = fp._unpad_gen_batch(fake_ids, state_p, 3)
    assert ids_u.shape == (3, 4)
    assert all(b.shape[0] == 3 for b in state_u.bufs)
    np.testing.assert_array_equal(np.asarray(state_u.prev_id),
                                  np.asarray(state.prev_id))


def test_pad_gen_batch_no_gc():
    params, ids, cond, spk, state = _setup(seed=4, batch=1)
    gen_cond = cond[..., RF : RF + 4]
    _, cond_p, gc_p = fp._pad_gen_batch(state, gen_cond, None, pad=7)
    assert gc_p is None and cond_p.shape[0] == 8


def test_int4_pack_roundtrip_oracle():
    """Nibble packing contract: kernel-side unpack (arith >>4 / &15, zp 8)
    recovers exactly the quantized planes for random weights."""
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=(3, 8, 6)), jnp.float32)
    packed, s = fp.quantize_int4_pair(w)
    assert packed.dtype == jnp.int8 and packed.shape == (3, 4, 6)
    # reference quantization
    wn = np.asarray(w)
    sn = np.maximum(np.abs(wn).max(axis=-2, keepdims=True) / 7.0, 1e-12)
    qn = np.clip(np.round(wn / sn), -7, 7).astype(np.int32)
    # kernel-side unpack
    pk32 = np.asarray(packed).astype(np.int32)
    hi = pk32 >> 4
    lo = (pk32 & 15) - 8
    np.testing.assert_array_equal(hi, qn[:, :4, :])
    np.testing.assert_array_equal(lo, qn[:, 4:, :])
    np.testing.assert_allclose(np.asarray(s), sn, rtol=1e-6)


def test_int4_quantized_logits_close():
    """int4 weight + int8 activation path: logits close enough to bf16 for
    sampling (looser than int8 — 4-bit weights; the on-chip quality gate is
    the generation-quality record in BASELINE.md)."""
    n = 12
    params, ids, cond, spk, state = _setup(seed=3, n=n)
    gen_cond = fastgen._with_gc(params, CFG, cond[..., RF : RF + n], spk)
    flat = fp.state_to_flat(state, CFG)

    _, _, _, logits_bf16 = fp.generate_fused(
        fp.pack_for_pallas(params, CFG), CFG, flat, state.prev_id, state.t,
        gen_cond, jnp.int32(0), temperature=0.0, debug_logits=True,
        interpret=True,
    )
    _, _, _, logits_q = fp.generate_fused(
        fp.pack_for_pallas_int4(params, CFG), CFG, flat, state.prev_id,
        state.t, gen_cond, jnp.int32(0), temperature=0.0, debug_logits=True,
        interpret=True, quantized="int4",
    )
    a, b = np.asarray(logits_bf16[0]), np.asarray(logits_q[0])  # first step
    scale = np.abs(a).max() + 1e-6
    assert np.abs(a - b).max() / scale < 0.20, np.abs(a - b).max() / scale


def test_norm_wq():
    assert fp._norm_wq(False) is None and fp._norm_wq(None) is None
    assert fp._norm_wq(True) == "int8" == fp._norm_wq("int8")
    assert fp._norm_wq("int4") == "int4"
    with pytest.raises(ValueError):
        fp._norm_wq("int2")

"""Compiled (Mosaic) Pallas kernels vs their XLA oracles on a real TPU.

These mirror tests/test_fastgen_pallas.py and tests/test_vq_pallas.py but
execute the COMPILED kernels at flagship shapes — the configuration the
bench and CLI actually ship — so a mis-compile (DMA ordering, semaphore
reuse, VMEM residency, int8 MXU path) fails CI on TPU hosts instead of
only surfacing in manual bench runs.

Reference behavior being validated: fast-queue AR sampling equivalence
(Fast WaveNet, arXiv:1611.09482; SURVEY.md §2.0 row 4) and the fused VQ
nearest-neighbor/EMA-statistics kernel (SURVEY.md §2.0 row 2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.models import wavenet
from ae_wavenet_tpu.ops import fastgen, fastgen_pallas as fp
from ae_wavenet_tpu.ops.vq_pallas import vq_lookup_fused
from ae_wavenet_tpu.utils.config import WaveNetConfig

# Flagship decoder (utils/config.py defaults) at a reduced batch: the same
# channel dims / dilation schedule / kernel tiling as the shipped config.
CFG = WaveNetConfig()
RF = sum(CFG.dilations)
BATCH = 8


@pytest.fixture(scope="module")
def primed():
    assert fp.supports_fused(CFG, BATCH)
    params = wavenet.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    n = 64
    t_in = RF + 1 + n
    ids = jnp.asarray(rng.integers(0, 256, (BATCH, t_in)), jnp.int32)
    cond = jnp.asarray(
        rng.normal(size=(BATCH, CFG.n_lc_out, t_in)) * 0.3, jnp.float32
    )
    spk = jnp.asarray(rng.integers(0, CFG.n_speakers, (BATCH,)), jnp.int32)
    state = fastgen.init_state(CFG, BATCH)
    state = fastgen.prime(params, CFG, state, ids[..., : RF + 1], cond, spk)
    gen_cond = cond[..., RF : RF + n]
    return params, gen_cond, spk, state


def test_compiled_greedy_matches_scan(primed):
    params, gen_cond, spk, state = primed

    want, _ = fastgen.generate(
        params, CFG, state, gen_cond, jax.random.PRNGKey(0), gc_ids=spk,
        temperature=0.0, dtype=jnp.bfloat16,
    )

    packed = fp.pack_for_pallas(params, CFG)
    flat = fp.state_to_flat(state, CFG)
    cond_gc = fastgen._with_gc(params, CFG, gen_cond, spk)
    got, _, last, logits = fp.generate_fused(
        packed, CFG, flat, state.prev_id, state.t, cond_gc,
        jnp.int32(0), temperature=0.0, debug_logits=True,
    )
    got, want = np.asarray(got), np.asarray(want)
    agree = float((got == want).mean())
    # bf16 MXU reduction order differs between the two compiled programs, so
    # a rare near-tie can flip one greedy id and the AR sequences then
    # legitimately diverge; require near-total agreement rather than bit
    # equality (interpret-mode tests pin exactness of the math itself).
    assert agree >= 0.95, f"greedy ids agree only {agree:.3f}"
    np.testing.assert_array_equal(np.asarray(last), got[:, -1])
    assert np.isfinite(np.asarray(logits)).all()


def test_compiled_chunked_state_carry(primed):
    """24 + 40 compiled steps == 64 compiled steps (same kernel, exact)."""
    params, gen_cond, spk, state = primed
    packed = fp.pack_for_pallas(params, CFG)
    flat = fp.state_to_flat(state, CFG)
    cond_gc = fastgen._with_gc(params, CFG, gen_cond, spk)

    whole, _, _ = fp.generate_fused(
        packed, CFG, flat, state.prev_id, state.t, cond_gc,
        jnp.int32(0), temperature=0.0,
    )
    a, flat2, last2 = fp.generate_fused(
        packed, CFG, flat, state.prev_id, state.t, cond_gc[..., :24],
        jnp.int32(0), temperature=0.0,
    )
    b, _, _ = fp.generate_fused(
        packed, CFG, flat2, last2, state.t + 24, cond_gc[..., 24:],
        jnp.int32(0), temperature=0.0,
    )
    np.testing.assert_array_equal(
        np.asarray(whole),
        np.concatenate([np.asarray(a), np.asarray(b)], axis=1),
    )


def test_compiled_int8_logits_close(primed):
    """Compiled int8 weight-streaming path: first-step logits within a few
    percent of the compiled bf16 path (the sampling-quality contract the
    CLI --int8 flag relies on)."""
    params, gen_cond, spk, state = primed
    flat = fp.state_to_flat(state, CFG)
    cond_gc = fastgen._with_gc(params, CFG, gen_cond, spk)

    _, _, _, logits_bf16 = fp.generate_fused(
        fp.pack_for_pallas(params, CFG), CFG, flat, state.prev_id, state.t,
        cond_gc[..., :8], jnp.int32(0), temperature=0.0, debug_logits=True,
    )
    _, _, _, logits_q = fp.generate_fused(
        fp.pack_for_pallas_int8(params, CFG), CFG, flat, state.prev_id,
        state.t, cond_gc[..., :8], jnp.int32(0), temperature=0.0,
        debug_logits=True, quantized=True,
    )
    a = np.asarray(logits_bf16[0])
    b = np.asarray(logits_q[0])
    scale = np.abs(a).max() + 1e-6
    assert np.abs(a - b).max() / scale < 0.08, np.abs(a - b).max() / scale


def test_compiled_sampling_runs(primed):
    """temperature>0 exercises the in-kernel TPU PRNG (absent in interpret
    mode on CPU): ids must be valid classes and differ across seeds."""
    params, gen_cond, spk, state = primed
    ids1, _ = fp.generate_auto(params, CFG, state, gen_cond,
                               jax.random.PRNGKey(1), gc_ids=spk,
                               temperature=1.0)
    ids2, _ = fp.generate_auto(params, CFG, state, gen_cond,
                               jax.random.PRNGKey(2), gc_ids=spk,
                               temperature=1.0)
    ids1, ids2 = np.asarray(ids1), np.asarray(ids2)
    assert ids1.min() >= 0 and ids1.max() < CFG.n_quant
    assert (ids1 != ids2).any(), "different seeds produced identical streams"


@pytest.mark.parametrize("n", [4096, 3000])
def test_vq_fused_compiled_matches_xla(n):
    """Compiled fused VQ kernel == XLA formulation at flagship shapes
    (K=512, D=64 — utils/config.py BottleneckConfig defaults)."""
    k, d = 512, 64
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(k, d)), jnp.float32)

    codes, quant, counts, sums = vq_lookup_fused(z, e, tile_n=512)

    d2 = (
        jnp.sum(z**2, 1, keepdims=True) - 2 * z @ e.T + jnp.sum(e**2, 1)[None]
    )
    want_codes = np.asarray(jnp.argmin(d2, 1))
    onehot = np.asarray(jax.nn.one_hot(jnp.asarray(want_codes), k))
    codes = np.asarray(codes)
    # near-ties can argmin differently between the two formulations; the
    # codes must agree except (possibly) on exact distance ties
    disagree = codes != want_codes
    if disagree.any():
        d2n = np.asarray(d2)
        rows = np.where(disagree)[0]
        gap = np.abs(
            d2n[rows, codes[rows]] - d2n[rows, want_codes[rows]]
        )
        assert (gap < 1e-3).all(), f"non-tie code mismatches: {gap.max()}"
        assert disagree.mean() < 0.01
    np.testing.assert_allclose(
        np.asarray(quant), np.asarray(e)[codes], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(counts).sum(), n, rtol=0, atol=0.5
    )
    if not disagree.any():
        np.testing.assert_allclose(
            np.asarray(counts), onehot.sum(0), rtol=1e-5, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(sums), onehot.T @ np.asarray(z), rtol=1e-4, atol=1e-3
        )


def _prefix_logit_check(primed, quantized: bool, tol: float,
                        min_agree_steps: int):
    """First-32-step LOGITS comparison vs the scan cell (round-2 verdict
    weak #4: id agreement >= 0.95 was too loose a gate).

    Greedy streams legitimately diverge after a near-tie id flip, so the
    comparison runs per batch row up to its first id divergence — INCLUSIVE:
    the logits AT the divergence step were still produced from identical
    input histories (only the step's output id differs), so they are always
    comparable and every row pins at least step 0's logits even if the ids
    flip immediately.  Up to there both programs consumed IDENTICAL inputs
    and their logits must agree to (accumulated) bf16/quantization
    tolerance — a far tighter pin on the kernel's numerics than id
    agreement."""
    params, gen_cond, spk, state = primed
    n = 32
    want_ids, _, want_lg = fastgen.generate(
        params, CFG, state, gen_cond[..., :n], jax.random.PRNGKey(0),
        gc_ids=spk, temperature=0.0, dtype=jnp.bfloat16, return_logits=True,
    )  # ids [B, n], logits [B, Q, n]

    packed = {None: fp.pack_for_pallas, "int8": fp.pack_for_pallas_int8,
              "int4": fp.pack_for_pallas_int4}[fp._norm_wq(quantized)](
        params, CFG)
    flat = fp.state_to_flat(state, CFG)
    cond_gc = fastgen._with_gc(params, CFG, gen_cond[..., :n], spk)
    got_ids, _, _, got_lg = fp.generate_fused(
        packed, CFG, flat, state.prev_id, state.t, cond_gc, jnp.int32(0),
        temperature=0.0, debug_logits=True, quantized=quantized,
    )  # ids [B, n], logits [n, B, Q]

    want_ids = np.asarray(want_ids)
    got_ids = np.asarray(got_ids)
    a = np.transpose(np.asarray(want_lg, np.float32), (0, 2, 1))  # [B, n, Q]
    b = np.transpose(np.asarray(got_lg, np.float32), (1, 0, 2))   # [B, n, Q]

    scale = np.abs(a).max() + 1e-6
    agree_total = 0
    for r in range(want_ids.shape[0]):
        diff = np.nonzero(want_ids[r] != got_ids[r])[0]
        t_div = int(diff[0]) if len(diff) else n
        agree_total += t_div
        # inclusive prefix: logits at step t_div itself came from identical
        # histories, so every row checks at least step 0 (non-vacuous by
        # construction, no agreement floor needed for that)
        hi = min(t_div + 1, n)
        rel = np.abs(a[r, :hi] - b[r, :hi]).max() / scale
        assert rel < tol, (r, t_div, rel)
    # lockstep floor: documents measured greedy agreement; the logit check
    # above is the real gate
    assert agree_total >= min_agree_steps * want_ids.shape[0], (
        agree_total / want_ids.shape[0])


def test_compiled_logits_match_scan_prefix_bf16(primed):
    _prefix_logit_check(primed, quantized=False, tol=0.05,
                        min_agree_steps=24)


def test_compiled_logits_match_scan_prefix_int8(primed):
    """int8 weight-streaming: same prefix comparison, quantization-scale
    tolerance (per-channel int8 on streamed weights only).  Measured mean
    greedy agreement vs the bf16 scan cell is ~7.9 steps before the
    quantization error flips an id (v5e, 2026-08-17) — the logits
    tolerance over the agreeing prefix is the real gate; the agreement
    floor only keeps the comparison non-vacuous."""
    _prefix_logit_check(primed, quantized=True, tol=0.10, min_agree_steps=5)


def test_compiled_logits_match_scan_prefix_int4(primed):
    """int4 nibble-packed weight streaming: same prefix comparison with a
    4-bit-weight tolerance.  The inclusive-prefix logits tolerance is the
    gate; no lockstep floor — measured mean greedy agreement vs the bf16
    scan cell is only ~1.9 steps standalone on v5e (2026-08-19,
    /tmp/q5e_int4_gate.log): 16-level quantization perturbs logits by
    ~0.3 relative, which crosses argmax boundaries almost immediately
    under temperature-0 decoding.  Trajectory-level fidelity under real
    (temp 1.0) sampling is gated separately and measured at ~10% of the
    spectral-quality budget (scripts/quality_quantized.py,
    docs/quality_quantized_r5.jsonl).

    Tolerance calibrated from measurement: max relative logit drift over
    an agreeing greedy prefix is 0.294 on v5e (2026-08-19, /tmp/
    q5c_tests_tpu.log) — 16-level weights accumulate ~3x the int8 drift
    through the 24-layer stack.  0.40 bounds that with headroom while
    still failing on a packing/scale bug (which shows up as O(1) drift)."""
    _prefix_logit_check(primed, quantized="int4", tol=0.40,
                        min_agree_steps=0)


# ------------------------------------------------------- gated train stack

def test_compiled_gated_stack_matches_xla():
    """Compiled fused gated-conv training-forward stack (ops/gated_pallas.py)
    vs the XLA oracle at flagship channel dims (SURVEY §2.0 row 1)."""
    from ae_wavenet_tpu.ops import gated_pallas as gp

    cfg = CFG
    t_out, batch = 4000, 4
    t_in = t_out + RF
    assert gp.supports_pallas_stack(cfg, t_in)
    params = wavenet.init(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(7)
    x_ids = jnp.asarray(rng.integers(0, cfg.n_quant, (batch, t_in)), jnp.int32)
    cond = jnp.asarray(rng.normal(size=(batch, cfg.n_lc_out, t_in)) * 0.5,
                       jnp.float32)
    spk = jnp.asarray(rng.integers(0, cfg.n_speakers, (batch,)), jnp.int32)

    ref = wavenet.apply(params, cfg, x_ids, cond, spk, dtype=jnp.bfloat16)
    got = gp.stack_apply(params, cfg, x_ids, cond, spk, tile=1024)
    assert got.shape == ref.shape
    d = np.abs(np.asarray(ref, np.float32) - np.asarray(got, np.float32))
    assert d.max() < 0.05, d.max()


def test_compiled_gated_pair_stack_matches_xla():
    """Compiled two-layer pair fusion (gated_pair_fused: persistent VMEM
    tail across sequential grid steps) at flagship dims incl. the (256, 512)
    dilation pair — forward AND custom_vjp backward vs XLA."""
    from ae_wavenet_tpu.ops import gated_pallas as gp

    cfg = CFG
    t_out, batch = 4000, 4
    t_in = t_out + RF
    params = wavenet.init(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(7)
    x_ids = jnp.asarray(rng.integers(0, cfg.n_quant, (batch, t_in)), jnp.int32)
    cond = jnp.asarray(rng.normal(size=(batch, cfg.n_lc_out, t_in)) * 0.5,
                       jnp.float32)
    spk = jnp.asarray(rng.integers(0, cfg.n_speakers, (batch,)), jnp.int32)
    probe = jnp.asarray(rng.normal(size=(batch, cfg.n_quant, t_out)) * 0.1,
                        jnp.float32)

    ref = wavenet.apply(params, cfg, x_ids, cond, spk, dtype=jnp.bfloat16)
    got = gp.stack_apply(params, cfg, x_ids, cond, spk, tile=1024,
                         fuse_pairs=True)
    d = np.abs(np.asarray(ref, np.float32) - np.asarray(got, np.float32))
    assert d.max() < 0.05, d.max()

    def loss_xla(p, c):
        out = wavenet.apply(p, cfg, x_ids, c, spk, dtype=jnp.bfloat16)
        return jnp.mean(out.astype(jnp.float32) * probe)

    def loss_pal(p, c):
        out = gp.stack_apply(p, cfg, x_ids, c, spk, tile=1024,
                             fuse_pairs=True)
        return jnp.mean(out.astype(jnp.float32) * probe)

    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(params, cond)
    gpl = jax.jit(jax.grad(loss_pal, argnums=(0, 1)))(params, cond)

    def flat(t):
        return np.concatenate(
            [np.asarray(x, np.float32).ravel() for x in jax.tree.leaves(t)])

    fx, fp = flat(gx), flat(gpl)
    assert np.isfinite(fp).all()
    scale = np.abs(fx).max() + 1e-9
    assert np.abs(fp - fx).max() / scale < 0.05, np.abs(fp - fx).max() / scale


def test_compiled_gated_stack_grads():
    """Compiled fused forward+backward (custom_vjp) vs XLA grads on TPU."""
    from ae_wavenet_tpu.ops import gated_pallas as gp

    cfg = CFG
    t_out, batch = 4000, 4
    t_in = t_out + RF
    params = wavenet.init(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(7)
    x_ids = jnp.asarray(rng.integers(0, cfg.n_quant, (batch, t_in)), jnp.int32)
    cond = jnp.asarray(rng.normal(size=(batch, cfg.n_lc_out, t_in)) * 0.5,
                       jnp.float32)
    spk = jnp.asarray(rng.integers(0, cfg.n_speakers, (batch,)), jnp.int32)
    probe = jnp.asarray(rng.normal(size=(batch, cfg.n_quant, t_out)) * 0.1,
                        jnp.float32)

    def loss_xla(p, c):
        out = wavenet.apply(p, cfg, x_ids, c, spk, dtype=jnp.bfloat16)
        return jnp.mean(out.astype(jnp.float32) * probe)

    def loss_pal(p, c):
        out = gp.stack_apply(p, cfg, x_ids, c, spk, tile=1024)
        return jnp.mean(out.astype(jnp.float32) * probe)

    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(params, cond)
    gpl = jax.jit(jax.grad(loss_pal, argnums=(0, 1)))(params, cond)

    def flat(t):
        return np.concatenate(
            [np.asarray(x, np.float32).ravel() for x in jax.tree.leaves(t)])

    fx, fp = flat(gx), flat(gpl)
    assert np.isfinite(fp).all()
    scale = np.abs(fx).max() + 1e-9
    assert np.abs(fp - fx).max() / scale < 0.05, np.abs(fp - fx).max()


def test_compiled_full_fusion_and_grouped_bwd_matches_xla():
    """Compiled whole-stack forward fusion + grouped backward (the round-3
    opt-in schedules, interpret-tested in tests/test_gated_pallas.py) vs the
    XLA oracle on real TPU — forward and grads.  Gates the BENCH_FULL_FUSION
    / BENCH_BWD_GROUP A/Bs in scripts/tpu_queue_r4.sh."""
    from ae_wavenet_tpu.ops import gated_pallas as gp

    cfg = CFG
    t_out, batch = 4000, 4
    t_in = t_out + RF
    params = wavenet.init(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(7)
    x_ids = jnp.asarray(rng.integers(0, cfg.n_quant, (batch, t_in)), jnp.int32)
    cond = jnp.asarray(rng.normal(size=(batch, cfg.n_lc_out, t_in)) * 0.5,
                       jnp.float32)
    spk = jnp.asarray(rng.integers(0, cfg.n_speakers, (batch,)), jnp.int32)
    probe = jnp.asarray(rng.normal(size=(batch, cfg.n_quant, t_out)) * 0.1,
                        jnp.float32)

    ref = wavenet.apply(params, cfg, x_ids, cond, spk, dtype=jnp.bfloat16)
    got = gp.stack_apply(params, cfg, x_ids, cond, spk, tile=1024,
                         full_fusion=True, bwd_group=5)
    d = np.abs(np.asarray(ref, np.float32) - np.asarray(got, np.float32))
    assert d.max() < 0.05, d.max()

    def loss_xla(p, c):
        out = wavenet.apply(p, cfg, x_ids, c, spk, dtype=jnp.bfloat16)
        return jnp.mean(out.astype(jnp.float32) * probe)

    def loss_pal(p, c):
        out = gp.stack_apply(p, cfg, x_ids, c, spk, tile=1024,
                             full_fusion=True, bwd_group=5)
        return jnp.mean(out.astype(jnp.float32) * probe)

    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(params, cond)
    gpl = jax.jit(jax.grad(loss_pal, argnums=(0, 1)))(params, cond)

    def flat(t):
        return np.concatenate(
            [np.asarray(x, np.float32).ravel() for x in jax.tree.leaves(t)])

    fx, fp = flat(gx), flat(gpl)
    assert np.isfinite(fp).all()
    scale = np.abs(fx).max() + 1e-9
    assert np.abs(fp - fx).max() / scale < 0.05, np.abs(fp - fx).max() / scale


def test_generate_auto_pads_odd_batch(primed):
    """generate_auto serves batch sizes the kernel can't tile directly
    (batch % 8 != 0) by padding with dummy rows; greedy output for the
    real rows must equal the directly-tileable batch-8 run row-for-row
    (rows are independent in the AR cell)."""
    params, gen_cond, spk, state = primed

    want, _ = fp.generate_auto(params, CFG, state, gen_cond,
                               jax.random.PRNGKey(0), gc_ids=spk,
                               temperature=0.0)
    for b in (1, 3):
        sub = fastgen.GenState(
            bufs=tuple(x[:b] for x in state.bufs),
            prev_id=state.prev_id[:b], t=state.t)
        got, new_state = fp.generate_auto(
            params, CFG, sub, gen_cond[:b], jax.random.PRNGKey(0),
            gc_ids=spk[:b], temperature=0.0)
        assert got.shape == (b, want.shape[1])
        assert all(x.shape[0] == b for x in new_state.bufs)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want[:b]))

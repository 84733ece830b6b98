"""Fully-fused Pallas AR sampling cell: one kernel generates T samples.

The north-star kernel (BASELINE.json): "cached fast-queue O(1)/sample path
fused in Pallas, batch-64".  The lax.scan cell in ops/fastgen.py measures
~185us/sample on v5e (overhead-bound); this kernel fuses the whole per-sample
pipeline — embedding, all L gated layers, ring-buffer maintenance, post-net,
and Gumbel-max sampling — into a single Pallas program with a sequential
grid over time.

Performance model (v5e, flagship config, batch 64):
  * weight streaming is the fundamental bound: all ~25 MB (bf16) of layer
    weights must flow HBM->VMEM EVERY sample (the AR dependency makes
    weight reuse across samples impossible); at ~800 GB/s that caps
    throughput at ~31k samples/s (RTF ~2 at 16 kHz).
  * per layer, the weight DMA for layer l+1 overlaps layer l's two GEMMs
    (double-buffered scratch slots);
  * ring buffers (100 MB bf16) stay in HBM; per step each layer DMAs one
    [B, n_res] slot in and out (~2 MB/step total);
  * everything else (embedding one-hot matmul, gates, post-net, sampling)
    lives in VMEM/registers.

Layout notes: weights are packed as xin @ W (in-major), with the cond block
zero-padded so the concatenated GEMM input width is a multiple of 128 lanes.

Correctness contract: bit-close to ops/fastgen.py's scan cell (same math,
same buffer semantics, Gumbel-max == categorical in distribution; greedy
mode compares exactly up to f32/bf16 reduction rounding) —
tests/test_fastgen_pallas.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ae_wavenet_tpu.ops.fastgen import GenState
from ae_wavenet_tpu.utils.config import WaveNetConfig


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class PallasGenParams(NamedTuple):
    """Device arrays laid out for the fused kernel."""

    w_in: jax.Array    # [L, XIN_PAD, 2*n_dil] bf16 (rows: prev | cur | cond | pad)
    b_in: jax.Array    # [L, 2*n_dil] f32
    w_out: jax.Array   # [L, n_dil, n_res + n_skp] bf16
    b_out: jax.Array   # [L, n_res + n_skp] f32
    embed: jax.Array   # [n_quant, n_res] bf16
    post1_w: jax.Array  # [n_skp, n_post] bf16
    post1_b: jax.Array  # [1, n_post] f32
    post2_w: jax.Array  # [n_post, n_quant] bf16
    post2_b: jax.Array  # [1, n_quant] f32


def pack_for_pallas(params: dict, cfg: WaveNetConfig) -> PallasGenParams:
    n_cond = cfg.n_lc_out + cfg.n_global_embed
    xin = 2 * cfg.n_res + n_cond
    xin_pad = _round_up(xin, 128)
    w_in, b_in, w_out, b_out = [], [], [], []
    for p in params["layers"]:
        w = jnp.concatenate(
            [p["w_prev"]["w"], p["w_cur"]["w"], p["w_cond"]["w"]], axis=1
        )  # [2*n_dil, xin]
        w = jnp.pad(w, ((0, 0), (0, xin_pad - xin)))
        w_in.append(w.T)  # [xin_pad, 2*n_dil]
        b_in.append(p["w_prev"]["b"] + p["w_cur"]["b"] + p["w_cond"]["b"])
        w_out.append(
            jnp.concatenate([p["w_res"]["w"], p["w_skip"]["w"]], axis=0).T
        )  # [n_dil, n_res+n_skp]
        b_out.append(jnp.concatenate([p["w_res"]["b"], p["w_skip"]["b"]]))
    return PallasGenParams(
        w_in=jnp.stack(w_in).astype(jnp.bfloat16),
        b_in=jnp.stack(b_in).astype(jnp.float32),
        w_out=jnp.stack(w_out).astype(jnp.bfloat16),
        b_out=jnp.stack(b_out).astype(jnp.float32),
        embed=params["embed"].astype(jnp.bfloat16),
        post1_w=params["post1"]["w"].T.astype(jnp.bfloat16),
        post1_b=params["post1"]["b"][None, :].astype(jnp.float32),
        post2_w=params["post2"]["w"].T.astype(jnp.bfloat16),
        post2_b=params["post2"]["b"][None, :].astype(jnp.float32),
    )


class Int8GenParams(NamedTuple):
    """Weight-quantized layout: per-output-channel int8 for the streamed
    layer weights (halves the HBM weight traffic — the throughput bound);
    embedding/post stay bf16 (VMEM-resident, not streamed)."""

    w_in_q: jax.Array     # [L, XIN_PAD, 2*n_dil] int8
    w_in_s: jax.Array     # [L, 1, 2*n_dil] f32 per-out-channel scales
    b_in: jax.Array       # [L, 2*n_dil] f32
    w_out_q: jax.Array    # [L, n_dil, n_res + n_skp] int8
    w_out_s: jax.Array    # [L, 1, n_res + n_skp] f32
    b_out: jax.Array      # [L, n_res + n_skp] f32
    embed: jax.Array
    post1_w: jax.Array
    post1_b: jax.Array
    post2_w: jax.Array
    post2_b: jax.Array


def quantize_per_out_channel(w: jax.Array):
    """w [..., in, out] -> (int8 values, [..., 1, out] f32 scales)."""
    s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def pack_for_pallas_int8(params: dict, cfg: WaveNetConfig) -> Int8GenParams:
    p = pack_for_pallas(params, cfg)
    w_in_q, w_in_s = quantize_per_out_channel(p.w_in.astype(jnp.float32))
    w_out_q, w_out_s = quantize_per_out_channel(p.w_out.astype(jnp.float32))
    return Int8GenParams(
        w_in_q=w_in_q, w_in_s=w_in_s, b_in=p.b_in,
        w_out_q=w_out_q, w_out_s=w_out_s, b_out=p.b_out,
        embed=p.embed, post1_w=p.post1_w, post1_b=p.post1_b,
        post2_w=p.post2_w, post2_b=p.post2_b,
    )


class Int4GenParams(NamedTuple):
    """int4 weight streaming: nibble-packed bytes halve the HBM weight
    traffic AGAIN vs int8 (the throughput bound).  Byte [i, j] packs the
    4-bit codes of rows i (hi nibble, signed [-7, 7]) and i + IN/2 (lo
    nibble, zero-point 8 unsigned [1, 15]) of the same output column j;
    the kernel unpacks with one arithmetic shift + one mask and contracts
    both halves on the MXU in int8 (zero-point folded into a row-sum
    correction).  Scales are per-output-channel over the FULL column."""

    w_in_p: jax.Array     # [L, XIN_PAD//2, 2*n_dil] int8 (nibble pairs)
    w_in_s: jax.Array     # [L, 1, 2*n_dil] f32
    b_in: jax.Array       # [L, 2*n_dil] f32
    w_out_p: jax.Array    # [L, n_dil//2, n_res + n_skp] int8
    w_out_s: jax.Array    # [L, 1, n_res + n_skp] f32
    b_out: jax.Array      # [L, n_res + n_skp] f32
    embed: jax.Array
    post1_w: jax.Array
    post1_b: jax.Array
    post2_w: jax.Array
    post2_b: jax.Array


def quantize_int4_pair(w: jax.Array):
    """w [..., IN, OUT] -> (nibble-packed [..., IN//2, OUT] int8 bytes,
    [..., 1, OUT] f32 per-out-channel scales).  W_top = s*hi,
    W_bot = s*(lo - 8)."""
    s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 7.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -7, 7).astype(jnp.int32)
    half = w.shape[-2] // 2
    hi = q[..., :half, :]
    lo = q[..., half:, :] + 8  # [1, 15]
    packed = ((hi << 4) | lo).astype(jnp.int8)
    return packed, s.astype(jnp.float32)


def pack_for_pallas_int4(params: dict, cfg: WaveNetConfig) -> Int4GenParams:
    p = pack_for_pallas(params, cfg)
    w_in_p, w_in_s = quantize_int4_pair(p.w_in.astype(jnp.float32))
    w_out_p, w_out_s = quantize_int4_pair(p.w_out.astype(jnp.float32))
    return Int4GenParams(
        w_in_p=w_in_p, w_in_s=w_in_s, b_in=p.b_in,
        w_out_p=w_out_p, w_out_s=w_out_s, b_out=p.b_out,
        embed=p.embed, post1_w=p.post1_w, post1_b=p.post1_b,
        post2_w=p.post2_w, post2_b=p.post2_b,
    )


def _norm_wq(quantized) -> str | None:
    """Normalize the public ``quantized`` knob: False/None -> None,
    True/'int8' -> 'int8', 'int4' -> 'int4'."""
    if quantized in (False, None, "none"):
        return None
    if quantized in (True, "int8"):
        return "int8"
    if quantized == "int4":
        return "int4"
    raise ValueError(f"quantized={quantized!r}: expected bool, 'int8' or "
                     f"'int4'")


def flat_buffers(cfg: WaveNetConfig):
    """Ring-buffer layout: flat [sum(dilations), B, n_res] bf16 with static
    per-layer offsets.  Layer l's slot at step t is off[l] + (t % d_l)."""
    dil = cfg.dilations
    offs = np.concatenate([[0], np.cumsum(dil)[:-1]]).astype(np.int64)
    return [int(o) for o in offs], int(sum(dil))


def state_to_flat(state: GenState, cfg: WaveNetConfig) -> jax.Array:
    offs, total = flat_buffers(cfg)
    b, c = state.bufs[0].shape[0], state.bufs[0].shape[1]
    flat = jnp.zeros((total, b, c), jnp.bfloat16)
    for o, buf in zip(offs, state.bufs):
        # buf [B, C, d] -> [d, B, C]
        flat = jax.lax.dynamic_update_slice(
            flat, jnp.transpose(buf, (2, 0, 1)).astype(jnp.bfloat16), (o, 0, 0)
        )
    return flat


def flat_to_state(flat: jax.Array, prev_id: jax.Array, t: jax.Array,
                  cfg: WaveNetConfig) -> GenState:
    offs, _ = flat_buffers(cfg)
    bufs = []
    for o, d in zip(offs, cfg.dilations):
        bufs.append(
            jnp.transpose(flat[o : o + d], (1, 2, 0)).astype(jnp.float32)
        )
    return GenState(tuple(bufs), prev_id, t)


def supports_fused_dims(cfg: WaveNetConfig) -> bool:
    """Channel-dim constraints of the compiled kernel (MXU/VPU tiling).
    Batch is NOT checked here — :func:`generate_auto` pads any batch up to
    the sublane multiple, so dims alone decide fused-path eligibility."""
    return (
        cfg.n_res % 128 == 0
        and cfg.n_dil % 128 == 0
        and cfg.n_skp % 128 == 0
        and cfg.n_post % 128 == 0
        and cfg.n_quant % 128 == 0
        and cfg.filter_sz == 2
    )


def supports_fused(cfg: WaveNetConfig, batch: int) -> bool:
    """Whether (cfg, batch) can run the fused kernel DIRECTLY (no batch
    padding).  ``generate_auto`` serves any batch when
    :func:`supports_fused_dims` holds, by padding to a multiple of 8."""
    return batch % 8 == 0 and supports_fused_dims(cfg)


def _pad_gen_batch(state: GenState, cond, gc_ids, pad: int):
    """Pad batch-leading generation inputs with ``pad`` dummy rows.  Rows
    are independent throughout the AR cell (batch is a pure leading dim in
    every matmul), so dummy rows cannot perturb real rows' outputs."""
    state_p = GenState(
        bufs=tuple(jnp.pad(b, ((0, pad), (0, 0), (0, 0))) for b in state.bufs),
        prev_id=jnp.pad(state.prev_id, (0, pad), constant_values=128),
        t=state.t,
    )
    cond_p = jnp.pad(cond, ((0, pad), (0, 0), (0, 0)))
    gc_p = None if gc_ids is None else jnp.pad(gc_ids, (0, pad))
    return state_p, cond_p, gc_p


def _unpad_gen_batch(ids, state: GenState, batch: int):
    """Drop dummy rows added by :func:`_pad_gen_batch`."""
    return ids[:batch], GenState(
        bufs=tuple(b[:batch] for b in state.bufs),
        prev_id=state.prev_id[:batch],
        t=state.t,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "temperature", "quantized")
)
def _fused_pipeline(params, cfg: WaveNetConfig, state: GenState, cond, rng,
                    gc_ids, temperature: float, quantized: bool):
    """One compiled program: pack weights + flatten buffers + run the fused
    kernel + rebuild the state.  Keeping the conversions inside the jit
    avoids a storm of small host dispatches per call (measured 0.5 s/call
    through the remote-TPU tunnel — 3x the kernel time itself)."""
    from ae_wavenet_tpu.ops import fastgen as fg

    packer = {"int8": pack_for_pallas_int8, "int4": pack_for_pallas_int4,
              None: pack_for_pallas}[_norm_wq(quantized)]
    packed = packer(params, cfg)
    flat = state_to_flat(state, cfg)
    cond_gc = fg._with_gc(params, cfg, cond, gc_ids)
    seed = jax.random.randint(rng, (), 0, 2**31 - 1, dtype=jnp.int32)
    ids, new_flat, last = generate_fused(
        packed, cfg, flat, state.prev_id, state.t, cond_gc, seed,
        temperature=temperature, quantized=quantized,
    )
    t_new = state.t + cond.shape[-1]
    return ids, flat_to_state(new_flat, last, t_new, cfg)


def generate_auto(params, cfg: WaveNetConfig, state: GenState, cond, rng,
                  gc_ids=None, temperature: float = 1.0, dtype=None,
                  quantized=False):
    """Drop-in replacement for fastgen.generate: uses the fused Pallas
    kernel on TPU when the config allows, else the lax.scan path.

    ``quantized``: False (bf16 weights), True/'int8' (int8 weight
    streaming), or 'int4' (nibble-packed weight streaming — halves HBM
    weight traffic again; see Int4GenParams).

    Returns (ids [B, T], new GenState) like fastgen.generate."""
    from ae_wavenet_tpu.ops import fastgen as fg

    batch = cond.shape[0]
    on_tpu = jax.devices()[0].platform == "tpu"
    if not (on_tpu and supports_fused_dims(cfg)):
        if quantized:
            # the scan path has no int8 weight streaming; silently emitting
            # full-precision output would misreport what --int8 produced
            import warnings

            warnings.warn(
                "quantized=True requested but the fused Pallas path is "
                "unavailable (platform="
                f"{jax.devices()[0].platform}, supports_fused_dims="
                f"{supports_fused_dims(cfg)}); falling back to the "
                "full-precision lax.scan sampler",
                stacklevel=2,
            )
        return fg.generate(
            params, cfg, state, cond, rng, gc_ids=gc_ids,
            temperature=temperature,
            dtype=dtype if dtype is not None else jnp.float32,
        )
    pad = (-batch) % 8
    if pad == 0:
        return _fused_pipeline(params, cfg, state, cond, rng, gc_ids,
                               temperature, quantized)
    # kernel needs batch % 8 == 0 (sublane tiling): pad with dummy rows
    # (independent per-row AR — cannot affect real rows), slice back after
    state_p, cond_p, gc_p = _pad_gen_batch(state, cond, gc_ids, pad)
    ids, new_state = _fused_pipeline(params, cfg, state_p, cond_p, rng,
                                     gc_p, temperature, quantized)
    return _unpad_gen_batch(ids, new_state, batch)


def _make_kernel(cfg: WaveNetConfig, t_len: int, batch: int,
                 temperature: float, debug_logits: bool,
                 quantized: bool = False):
    L = len(cfg.dilations)
    n_res, n_dil, n_skp = cfg.n_res, cfg.n_dil, cfg.n_skp
    n_post, n_quant = cfg.n_post, cfg.n_quant
    n_cond = cfg.n_lc_out + cfg.n_global_embed
    xin_pad = _round_up(2 * n_res + n_cond, 128)
    offs, total_slots = flat_buffers(cfg)
    dils = cfg.dilations
    # layers with small dilations keep their ring buffers resident in VMEM
    # (loaded from the flat HBM state at t==0, written back at the last
    # step): removes 2 DMA issues/layer/step for nearly half the layers
    # rings with dilation <= this stay VMEM-resident (no per-step HBM DMA);
    # 16 measured best on v5e (32 exceeds the VMEM budget) — BASELINE.md.
    # A config field (not an env var) so the checkpoint's embedded config
    # fully determines the generation computation.
    VMEM_DIL_MAX = cfg.fastgen_vmem_dil_max
    small = [l for l in range(L) if dils[l] <= VMEM_DIL_MAX]
    loffs = {}
    _acc = 0
    for l in small:
        loffs[l] = _acc
        _acc += dils[l]
    n_small_slots = max(_acc, 1)

    def kernel(*args):
        # unpack: 2 scalar-prefetch + inputs (+2 scale inputs if quantized)
        (t0_ref, seed_ref, w_in_ref, b_in_ref, w_out_ref, b_out_ref) = args[:6]
        i = 6
        if quantized:
            w_in_s_ref, w_out_s_ref = args[6:8]
            i = 8
        (embed_ref, p1w_ref, p1b_ref, p2w_ref, p2b_ref,
         cond_ref, init_id_ref, bufs_hbm) = args[i : i + 8]
        ids_ref, bufs_out, last_id_ref, *rest = args[i + 8 :]
        if debug_logits:
            logits_out = rest[0]
            (win_scr, wout_scr, xprev_scr, xin_scr, xwr_scr, vbufs, prev_scr,
             w_sems, rd_sems, wr_sems) = rest[1:]
        else:
            (win_scr, wout_scr, xprev_scr, xin_scr, xwr_scr, vbufs, prev_scr,
             w_sems, rd_sems, wr_sems) = rest
        t = pl.program_id(0)
        t_abs = t0_ref[0] + t

        def w_dma(l, slot):
            return (
                pltpu.make_async_copy(
                    w_in_ref.at[l], win_scr.at[slot], w_sems.at[slot, 0]
                ),
                pltpu.make_async_copy(
                    w_out_ref.at[l], wout_scr.at[slot], w_sems.at[slot, 1]
                ),
            )

        def rd_dma(l):
            slot = offs[l] + jax.lax.rem(t_abs, dils[l])
            return pltpu.make_async_copy(
                bufs_out.at[slot], xprev_scr.at[l], rd_sems.at[l]
            )

        def wr_dma(l):
            # source is the per-layer staging slot: stable until end-of-step
            # wait, while xin_scr gets clobbered by the next layer
            slot = offs[l] + jax.lax.rem(t_abs, dils[l])
            return pltpu.make_async_copy(
                xwr_scr.at[l], bufs_out.at[slot], wr_sems.at[l]
            )

        # --- step prologue -------------------------------------------------
        @pl.when(t == 0)
        def _():
            if temperature > 0.0:  # prng only exists on real TPU backends
                pltpu.prng_seed(seed_ref[0])
            prev_scr[:] = init_id_ref[:]
            if xin_pad > 2 * n_res + n_cond:
                xin_scr[:, 2 * n_res + n_cond :] = jnp.zeros(
                    (batch, xin_pad - 2 * n_res - n_cond), jnp.bfloat16
                )
            a, b_ = w_dma(0, 0)
            a.start()
            b_.start()
            # load the small-dilation ring buffers into VMEM residence
            for l in small:
                pltpu.make_async_copy(
                    bufs_out.at[pl.ds(offs[l], dils[l])],
                    vbufs.at[pl.ds(loffs[l], dils[l])],
                    rd_sems.at[l],
                ).start()
            for l in small:
                pltpu.make_async_copy(
                    bufs_out.at[pl.ds(offs[l], dils[l])],
                    vbufs.at[pl.ds(loffs[l], dils[l])],
                    rd_sems.at[l],
                ).wait()

        # prefetch the HBM ring-buffer slots for this step (large dilations)
        for l in range(L):
            if l not in small:
                rd_dma(l).start()

        # embedding via one-hot matmul (MXU)
        prev = prev_scr[:]  # [B, 1] int32
        onehot = (
            prev == jax.lax.broadcasted_iota(jnp.int32, (batch, n_quant), 1)
        ).astype(jnp.bfloat16)
        x = jnp.dot(onehot, embed_ref[:], preferred_element_type=jnp.float32)

        cond = cond_ref[0]  # [B, n_cond] bf16

        skip = jnp.zeros((batch, n_skp), jnp.float32)
        for l in range(L):
            # start weight DMA for the next layer
            if l + 1 < L:
                a, b_ = w_dma(l + 1, (l + 1) % 2)
                a.start()
                b_.start()
            # wait weights + x_prev
            w_sems_wait = [
                pltpu.make_async_copy(w_in_ref.at[l], win_scr.at[l % 2],
                                      w_sems.at[l % 2, 0]),
                pltpu.make_async_copy(w_out_ref.at[l], wout_scr.at[l % 2],
                                      w_sems.at[l % 2, 1]),
            ]
            for dma in w_sems_wait:
                dma.wait()

            xb = x.astype(jnp.bfloat16)
            if l in small:
                slot = loffs[l] + jax.lax.rem(t_abs, dils[l])
                xin_scr[:, :n_res] = vbufs[pl.ds(slot, 1)][0]
                vbufs[pl.ds(slot, 1)] = xb[None]  # read-then-write in order
            else:
                rd_dma(l).wait()
                xin_scr[:, :n_res] = xprev_scr[l]
                xwr_scr[l] = xb
                # write x (this layer's input) back into the slot we read
                wr_dma(l).start()
            xin_scr[:, n_res : 2 * n_res] = xb
            xin_scr[:, 2 * n_res : 2 * n_res + n_cond] = cond

            if quantized == "int4":
                # nibble-unpack (one arith shift + one mask, int32 lanes,
                # hidden under the next layer's weight DMA), then contract
                # both row-halves on the MXU in int8; the lo plane's
                # zero-point 8 folds into a row-sum correction
                xin_f = xin_scr[:].astype(jnp.float32)
                sx = jnp.maximum(jnp.max(jnp.abs(xin_f)), 1e-9) * (1.0 / 127.0)
                xq = jnp.clip(jnp.round(xin_f / sx), -127, 127).astype(jnp.int8)
                pk32 = win_scr[l % 2].astype(jnp.int32)
                w_hi = (pk32 >> 4).astype(jnp.int8)
                w_lo = (pk32 & 15).astype(jnp.int8)
                half = xin_pad // 2
                acc = jnp.dot(xq[:, :half], w_hi,
                              preferred_element_type=jnp.int32)
                acc = acc + jnp.dot(xq[:, half:], w_lo,
                                    preferred_element_type=jnp.int32)
                zp = 8 * jnp.sum(xq[:, half:].astype(jnp.int32), axis=1,
                                 keepdims=True)
                y = (acc - zp).astype(jnp.float32) * (sx * w_in_s_ref[l])
                y = y + b_in_ref[l][None, :]
            elif quantized:
                # dynamic per-tile activation quantization; weights carry
                # per-out-channel scales
                xin_f = xin_scr[:].astype(jnp.float32)
                sx = jnp.maximum(jnp.max(jnp.abs(xin_f)), 1e-9) * (1.0 / 127.0)
                xq = jnp.clip(jnp.round(xin_f / sx), -127, 127).astype(jnp.int8)
                acc = jnp.dot(xq, win_scr[l % 2],
                              preferred_element_type=jnp.int32)
                y = acc.astype(jnp.float32) * (sx * w_in_s_ref[l])
                y = y + b_in_ref[l][None, :]
            else:
                y = jnp.dot(
                    xin_scr[:], win_scr[l % 2],
                    preferred_element_type=jnp.float32,
                ) + b_in_ref[l][None, :]
            h = jnp.tanh(y[:, :n_dil]) * jax.nn.sigmoid(y[:, n_dil:])
            if quantized == "int4":
                sh = jnp.maximum(jnp.max(jnp.abs(h)), 1e-9) * (1.0 / 127.0)
                hq = jnp.clip(jnp.round(h / sh), -127, 127).astype(jnp.int8)
                pk32o = wout_scr[l % 2].astype(jnp.int32)
                wo_hi = (pk32o >> 4).astype(jnp.int8)
                wo_lo = (pk32o & 15).astype(jnp.int8)
                halfo = n_dil // 2
                acc2 = jnp.dot(hq[:, :halfo], wo_hi,
                               preferred_element_type=jnp.int32)
                acc2 = acc2 + jnp.dot(hq[:, halfo:], wo_lo,
                                      preferred_element_type=jnp.int32)
                zp2 = 8 * jnp.sum(hq[:, halfo:].astype(jnp.int32), axis=1,
                                  keepdims=True)
                rs = (acc2 - zp2).astype(jnp.float32) * (sh * w_out_s_ref[l])
                rs = rs + b_out_ref[l][None, :]
            elif quantized:
                sh = jnp.maximum(jnp.max(jnp.abs(h)), 1e-9) * (1.0 / 127.0)
                hq = jnp.clip(jnp.round(h / sh), -127, 127).astype(jnp.int8)
                acc2 = jnp.dot(hq, wout_scr[l % 2],
                               preferred_element_type=jnp.int32)
                rs = acc2.astype(jnp.float32) * (sh * w_out_s_ref[l])
                rs = rs + b_out_ref[l][None, :]
            else:
                rs = jnp.dot(
                    h.astype(jnp.bfloat16), wout_scr[l % 2],
                    preferred_element_type=jnp.float32,
                ) + b_out_ref[l][None, :]
            x = x + rs[:, :n_res]
            skip = skip + rs[:, n_res:]

        h = jax.nn.relu(skip).astype(jnp.bfloat16)
        h = jax.nn.relu(
            jnp.dot(h, p1w_ref[:], preferred_element_type=jnp.float32)
            + p1b_ref[:]
        ).astype(jnp.bfloat16)
        logits = (
            jnp.dot(h, p2w_ref[:], preferred_element_type=jnp.float32)
            + p2b_ref[:]
        )
        if debug_logits:
            logits_out[0] = logits

        if temperature > 0.0:
            bits = pltpu.prng_random_bits((batch, n_quant))
            # Mosaic can't cast uint32->f32 directly; >>8 fits in int32
            u = pltpu.bitcast(
                pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32
            ).astype(jnp.float32) * (1.0 / (1 << 24))
            gumbel = -jnp.log(-jnp.log(u + 1e-12) + 1e-12)
            scores = logits * (1.0 / temperature) + gumbel
        else:
            scores = logits
        nxt = jnp.argmax(scores, axis=1).astype(jnp.int32)[:, None]  # [B, 1]
        prev_scr[:] = nxt
        ids_ref[0, 0, :] = nxt[:, 0]
        last_id_ref[:] = nxt

        # start next step's layer-0 weight DMA (slot 0 is free: layer L-2
        # was the last user and its compute is done)
        @pl.when(t + 1 < t_len)
        def _():
            a, b_ = w_dma(0, 0)
            a.start()
            b_.start()

        # write the VMEM-resident buffers back to the flat HBM state on the
        # final step (so chunked generation / flat_to_state keep working)
        @pl.when(t == t_len - 1)
        def _():
            for l in small:
                pltpu.make_async_copy(
                    vbufs.at[pl.ds(loffs[l], dils[l])],
                    bufs_out.at[pl.ds(offs[l], dils[l])],
                    wr_sems.at[l],
                ).start()
            for l in small:
                pltpu.make_async_copy(
                    vbufs.at[pl.ds(loffs[l], dils[l])],
                    bufs_out.at[pl.ds(offs[l], dils[l])],
                    wr_sems.at[l],
                ).wait()

        # make sure this step's buffer writes land before the next step reads
        for l in range(L):
            if l not in small:
                wr_dma(l).wait()

    return kernel, xin_pad, n_small_slots


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "temperature", "debug_logits", "interpret",
                     "quantized"),
)
def generate_fused(
    packed: PallasGenParams,
    cfg: WaveNetConfig,
    flat_bufs: jax.Array,   # [sum_d, B, n_res] bf16 (state_to_flat)
    prev_id: jax.Array,     # [B] int32
    t0: jax.Array,          # scalar int32 — buffer phase
    cond: jax.Array,        # [B, n_cond, T] f32/bf16 (gc already appended)
    seed: jax.Array,        # scalar int32
    temperature: float = 1.0,
    debug_logits: bool = False,
    interpret: bool = False,
    quantized: bool = False,
):
    """-> (ids [B, T], new_flat_bufs, last_id [B], logits?).

    The fused equivalent of fastgen.generate's scan; cond must already
    contain the global-conditioning rows (fastgen._with_gc).
    """
    batch, n_cond, t_len = cond.shape
    L = len(cfg.dilations)
    quantized = _norm_wq(quantized)
    kernel, xin_pad, n_small_slots = _make_kernel(
        cfg, t_len, batch, temperature, debug_logits, quantized
    )
    cond_tm = jnp.transpose(cond, (2, 0, 1)).astype(jnp.bfloat16)

    out_shape = [
        jax.ShapeDtypeStruct((t_len, 1, batch), jnp.int32),    # ids
        jax.ShapeDtypeStruct(flat_bufs.shape, jnp.bfloat16),   # bufs out
        jax.ShapeDtypeStruct((batch, 1), jnp.int32),           # last id
    ]
    out_specs = [
        pl.BlockSpec((1, 1, batch), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if debug_logits:
        out_shape.append(
            jax.ShapeDtypeStruct((t_len, batch, cfg.n_quant), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, batch, cfg.n_quant), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM)
        )

    w_dtype = jnp.int8 if quantized else jnp.bfloat16
    # int4 streams nibble-packed bytes: the scratch rows halve
    w_rows_in = xin_pad // 2 if quantized == "int4" else xin_pad
    w_rows_out = cfg.n_dil // 2 if quantized == "int4" else cfg.n_dil
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # w_in (HBM, manual DMA)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # b_in
        pl.BlockSpec(memory_space=pl.ANY),   # w_out
        pl.BlockSpec(memory_space=pltpu.VMEM),  # b_out
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_in scales
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_out scales
        ]
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # embed
        pl.BlockSpec(memory_space=pltpu.VMEM),  # post1_w
        pl.BlockSpec(memory_space=pltpu.VMEM),  # post1_b
        pl.BlockSpec(memory_space=pltpu.VMEM),  # post2_w
        pl.BlockSpec(memory_space=pltpu.VMEM),  # post2_b
        pl.BlockSpec((1, batch, n_cond), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),  # cond column
        pl.BlockSpec(memory_space=pltpu.VMEM),  # init ids [B,1]
        pl.BlockSpec(memory_space=pl.ANY),   # bufs (HBM)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_len,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, w_rows_in, 2 * cfg.n_dil), w_dtype),      # w_in dbl
            pltpu.VMEM((2, w_rows_out, cfg.n_res + cfg.n_skp), w_dtype),
            pltpu.VMEM((L, batch, cfg.n_res), jnp.bfloat16),         # x_prev
            pltpu.VMEM((batch, xin_pad), jnp.bfloat16),              # xin
            pltpu.VMEM((L, batch, cfg.n_res), jnp.bfloat16),         # x write
            pltpu.VMEM((n_small_slots, batch, cfg.n_res), jnp.bfloat16),
            pltpu.VMEM((batch, 1), jnp.int32),                       # prev id
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((L,)),
            pltpu.SemaphoreType.DMA((L,)),
        ],
    )

    if quantized == "int4":
        weight_args = (packed.w_in_p, packed.b_in, packed.w_out_p,
                       packed.b_out, packed.w_in_s, packed.w_out_s)
    elif quantized:
        weight_args = (packed.w_in_q, packed.b_in, packed.w_out_q,
                       packed.b_out, packed.w_in_s, packed.w_out_s)
    else:
        weight_args = (packed.w_in, packed.b_in, packed.w_out, packed.b_out)
    bufs_input_index = 2 + len(weight_args) + 7  # scalars + weights + rest
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={bufs_input_index: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        t0.reshape(1), seed.reshape(1),
        *weight_args, packed.embed,
        packed.post1_w, packed.post1_b, packed.post2_w, packed.post2_b,
        cond_tm, prev_id.reshape(batch, 1).astype(jnp.int32), flat_bufs,
    )
    ids = jnp.transpose(outs[0][:, 0, :], (1, 0))
    if debug_logits:
        return ids, outs[1], outs[2][:, 0], outs[3]
    return ids, outs[1], outs[2][:, 0]

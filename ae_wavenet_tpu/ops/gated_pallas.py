"""Pallas fused gated-residual-conv block for TRAINING-shape forward passes.

SURVEY.md §2.0 row 1 / §7 step 10: the reference's dilated causal conv stack
(``wavenet.py`` [H], torch Conv1d -> cuDNN/XLA) should map to a fused Pallas
kernel where that beats XLA.  The XLA formulation (models/wavenet.py:apply)
materializes per layer: the gate input y [B, 2*n_dil, T], h [B, n_dil, T],
the residual stream twice, and a float32 skip read-modify-write — the step is
HBM-bound on exactly these intermediates (BASELINE.md).  This kernel fuses
ONE WHOLE LAYER per invocation:

    y   = [x_prev | x_cur | cond] @ W_in + b_in       (one MXU GEMM)
    h   = tanh(y[:, :n_dil]) * sigmoid(y[:, n_dil:])   (VPU, in VMEM)
    out = h @ [W_res | W_skip] + b_out                 (one MXU GEMM)
    x'  = x_cur + out[:, :n_res]                       -> HBM (bf16)
    skip += out[:, n_res:]                             -> HBM RMW (f32)

so y and h never touch HBM, x is read once (halo-shared for both taps), and
the only f32 traffic is the skip accumulator.

Layout: time-major [B, T, C] (channels on the 128-lane axis; C multiples of
128 enforced by :func:`supports_pallas_stack`).  cond is pre-padded to a
128-multiple channel count and pre-offset by the layer's cumulative left trim.

Tiling: grid (B, NT) with RIGHT-ALIGNED time tiles — every layer's output
lattice and the skip buffer share the right edge, so the skip row for output
row j is always ``j + (len(skip_buf) - Ty)`` >= 0 (no negative-index edge).
Only tile t=1 overlaps tile t=0's ragged head; its skip contribution is
masked there (x' double-writes are bitwise idempotent).  Tile t+1's reads are
prefetched during tile t's compute (double-buffered scratch).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ae_wavenet_tpu.utils.config import WaveNetConfig


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supports_pallas_stack(cfg: WaveNetConfig, t_in: int,
                          tile: int = 1024) -> bool:
    rf = (cfg.filter_sz - 1) * sum(cfg.dilations)
    ty_last = t_in - rf
    return (
        cfg.filter_sz == 2
        and cfg.n_res % 128 == 0
        and cfg.n_dil % 128 == 0
        and cfg.n_skp % 128 == 0
        and ty_last >= tile
    )


def pack_stack_weights(params: dict, cfg: WaveNetConfig):
    """Per-layer packed (w_in [XIN, 2*n_dil] bf16, b_in [1, 2*n_dil] f32,
    w_out [n_dil, n_res+n_skp] bf16, b_out [1, ...] f32) with the cond rows
    zero-padded to a 128-multiple."""
    n_cond = cfg.n_lc_out + cfg.n_global_embed
    n_cond_pad = _round_up(n_cond, 128)
    packed = []
    for p in params["layers"]:
        w_cond = jnp.pad(p["w_cond"]["w"], ((0, 0), (0, n_cond_pad - n_cond)))
        w_in = jnp.concatenate(
            [p["w_prev"]["w"], p["w_cur"]["w"], w_cond], axis=1
        ).T  # [2*n_res + n_cond_pad, 2*n_dil]
        b_in = (p["w_prev"]["b"] + p["w_cur"]["b"] + p["w_cond"]["b"])[None, :]
        w_out = jnp.concatenate([p["w_res"]["w"], p["w_skip"]["w"]], axis=0).T
        b_out = jnp.concatenate([p["w_res"]["b"], p["w_skip"]["b"]])[None, :]
        packed.append((
            w_in.astype(jnp.bfloat16), b_in.astype(jnp.float32),
            w_out.astype(jnp.bfloat16), b_out.astype(jnp.float32),
        ))
    return packed


def _layer_kernel(*, tt: int, dd: int, ty: int, nt: int, n_res: int,
                  n_dil: int, n_skp: int, n_cond_pad: int, c_off: int,
                  d_skip: int):
    """Build the kernel body for one layer's static geometry.

    ty: output rows; nt: time tiles; c_off: cond left offset; d_skip: row
    offset of this layer's lattice inside the skip buffer."""
    xin_w = 2 * n_res + n_cond_pad
    ragged = nt * tt - ty  # head overlap of tile 0 into tile 1 (0 if tt | ty)

    def t0_of(t):
        # right-aligned tiles: only tile 0 is clamped/ragged
        return jnp.maximum(0, ty - (nt - t) * tt)

    def kernel(x_hbm, cond_hbm, w_in, b_in, w_out, b_out,
               x_new_hbm, skip_hbm,
               x_scr, cond_scr, skip_scr, xin_scr, xnew_scr, skip_out_scr,
               rd_sems, wr_sems):
        b = pl.program_id(0)
        t = pl.program_id(1)
        t0 = t0_of(t)

        def reads(bb, tile_t, slot):
            tt0 = t0_of(tile_t)
            return (
                pltpu.make_async_copy(
                    x_hbm.at[bb, pl.ds(tt0, tt + dd), :],
                    x_scr.at[slot], rd_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    cond_hbm.at[bb, pl.ds(c_off + tt0, tt), :],
                    cond_scr.at[slot], rd_sems.at[slot, 1]),
                pltpu.make_async_copy(
                    skip_hbm.at[bb, pl.ds(d_skip + tt0, tt), :],
                    skip_scr.at[slot], rd_sems.at[slot, 2]),
            )

        # tile 0 of each batch row issues its own reads (no predecessor)
        @pl.when(t == 0)
        def _():
            for dma in reads(b, 0, 0):
                dma.start()

        # tile 1's skip range overlaps tile 0's write -> read it here, after
        # tile 0's body (and its write-waits) have completed
        @pl.when((t == 1) & (ragged > 0))
        def _():
            reads(b, 1, 1 % 2)[2].start()

        # prefetch the next tile's reads; they overlap this tile's compute.
        # (next tile's skip read overlaps this tile's not-yet-written skip
        # range only in the t==0/t==1 ragged case, excluded above.)
        @pl.when(t + 1 < nt)
        def _():
            nxt = reads(b, t + 1, (t + 1) % 2)
            nxt[0].start()
            nxt[1].start()
            @pl.when((t + 1 != 1) | (ragged == 0))
            def _():
                nxt[2].start()

        slot = jax.lax.rem(t, 2)
        for dma in reads(b, t, slot):
            dma.wait()

        # pack [prev | cur | cond] -> one GEMM input tile
        xin_scr[:, :n_res] = x_scr[slot, :tt, :]
        xin_scr[:, n_res : 2 * n_res] = x_scr[slot, dd : dd + tt, :]
        xin_scr[:, 2 * n_res :] = cond_scr[slot]

        y = jnp.dot(xin_scr[:], w_in[:], preferred_element_type=jnp.float32)
        y = y + b_in[:]
        h = (jnp.tanh(y[:, :n_dil]) * jax.nn.sigmoid(y[:, n_dil:])
             ).astype(jnp.bfloat16)
        out = jnp.dot(h, w_out[:], preferred_element_type=jnp.float32)
        out = out + b_out[:]

        xnew_scr[:] = (x_scr[slot, dd : dd + tt, :]
                       + out[:, :n_res].astype(jnp.bfloat16))
        contrib = out[:, n_res:]
        if ragged > 0:
            # tile 1 re-computes tile 0's head rows; zero their skip add
            rows = jax.lax.broadcasted_iota(jnp.int32, (tt, n_skp), 0)
            contrib = jnp.where((t != 1) | (rows >= ragged), contrib, 0.0)
        skip_out_scr[:] = skip_scr[slot] + contrib

        wr_x = pltpu.make_async_copy(
            xnew_scr, x_new_hbm.at[b, pl.ds(t0, tt), :], wr_sems.at[0])
        wr_s = pltpu.make_async_copy(
            skip_out_scr, skip_hbm.at[b, pl.ds(d_skip + t0, tt), :],
            wr_sems.at[1])
        wr_x.start()
        wr_s.start()
        # writes must land before the next body reads overlapping ranges
        # (idempotent x' double-writes + the t==1 skip head case)
        wr_x.wait()
        wr_s.wait()

    return kernel, xin_w


def gated_layer_fused(x, cond, skip, w_in, b_in, w_out, b_out, *, dd: int,
                      c_off: int, d_skip: int, tile: int = 1024,
                      interpret: bool = False):
    """One fused gated layer.  x [B, Tx, n_res] bf16, cond [B, Tc, ncp] bf16,
    skip [B, Ts, n_skp] f32 (accumulated in place via aliasing).
    Returns (x_new [B, Tx-dd, n_res] bf16, skip)."""
    bsz, tx, n_res = x.shape
    ty = tx - dd
    n_cond_pad = cond.shape[-1]
    two_dil = w_in.shape[-1]
    n_dil = two_dil // 2
    n_skp = skip.shape[-1]
    tt = min(tile, ty)
    nt = pl.cdiv(ty, tt)
    kernel, xin_w = _layer_kernel(
        tt=tt, dd=dd, ty=ty, nt=nt, n_res=n_res, n_dil=n_dil, n_skp=n_skp,
        n_cond_pad=n_cond_pad, c_off=c_off, d_skip=d_skip,
    )
    x_new, skip_new = pl.pallas_call(
        kernel,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x (manual DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),   # cond (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_in
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_in
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_out
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_out
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x_new
            pl.BlockSpec(memory_space=pltpu.ANY),   # skip (aliased)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, ty, n_res), jnp.bfloat16),
            jax.ShapeDtypeStruct(skip.shape, jnp.float32),
        ],
        input_output_aliases={2: 1},  # skip input -> skip output
        scratch_shapes=[
            pltpu.VMEM((2, tt + dd, n_res), jnp.bfloat16),   # x tiles
            pltpu.VMEM((2, tt, n_cond_pad), jnp.bfloat16),   # cond tiles
            pltpu.VMEM((2, tt, n_skp), jnp.float32),         # skip tiles
            pltpu.VMEM((tt, xin_w), jnp.bfloat16),           # packed GEMM in
            pltpu.VMEM((tt, n_res), jnp.bfloat16),           # x' staging
            pltpu.VMEM((tt, n_skp), jnp.float32),            # skip staging
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x, cond, skip, w_in, b_in, w_out, b_out)
    return x_new, skip_new


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret"))
def stack_apply(params: dict, cfg: WaveNetConfig, x_ids: jax.Array,
                cond: jax.Array, gc_ids: jax.Array | None = None, *,
                tile: int = 1024, interpret: bool = False) -> jax.Array:
    """Drop-in forward of models/wavenet.apply built on the fused layers.

    x_ids [B, T_in] int32, cond [B, n_lc_out, T_in] -> logits
    [B, n_quant, T_in - rf] (same contract as wavenet.apply)."""
    rf = (cfg.filter_sz - 1) * sum(cfg.dilations)
    t_in = x_ids.shape[-1]
    t_out = t_in - rf
    bsz = x_ids.shape[0]
    n_cond = cfg.n_lc_out + cfg.n_global_embed
    n_cond_pad = _round_up(n_cond, 128)

    # embedding straight into time-major layout (no [B,C,T] transpose)
    x = jnp.take(params["embed"], x_ids, axis=0).astype(jnp.bfloat16)

    if gc_ids is not None:
        g = jnp.take(params["gc_embed"], gc_ids, axis=0)
        g = jnp.broadcast_to(g[:, None, :], (bsz, t_in, g.shape[-1]))
    else:
        g = jnp.zeros((bsz, t_in, cfg.n_global_embed), cond.dtype)
    cond_tm = jnp.concatenate(
        [jnp.transpose(cond, (0, 2, 1)), g.astype(cond.dtype)], axis=-1
    )
    cond_tm = jnp.pad(cond_tm, ((0, 0), (0, 0), (0, n_cond_pad - n_cond)))
    cond_tm = cond_tm.astype(jnp.bfloat16)

    dils = [d * (cfg.filter_sz - 1) for d in cfg.dilations]
    ty1 = t_in - dils[0]
    skip = jnp.zeros((bsz, ty1, cfg.n_skp), jnp.float32)
    packed = pack_stack_weights(params, cfg)
    c_off = 0
    for i, dd in enumerate(dils):
        c_off += dd
        w_in, b_in, w_out, b_out = packed[i]
        d_skip = c_off - dils[0]
        x, skip = gated_layer_fused(
            x, cond_tm, skip, w_in, b_in, w_out, b_out,
            dd=dd, c_off=c_off, d_skip=d_skip, tile=tile,
            interpret=interpret,
        )

    skip_out = skip[:, ty1 - t_out :, :]
    h = jax.nn.relu(skip_out)
    dtype = jnp.bfloat16

    def mm(p, v):
        return (jnp.einsum("oc,btc->bto", p["w"].astype(dtype),
                           v.astype(dtype), preferred_element_type=dtype)
                + p["b"][None, None, :].astype(dtype))

    h = jax.nn.relu(mm(params["post1"], h))
    logits = mm(params["post2"], h)
    return jnp.transpose(logits, (0, 2, 1))

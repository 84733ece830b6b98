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
    skip += out[:, n_res:]                             -> HBM (f32)

so y and h never touch HBM, x is read once (halo-shared by both taps), and
the only f32 traffic is the skip accumulator.

Frame layout (the key trick)
----------------------------
All per-layer lattices are RIGHT-ALIGNED in one fixed frame of P =
round_up(t_in, tile) rows: layer i's valid rows occupy frame positions
[P - Ty_i, P).  In frame coordinates the causal taps become

    out[g] = x[g] + res(h[g]),   h[g] = gate(W_p x[g - dd] + W_c x[g] + ...)

i.e. ``cur``, ``cond``, ``skip`` and the output all live at the SAME frame
position g — so they can be plain BlockSpec-pipelined operands on identical
tile-aligned blocks, every layer and every tile.  Only x needs a manual
halo'd DMA ([g - dd, g + tile)), double-buffered across tiles.  Rows left of
the valid region hold zeros/garbage that never mixes into valid rows (all
ops are row-local) and is sliced off after the last layer.

Layout: time-major [B, T, C] (channels on the 128-lane axis; C multiples of
128 enforced by :func:`supports_pallas_stack`).  cond is pre-padded to a
128-multiple channel count, pre-offset by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ae_wavenet_tpu.utils.config import WaveNetConfig


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supports_pallas_stack(cfg: WaveNetConfig, t_in: int,
                          tile: int | None = None) -> bool:
    """True when the fused stack can run this config at ``t_in``.

    ``tile`` defaults to the ACTUAL tile the stack will use
    (``cfg.gated_tile``) so this guard can never disagree with
    :func:`stack_apply`'s grid construction."""
    tile = cfg.gated_tile if tile is None else tile
    rf = (cfg.filter_sz - 1) * sum(cfg.dilations)
    ty_last = t_in - rf
    bwd = cfg.gated_bwd_tile or tile
    return (
        cfg.filter_sz == 2
        and cfg.n_res % 128 == 0
        and cfg.n_dil % 128 == 0
        and cfg.n_skp % 128 == 0
        and ty_last >= tile
        and tile % bwd == 0
        and max(cfg.dilations) * (cfg.filter_sz - 1) <= 512
    )


def pack_stack_weights(params: dict, cfg: WaveNetConfig):
    """Per-layer packed (w_in [XIN, 2*n_dil] f32, b_in [1, 2*n_dil] f32,
    w_out [n_dil, n_res+n_skp] f32, b_out [1, ...] f32) with the cond rows
    zero-padded to a 128-multiple.

    Weights stay FLOAT32 here: the bf16 cast for the MXU happens inside the
    kernel wrappers, BELOW the custom_vjp boundary, so the backward returns
    f32 weight cotangents to the optimizer (matching the XLA path's grad
    precision) instead of quantizing dw through bf16."""
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
            w_in.astype(jnp.float32), b_in.astype(jnp.float32),
            w_out.astype(jnp.float32), b_out.astype(jnp.float32),
        ))
    return packed


def gated_layer_fused(x, cond, skip, w_in, b_in, w_out, b_out, *, dd: int,
                      t_min: int, tile: int, interpret: bool = False,
                      save_y: bool = False):
    """One fused gated layer on frame-aligned buffers.

    x    [B, LPAD + P, n_res] bf16 — residual stream, valid right-aligned
    cond [B, P, ncp] bf16, skip [B, P, n_skp] f32 — frame-aligned
    t_min: first tile (in frame tiles) overlapping this layer's valid rows.
    Returns (x_new [B, LPAD + P, n_res], skip') — skip accumulated via alias.
    With save_y, also returns y [B, P, 2*n_dil] bf16 (the gate
    pre-activations) so the backward can skip the xin @ w_in recompute GEMM
    — 28% of the backward FLOPs traded for one bf16 stream of HBM traffic
    (head-to-head in BASELINE.md).
    """
    w_in = w_in.astype(jnp.bfloat16)      # MXU operands; grads stay f32
    w_out = w_out.astype(jnp.bfloat16)    # (cast is below the custom_vjp)
    bsz, lp, n_res = x.shape
    p_len = cond.shape[1]
    lpad = lp - p_len
    n_dil = w_in.shape[-1] // 2
    n_skp = skip.shape[-1]
    n_cond_pad = cond.shape[-1]
    tt = tile
    nt = p_len // tt - t_min
    dd_pad = _round_up(dd, 16)
    lpad_blk = lpad // tt
    assert lpad % tt == 0 and p_len % tt == 0 and dd_pad <= lpad

    def kernel(x_hbm, cond_ref, skip_ref, w_in_ref, b_in_ref, w_out_ref,
               b_out_ref, x_new_ref, skip_out_ref, *rest):
        if save_y:
            y_out_ref, x_scr, xin_scr, rd_sems = rest
        else:
            x_scr, xin_scr, rd_sems = rest
        b = pl.program_id(0)
        t = pl.program_id(1)

        def rd_x(bb, tile_t, slot):
            # frame rows [t0 - dd_pad, t0 + tt) -> buffer rows shifted by lpad
            start = lpad - dd_pad + (t_min + tile_t) * tt
            return pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(start, tt + dd_pad), :],
                x_scr.at[slot], rd_sems.at[slot])

        @pl.when(t == 0)
        def _():
            rd_x(b, 0, 0).start()

        @pl.when(t + 1 < nt)
        def _():
            rd_x(b, t + 1, (t + 1) % 2).start()

        slot = jax.lax.rem(t, 2)
        rd_x(b, t, slot).wait()

        xin_scr[:, :n_res] = x_scr[slot, dd_pad - dd : dd_pad - dd + tt, :]
        xin_scr[:, n_res : 2 * n_res] = x_scr[slot, dd_pad:, :]
        xin_scr[:, 2 * n_res :] = cond_ref[0]

        y = jnp.dot(xin_scr[:], w_in_ref[:],
                    preferred_element_type=jnp.float32) + b_in_ref[:]
        if save_y:
            y_out_ref[0] = y.astype(jnp.bfloat16)
        h = (jnp.tanh(y[:, :n_dil]) * jax.nn.sigmoid(y[:, n_dil:])
             ).astype(jnp.bfloat16)
        out = jnp.dot(h, w_out_ref[:],
                      preferred_element_type=jnp.float32) + b_out_ref[:]

        x_new_ref[0] = x_scr[slot, dd_pad:, :] + out[:, :n_res].astype(
            jnp.bfloat16)
        skip_out_ref[0] = skip_ref[0] + out[:, n_res:]

    grid = (bsz, nt)

    def spec(c, off=0, space=pltpu.VMEM):
        return pl.BlockSpec((1, tt, c), lambda b, t, _o=off: (b, _o + t_min + t, 0),
                            memory_space=space)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # x (manual halo DMA)
            spec(n_cond_pad),                            # cond tile
            spec(n_skp),                                 # skip tile (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # w_in
            pl.BlockSpec(memory_space=pltpu.VMEM),       # b_in
            pl.BlockSpec(memory_space=pltpu.VMEM),       # w_out
            pl.BlockSpec(memory_space=pltpu.VMEM),       # b_out
        ],
        out_specs=[
            spec(n_res, off=lpad_blk),                   # x_new tile
            spec(n_skp),                                 # skip out tile
        ] + ([spec(2 * n_dil)] if save_y else []),       # y tile
        out_shape=[
            jax.ShapeDtypeStruct((bsz, lp, n_res), jnp.bfloat16),
            jax.ShapeDtypeStruct(skip.shape, jnp.float32),
        ] + ([jax.ShapeDtypeStruct((bsz, p_len, 2 * n_dil), jnp.bfloat16)]
             if save_y else []),
        input_output_aliases={2: 1},                     # skip in -> skip out
        scratch_shapes=[
            pltpu.VMEM((2, tt + dd_pad, n_res), jnp.bfloat16),
            pltpu.VMEM((tt, 2 * n_res + n_cond_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(x, cond, skip, w_in, b_in, w_out, b_out)
    return tuple(outs)


def gated_pair_fused(x, cond, skip, pk1, pk2, *, dd1: int, dd2: int,
                     t_min: int, tile: int, interpret: bool = False,
                     save_y: bool = False):
    """TWO consecutive fused gated layers in ONE kernel.

    The inter-layer residual stream (layer 1's output, "mid") stays in VMEM
    for the tile: layer 2's cur tap uses it directly and its prev tap
    (mid[g - dd2]) comes from a PERSISTENT tail scratch carried across grid
    steps — the pallas grid iterates the tile axis sequentially per batch
    row, so tile t-1's last dd2 mid rows are exactly what tile t needs.
    Versus two single-layer calls this removes one residual-stream HBM read
    and one f32 skip read+write per pair (the pair accumulates skip once).
    mid is still WRITTEN to HBM: the backward needs it as layer 2's saved
    input (same residual schedule as the unfused path).

    Requires dd2 < tile (tail fits one tile back).  pk1/pk2 =
    (w_in, b_in, w_out, b_out) packed as in :func:`pack_stack_weights`.
    t_min: layer 1's first tile (the lower of the two) — layer-2 rows below
    its own lattice compute garbage that never mixes into valid rows (same
    right-aligned frame argument as the module docstring).
    Returns (mid, x_new, skip') + ((y1, y2) if save_y).
    """
    w_in1, b_in1, w_out1, b_out1 = pk1
    w_in2, b_in2, w_out2, b_out2 = pk2
    w_in1, w_out1 = w_in1.astype(jnp.bfloat16), w_out1.astype(jnp.bfloat16)
    w_in2, w_out2 = w_in2.astype(jnp.bfloat16), w_out2.astype(jnp.bfloat16)
    bsz, lp, n_res = x.shape
    p_len = cond.shape[1]
    lpad = lp - p_len
    n_dil = w_in1.shape[-1] // 2
    n_skp = skip.shape[-1]
    n_cond_pad = cond.shape[-1]
    tt = tile
    nt = p_len // tt - t_min
    dd1_pad = _round_up(dd1, 16)
    lpad_blk = lpad // tt
    assert lpad % tt == 0 and p_len % tt == 0 and dd1_pad <= lpad
    assert 0 < dd2 < tt

    def kernel(x_hbm, cond_ref, skip_ref, wi1, bi1, wo1, bo1, wi2, bi2,
               wo2, bo2, mid_ref, x_new_ref, skip_out_ref, *rest):
        if save_y:
            y1_ref, y2_ref, x_scr, xin_scr, tail_scr, rd_sems = rest
        else:
            x_scr, xin_scr, tail_scr, rd_sems = rest
        b = pl.program_id(0)
        t = pl.program_id(1)

        def rd_x(bb, tile_t, slot):
            start = lpad - dd1_pad + (t_min + tile_t) * tt
            return pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(start, tt + dd1_pad), :],
                x_scr.at[slot], rd_sems.at[slot])

        @pl.when(t == 0)
        def _():
            rd_x(b, 0, 0).start()

        @pl.when(t + 1 < nt)
        def _():
            rd_x(b, t + 1, (t + 1) % 2).start()

        slot = jax.lax.rem(t, 2)
        rd_x(b, t, slot).wait()

        # ---- layer 1 on rows [g, g+tt)
        xin_scr[:, :n_res] = x_scr[slot, dd1_pad - dd1 : dd1_pad - dd1 + tt, :]
        xin_scr[:, n_res : 2 * n_res] = x_scr[slot, dd1_pad:, :]
        xin_scr[:, 2 * n_res :] = cond_ref[0]
        y1 = jnp.dot(xin_scr[:], wi1[:],
                     preferred_element_type=jnp.float32) + bi1[:]
        if save_y:
            y1_ref[0] = y1.astype(jnp.bfloat16)
        h1 = (jnp.tanh(y1[:, :n_dil]) * jax.nn.sigmoid(y1[:, n_dil:])
              ).astype(jnp.bfloat16)
        out1 = jnp.dot(h1, wo1[:],
                       preferred_element_type=jnp.float32) + bo1[:]
        mid = x_scr[slot, dd1_pad:, :] + out1[:, :n_res].astype(jnp.bfloat16)
        mid_ref[0] = mid
        skip_acc = skip_ref[0] + out1[:, n_res:]

        # ---- layer 2 on the same rows; prev tap from the persistent tail
        # (tile t-1's mid rows [g-dd2, g); garbage on the first tile of each
        # batch row, which only feeds rows below layer 2's lattice)
        xin_scr[:dd2, :n_res] = tail_scr[:]
        xin_scr[dd2:, :n_res] = mid[: tt - dd2]
        tail_scr[:] = mid[tt - dd2 :]
        xin_scr[:, n_res : 2 * n_res] = mid
        y2 = jnp.dot(xin_scr[:], wi2[:],
                     preferred_element_type=jnp.float32) + bi2[:]
        if save_y:
            y2_ref[0] = y2.astype(jnp.bfloat16)
        h2 = (jnp.tanh(y2[:, :n_dil]) * jax.nn.sigmoid(y2[:, n_dil:])
              ).astype(jnp.bfloat16)
        out2 = jnp.dot(h2, wo2[:],
                       preferred_element_type=jnp.float32) + bo2[:]
        x_new_ref[0] = mid + out2[:, :n_res].astype(jnp.bfloat16)
        skip_out_ref[0] = skip_acc + out2[:, n_res:]

    def spec(c, off=0):
        return pl.BlockSpec((1, tt, c),
                            lambda b, t, _o=off: (b, _o + t_min + t, 0),
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(bsz, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),  # x (manual halo)
                  spec(n_cond_pad), spec(n_skp)] + [wspec] * 8,
        out_specs=[
            spec(n_res, off=lpad_blk),                   # mid tile
            spec(n_res, off=lpad_blk),                   # x_new tile
            spec(n_skp),                                 # skip out tile
        ] + ([spec(2 * n_dil)] * 2 if save_y else []),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, lp, n_res), jnp.bfloat16),
            jax.ShapeDtypeStruct((bsz, lp, n_res), jnp.bfloat16),
            jax.ShapeDtypeStruct(skip.shape, jnp.float32),
        ] + ([jax.ShapeDtypeStruct((bsz, p_len, 2 * n_dil), jnp.bfloat16)] * 2
             if save_y else []),
        input_output_aliases={2: 2},                     # skip in -> skip out
        scratch_shapes=[
            pltpu.VMEM((2, tt + dd1_pad, n_res), jnp.bfloat16),
            pltpu.VMEM((tt, 2 * n_res + n_cond_pad), jnp.bfloat16),
            pltpu.VMEM((dd2, n_res), jnp.bfloat16),      # persistent tail
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=96 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, cond, skip, w_in1, b_in1, w_out1, b_out1,
      w_in2, b_in2, w_out2, b_out2)
    return tuple(outs)


def gated_stack_fused(x, cond, skip, packed, *, dils, t_min: int, tile: int,
                      interpret: bool = False, save_y: bool = False,
                      save_mids: bool = True):
    """The WHOLE dilated stack in ONE kernel: every inter-layer residual
    stream stays in VMEM.

    Full-stack generalization of :func:`gated_pair_fused`: per grid step
    (one batch row x one time tile) the kernel runs all L gated layers
    back-to-back on the tile.  Layer l's prev tap (``x_l[g - dd_l]``) comes
    from a PERSISTENT per-layer tail scratch carried across the
    sequentially-iterated tile axis — tile t-1's last ``dd_l`` rows of
    layer l's input are exactly what tile t needs.  Versus the pair
    schedule this removes L/2-1 residual-stream HBM halo reads, L/2-1
    float32 skip read+write round trips (skip accumulates ONCE in VMEM),
    and L/2-1 cond tile reads; the only remaining HBM traffic is x0 in,
    cond in, skip once, and the backward's saved streams out (mids + y),
    written via manually-pipelined DMA from staging scratch.

    Requires every ``dils[1:]`` < tile (tails fit one tile back).  The
    saved mids/y layouts are IDENTICAL to the pair path's, so the existing
    pair/single backward kernels consume them unchanged.

    Returns (skip', mids tuple [L-1], ys tuple [L if save_y else 0]).
    """
    L = len(dils)
    assert L >= 2 and all(0 < d < tile for d in dils[1:])
    bsz, lp, n_res = x.shape
    p_len = cond.shape[1]
    lpad = lp - p_len
    n_skp = skip.shape[-1]
    n_cond_pad = cond.shape[-1]
    n_dil = packed[0][0].shape[-1] // 2
    tt = tile
    nt = p_len // tt - t_min
    dd0 = dils[0]
    dd0_pad = _round_up(dd0, 16)
    lpad_blk = lpad // tt
    assert lpad % tt == 0 and p_len % tt == 0 and dd0_pad <= lpad

    w_in_all = jnp.stack([p[0] for p in packed]).astype(jnp.bfloat16)
    b_in_all = jnp.stack([p[1] for p in packed]).astype(jnp.float32)
    w_out_all = jnp.stack([p[2] for p in packed]).astype(jnp.bfloat16)
    b_out_all = jnp.stack([p[3] for p in packed]).astype(jnp.float32)

    tail_offs, acc = [], 0
    for d in dils[1:]:
        tail_offs.append(acc)
        acc += d
    n_tail = max(acc, 1)
    n_mids = L - 1 if save_mids else 0
    n_ys = L if (save_y and save_mids) else 0

    def kernel(x_hbm, cond_ref, skip_ref, wi_ref, bi_ref, wo_ref, bo_ref,
               *rest):
        skip_out_ref = rest[0]
        mid_refs = rest[1 : 1 + n_mids]
        y_refs = rest[1 + n_mids : 1 + n_mids + n_ys]
        scr = rest[1 + n_mids + n_ys :]
        if n_ys:
            (x_scr, xin_scr, tails_scr, mid_stage, y_stage, rd_sems,
             mid_sems, y_sems) = scr
        elif n_mids:
            x_scr, xin_scr, tails_scr, mid_stage, rd_sems, mid_sems = scr
        else:
            x_scr, xin_scr, tails_scr, rd_sems = scr
        b = pl.program_id(0)
        t = pl.program_id(1)

        def rd_x(bb, tile_t, slot):
            start = lpad - dd0_pad + (t_min + tile_t) * tt
            return pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(start, tt + dd0_pad), :],
                x_scr.at[slot], rd_sems.at[slot])

        def wr_mid(l, bb, tile_t):
            start = lpad + (t_min + tile_t) * tt
            return pltpu.make_async_copy(
                mid_stage.at[l], mid_refs[l].at[bb, pl.ds(start, tt), :],
                mid_sems.at[l])

        def wr_y(l, bb, tile_t):
            start = (t_min + tile_t) * tt
            return pltpu.make_async_copy(
                y_stage.at[l], y_refs[l].at[bb, pl.ds(start, tt), :],
                y_sems.at[l])

        @pl.when(t == 0)
        def _():
            rd_x(b, 0, 0).start()

        @pl.when(t + 1 < nt)
        def _():
            rd_x(b, t + 1, (t + 1) % 2).start()

        slot = jax.lax.rem(t, 2)
        rd_x(b, t, slot).wait()

        skip_acc = skip_ref[0]
        xin_scr[:, 2 * n_res :] = cond_ref[0]
        x_stream = None  # layer input for l >= 1 (VMEM value)
        for l in range(L):
            if l == 0:
                xin_scr[:, :n_res] = x_scr[slot, dd0_pad - dd0
                                           : dd0_pad - dd0 + tt, :]
                cur = x_scr[slot, dd0_pad:, :]
                xin_scr[:, n_res : 2 * n_res] = cur
            else:
                dd = dils[l]
                off = tail_offs[l - 1]
                # prev tap: tile t-1's last dd rows of this layer's input
                # (garbage on each batch row's first tile — those rows are
                # below the layer's lattice, same argument as the pair
                # kernel)
                xin_scr[:dd, :n_res] = tails_scr[off : off + dd]
                xin_scr[dd:, :n_res] = x_stream[: tt - dd]
                tails_scr[off : off + dd] = x_stream[tt - dd :]
                cur = x_stream
                xin_scr[:, n_res : 2 * n_res] = x_stream
            y = jnp.dot(xin_scr[:], wi_ref[l],
                        preferred_element_type=jnp.float32) + bi_ref[l]
            if n_ys:
                @pl.when(t > 0)
                def _(l=l):
                    wr_y(l, b, t - 1).wait()
                y_stage[l] = y.astype(jnp.bfloat16)
                wr_y(l, b, t).start()
            h = (jnp.tanh(y[:, :n_dil]) * jax.nn.sigmoid(y[:, n_dil:])
                 ).astype(jnp.bfloat16)
            out = jnp.dot(h, wo_ref[l],
                          preferred_element_type=jnp.float32) + bo_ref[l]
            x_new = cur + out[:, :n_res].astype(jnp.bfloat16)
            skip_acc = skip_acc + out[:, n_res:]
            if l < L - 1 and n_mids:
                @pl.when(t > 0)
                def _(l=l):
                    wr_mid(l, b, t - 1).wait()
                mid_stage[l] = x_new
                wr_mid(l, b, t).start()
            x_stream = x_new
        skip_out_ref[0] = skip_acc

        # drain the staging DMAs before this batch row's sweep ends (the
        # next row's t==0 reuses the staging slots without a pre-wait)
        @pl.when(t == nt - 1)
        def _():
            for l in range(n_mids):
                wr_mid(l, b, t).wait()
            for l in range(n_ys):
                wr_y(l, b, t).wait()

    def spec(c, off=0):
        return pl.BlockSpec((1, tt, c),
                            lambda b, t, _o=off: (b, _o + t_min + t, 0),
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_specs = ([spec(n_skp)] + [any_spec] * n_mids + [any_spec] * n_ys)
    out_shape = (
        [jax.ShapeDtypeStruct(skip.shape, jnp.float32)]
        + [jax.ShapeDtypeStruct((bsz, lp, n_res), jnp.bfloat16)] * n_mids
        + [jax.ShapeDtypeStruct((bsz, p_len, 2 * n_dil), jnp.bfloat16)] * n_ys
    )
    scratch = [
        pltpu.VMEM((2, tt + dd0_pad, n_res), jnp.bfloat16),
        pltpu.VMEM((tt, 2 * n_res + n_cond_pad), jnp.bfloat16),
        pltpu.VMEM((n_tail, n_res), jnp.bfloat16),
    ]
    if n_mids:
        scratch.append(pltpu.VMEM((n_mids, tt, n_res), jnp.bfloat16))
    if n_ys:
        scratch.append(pltpu.VMEM((n_ys, tt, 2 * n_dil), jnp.bfloat16))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if n_mids:
        scratch.append(pltpu.SemaphoreType.DMA((n_mids,)))
    if n_ys:
        scratch.append(pltpu.SemaphoreType.DMA((n_ys,)))

    outs = pl.pallas_call(
        kernel,
        grid=(bsz, nt),
        in_specs=[any_spec, spec(n_cond_pad), spec(n_skp),
                  wspec, wspec, wspec, wspec],
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={2: 0},                     # skip in -> out
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=110 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, cond, skip, w_in_all, b_in_all, w_out_all, b_out_all)
    skip_out = outs[0]
    mids = tuple(outs[1 : 1 + n_mids])
    ys = tuple(outs[1 + n_mids : 1 + n_mids + n_ys])
    return skip_out, mids, ys


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tile", "interpret", "save_y",
                                    "fuse_pairs", "full_fusion", "bwd_group",
                                    "btq"))
def stack_apply(params: dict, cfg: WaveNetConfig, x_ids: jax.Array,
                cond: jax.Array, gc_ids: jax.Array | None = None, *,
                tile: int | None = None, interpret: bool = False,
                save_y: bool | None = None,
                fuse_pairs: bool | None = None,
                full_fusion: bool | None = None,
                bwd_group: int | None = None,
                btq: bool = False) -> jax.Array:
    """Drop-in forward of models/wavenet.apply built on the fused layers.

    x_ids [B, T_in] int32, cond [B, n_lc_out, T_in] -> logits
    [B, n_quant, T_in - rf] (same contract as wavenet.apply).

    Kernel knobs (tile/save_y/fuse_pairs/bwd tile) default from the CONFIG
    fields ``cfg.gated_*`` — part of the jit cache key via the static cfg,
    serialized in checkpoints, no environment reads (a checkpoint's embedded
    config fully determines the computation)."""
    rf = (cfg.filter_sz - 1) * sum(cfg.dilations)
    t_in = x_ids.shape[-1]
    t_out = t_in - rf
    bsz = x_ids.shape[0]
    n_cond = cfg.n_lc_out + cfg.n_global_embed
    n_cond_pad = _round_up(n_cond, 128)
    tt = cfg.gated_tile if tile is None else tile
    p_len = _round_up(t_in, tt)
    lpad = _round_up(512, tt)

    # embedding straight into the right-aligned frame (no [B,C,T] transpose)
    emb = jnp.take(params["embed"], x_ids, axis=0).astype(jnp.bfloat16)
    x = jnp.zeros((bsz, lpad + p_len, cfg.n_res), jnp.bfloat16)
    x = jax.lax.dynamic_update_slice(x, emb, (0, lpad + p_len - t_in, 0))

    if gc_ids is not None:
        g = jnp.take(params["gc_embed"], gc_ids, axis=0)
        g = jnp.broadcast_to(g[:, None, :], (bsz, t_in, g.shape[-1]))
    else:
        g = jnp.zeros((bsz, t_in, cfg.n_global_embed), cond.dtype)
    cond_tm = jnp.concatenate(
        [jnp.transpose(cond, (0, 2, 1)), g.astype(cond.dtype)], axis=-1
    ).astype(jnp.bfloat16)
    cond_buf = jnp.zeros((bsz, p_len, n_cond_pad), jnp.bfloat16)
    cond_buf = jax.lax.dynamic_update_slice(
        cond_buf, cond_tm, (0, p_len - t_in, 0))

    packed = tuple(pack_stack_weights(params, cfg))
    dils = tuple(d * (cfg.filter_sz - 1) for d in cfg.dilations)
    if save_y is None:
        save_y = cfg.gated_save_y
    # pair fusion default ON: measured 1,635,186 vs 1,453,579
    # samples/s/chip (+12.5%) on the flagship step (BASELINE.md)
    if fuse_pairs is None:
        fuse_pairs = cfg.gated_fuse_pairs
    if full_fusion is None:
        full_fusion = cfg.gated_full_fusion
    if bwd_group is None:
        bwd_group = cfg.gated_bwd_group
    tt_bwd = cfg.gated_bwd_tile or tt
    if tt % tt_bwd != 0:
        raise ValueError(
            f"gated_bwd_tile={tt_bwd} must divide the forward tile {tt}")
    core = _stack_core(dils, t_in, cfg.n_skp, tt, interpret, save_y,
                       fuse_pairs, tt_bwd, full_fusion, bwd_group)
    skip = core(x, cond_buf, packed)

    skip_out = jax.lax.dynamic_slice(
        skip, (0, p_len - t_out, 0), (bsz, t_out, cfg.n_skp))
    h = jax.nn.relu(skip_out)
    dtype = jnp.bfloat16

    def mm(p, v):
        return (jnp.einsum("oc,btc->bto", p["w"].astype(dtype),
                           v.astype(dtype), preferred_element_type=dtype)
                + p["b"][None, None, :].astype(dtype))

    h = jax.nn.relu(mm(params["post1"], h))
    logits = mm(params["post2"], h)
    if btq:
        # time-major [B, T, Q] — the stack's native layout; the loss can
        # consume it directly (softmax on the lane axis, no transpose)
        return logits
    return jnp.transpose(logits, (0, 2, 1))


# ===================================================================== bwd

def gated_layer_bwd(x, cond, gxcur, gxprev, gskip, gcond, w_in, w_out, b_in,
                    *, dd: int, prev_dd: int, t_min: int, valid_lo: int,
                    cur_valid_lo: int, tile: int, interpret: bool = False,
                    y_saved=None):
    """Fused backward of one gated layer.

    Inputs (frame-aligned, see module docstring):
      x      [B, LPAD+P, n_res] bf16 — this layer's saved INPUT stream
      y_saved [B, P, 2*n_dil] bf16 or None — forward gate pre-activations;
              when given, the xin @ w_in recompute GEMM (28% of backward
              FLOPs) is skipped and the gates are rebuilt on the VPU
      cond   [B, P, ncp] bf16
      gxcur  [B, LPAD+P, n_res] bf16 — d/d(x_new)[g], identity+cur parts
      gxprev [B, LPAD+P+RPAD, n_res] bf16 — d/d(x_new)[g-dd_next] stored at g
              (the NEXT layer's prev-tap contribution; junk above P masked)
      gskip  [B, P, n_skp] bf16 — d/d(skip buffer) (constant across layers)
      gcond  [B, P, ncp] f32 — accumulated d/d(cond), aliased in/out
      dd: this layer's dilation step; prev_dd: the NEXT layer's dd (shift at
      which gxprev must be read); valid_lo: first valid OUTPUT frame row
      (P - Ty); t_min: first tile touching valid rows.

    Returns (gxcur' [B,LPAD+P,n_res], gxprev' [B,LPAD+P+RPAD,n_res],
             gcond', dw_in [XIN,2*n_dil] f32, db_in [1,2*n_dil] f32,
             dw_out [n_dil,n_res+n_skp] f32, db_out [1,...] f32).
    """
    w_in = w_in.astype(jnp.bfloat16)
    w_out = w_out.astype(jnp.bfloat16)
    bsz, lp, n_res = x.shape
    p_len = cond.shape[1]
    lpad = lp - p_len
    rpad = gxprev.shape[1] - lp
    n_cond_pad = cond.shape[-1]
    n_dil = w_in.shape[-1] // 2
    n_skp = gskip.shape[-1]
    xin_w = 2 * n_res + n_cond_pad
    tt = tile
    nt = p_len // tt - t_min
    dd_pad = _round_up(dd, 16)
    pdd_pad = _round_up(prev_dd, 16) if prev_dd else 0
    lpad_blk = lpad // tt
    assert lpad % tt == 0 and dd_pad <= lpad and pdd_pad <= rpad

    use_y = y_saved is not None

    def kernel(x_hbm, gxp_hbm, cond_ref, gxc_ref, gsk_ref, gcond_ref,
               w_in_ref, w_out_ref, b_in_ref, *rest):
        if use_y:
            (y_ref, gxc_out_ref, gxp_out_ref, gcond_out_ref,
             dw_in_ref, db_in_ref, dw_out_ref, db_out_ref,
             x_scr, gxp_scr, xin_scr, rd_sems) = rest
        else:
            (gxc_out_ref, gxp_out_ref, gcond_out_ref,
             dw_in_ref, db_in_ref, dw_out_ref, db_out_ref,
             x_scr, gxp_scr, xin_scr, rd_sems) = rest
        b = pl.program_id(0)
        t = pl.program_id(1)
        is_first = (b == 0) & (t == 0)

        def rd_x(bb, tile_t, slot):
            start = lpad - dd_pad + (t_min + tile_t) * tt
            return pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(start, tt + dd_pad), :],
                x_scr.at[slot], rd_sems.at[slot, 0])

        def rd_gxp(bb, tile_t, slot):
            # gx'[g] needs gxprev[g + prev_dd]: right halo, 16-aligned start
            start = lpad + (t_min + tile_t) * tt
            return pltpu.make_async_copy(
                gxp_hbm.at[bb, pl.ds(start, tt + pdd_pad), :],
                gxp_scr.at[slot], rd_sems.at[slot, 1])

        @pl.when(t == 0)
        def _():
            rd_x(b, 0, 0).start()
            rd_gxp(b, 0, 0).start()

        @pl.when(t + 1 < nt)
        def _():
            rd_x(b, t + 1, (t + 1) % 2).start()
            rd_gxp(b, t + 1, (t + 1) % 2).start()

        slot = jax.lax.rem(t, 2)
        rd_x(b, t, slot).wait()
        rd_gxp(b, t, slot).wait()

        t0 = (t_min + t) * tt
        rows = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0) + t0

        # ---- rebuild gate activations; xin is still assembled (the dw_in
        # GEMM needs it) but the big recompute GEMM runs only when the
        # forward did not save y (garbage rows -> zero xin / zero y)
        xin_scr[:, :n_res] = x_scr[slot, dd_pad - dd : dd_pad - dd + tt, :]
        xin_scr[:, n_res : 2 * n_res] = x_scr[slot, dd_pad:, :]
        xin_scr[:, 2 * n_res :] = cond_ref[0]
        valid = rows >= valid_lo  # [tt, 1]
        xin = jnp.where(valid, xin_scr[:], 0).astype(jnp.bfloat16)
        if use_y:
            y = jnp.where(valid, y_ref[0].astype(jnp.float32), 0.0)
        else:
            y = jnp.where(
                valid,
                jnp.dot(xin, w_in_ref[:],
                        preferred_element_type=jnp.float32) + b_in_ref[:],
                0.0)
        tf = jnp.tanh(y[:, :n_dil])
        sg = jax.nn.sigmoid(y[:, n_dil:])
        h = (tf * sg).astype(jnp.bfloat16)

        # ---- upstream cotangent of x_new[g]: identity+cur + shifted prev,
        # plus d(skip)[g]; all masked to valid rows.
        # gxcur was written by the NEXT layer's bwd only from ITS lattice
        # (cur_valid_lo); below that its true value is 0 and the buffer may
        # hold unwritten junk -> mask at the producer's boundary.
        gxn = jnp.where(rows >= cur_valid_lo,
                        gxc_ref[0].astype(jnp.float32), 0.0)
        if prev_dd:
            gprev_hi = gxp_scr[slot, prev_dd : prev_dd + tt, :]
            # rows g with g + prev_dd >= P read junk above the frame: zero
            ok = rows + prev_dd < p_len
            gxn = gxn + jnp.where(ok, gprev_hi.astype(jnp.float32), 0.0)
        gxn = jnp.where(valid, gxn, 0.0)
        gsk = jnp.where(valid, gsk_ref[0].astype(jnp.float32), 0.0)
        g_out = jnp.concatenate([gxn, gsk], axis=-1).astype(jnp.bfloat16)

        # ---- backward through the two GEMMs + gate
        g_h = jnp.dot(g_out, w_out_ref[:].T,
                      preferred_element_type=jnp.float32)
        g_f = g_h * sg * (1.0 - tf * tf)
        g_g = g_h * tf * sg * (1.0 - sg)
        g_y = jnp.concatenate([g_f, g_g], axis=-1).astype(jnp.bfloat16)
        g_xin = jnp.dot(g_y, w_in_ref[:].T,
                        preferred_element_type=jnp.float32)

        # ---- weight/bias grads: accumulate across all grid cells
        @pl.when(is_first)
        def _():
            dw_in_ref[:] = jnp.zeros_like(dw_in_ref)
            db_in_ref[:] = jnp.zeros_like(db_in_ref)
            dw_out_ref[:] = jnp.zeros_like(dw_out_ref)
            db_out_ref[:] = jnp.zeros_like(db_out_ref)

        dw_in_ref[:] += jnp.dot(xin.T, g_y,
                                preferred_element_type=jnp.float32)
        db_in_ref[:] += jnp.sum(g_y.astype(jnp.float32), axis=0,
                                keepdims=True)
        dw_out_ref[:] += jnp.dot(h.T, g_out,
                                 preferred_element_type=jnp.float32)
        db_out_ref[:] += jnp.sum(g_out.astype(jnp.float32), axis=0,
                                 keepdims=True)

        # ---- downstream cotangents
        # identity path + cur tap -> gxcur' at row g
        gxc_out_ref[0] = (gxn + g_xin[:, n_res : 2 * n_res]
                          ).astype(jnp.bfloat16)
        # prev tap contribution to row g - dd, stored at row g
        gxp_out_ref[0] = g_xin[:, :n_res].astype(jnp.bfloat16)
        gcond_out_ref[0] = gcond_ref[0] + g_xin[:, 2 * n_res :]

    def spec(c, off=0):
        return pl.BlockSpec((1, tt, c),
                            lambda b, t, _o=off: (b, _o + t_min + t, 0),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x (manual halo DMA)
            pl.BlockSpec(memory_space=pl.ANY),    # gxprev (manual halo)
            spec(n_cond_pad),                        # cond tile
            spec(n_res, off=lpad_blk),               # gxcur tile
            spec(n_skp),                             # gskip tile
            spec(n_cond_pad),                        # gcond tile (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_in
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_out
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b_in
        ] + ([spec(2 * n_dil)] if use_y else []),    # saved y tile
        out_specs=[
            spec(n_res, off=lpad_blk),               # gxcur'
            spec(n_res, off=lpad_blk),               # gxprev'
            spec(n_cond_pad),                        # gcond'
            wspec((xin_w, 2 * n_dil)),               # dw_in (accumulated)
            wspec((1, 2 * n_dil)),                   # db_in
            wspec((n_dil, n_res + n_skp)),           # dw_out
            wspec((1, n_res + n_skp)),               # db_out
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, lp, n_res), jnp.bfloat16),
            jax.ShapeDtypeStruct((bsz, lp + rpad, n_res), jnp.bfloat16),
            jax.ShapeDtypeStruct(gcond.shape, jnp.float32),
            jax.ShapeDtypeStruct((xin_w, 2 * n_dil), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * n_dil), jnp.float32),
            jax.ShapeDtypeStruct((n_dil, n_res + n_skp), jnp.float32),
            jax.ShapeDtypeStruct((1, n_res + n_skp), jnp.float32),
        ],
        input_output_aliases={5: 2},                 # gcond in -> out
        scratch_shapes=[
            pltpu.VMEM((2, tt + dd_pad, n_res), jnp.bfloat16),
            pltpu.VMEM((2, tt + pdd_pad, n_res), jnp.bfloat16),
            pltpu.VMEM((tt, xin_w), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        # the recompute + cotangent streams + f32 dW accumulators exceed the
        # conservative 16M default scoped-vmem budget; v5e has 128M physical
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(x, gxprev, cond, gxcur, gskip, gcond, w_in, w_out, b_in,
      *((y_saved,) if use_y else ()))
    return outs


def gated_pair_bwd(x1, x2, cond, gxcur, gxprev, gskip, gcond, pk1, pk2,
                   y1, y2, *, dd1: int, dd2: int, prev_dd: int, t_min: int,
                   valid_lo1: int, valid_lo2: int, cur_valid_lo: int,
                   tile: int, interpret: bool = False):
    """Fused backward of TWO consecutive gated layers (saved-y only).

    Mirror of :func:`gated_pair_fused`: the inter-layer cotangent (layer
    2's contributions to its input stream x2) never touches HBM.  The grid
    iterates tiles DESCENDING, so layer 2's prev-tap cotangent for rows
    near the tile top — produced at rows [g+tt, g+tt+dd2) — comes from the
    previous (higher) tile's fresh values via a persistent head scratch;
    the first (topmost) tile's garbage head is masked structurally by the
    rows + dd2 < P frame bound, exactly like the gxprev junk mask in
    :func:`gated_layer_bwd`.

    x1/x2: layer 1's / layer 2's saved input streams ([B, LPAD+P, n_res]
    bf16; x2 is the pair kernel's ``mid``).  y1/y2: saved gate
    pre-activations.  gxcur/gxprev/gskip/gcond as in the single-layer
    backward (produced by the NEXT layer's bwd, prev_dd = its dilation
    step).  Returns (gxcur', gxprev', gcond', dw1..., dw2...) where the
    weight-grad tuples are (dw_in, db_in, dw_out, db_out) per layer.
    """
    w_in1, _b1, w_out1, _bo1 = pk1
    w_in2, _b2, w_out2, _bo2 = pk2
    w_in1, w_out1 = w_in1.astype(jnp.bfloat16), w_out1.astype(jnp.bfloat16)
    w_in2, w_out2 = w_in2.astype(jnp.bfloat16), w_out2.astype(jnp.bfloat16)
    bsz, lp, n_res = x1.shape
    p_len = cond.shape[1]
    lpad = lp - p_len
    rpad = gxprev.shape[1] - lp
    n_cond_pad = cond.shape[-1]
    n_dil = w_in1.shape[-1] // 2
    n_skp = gskip.shape[-1]
    xin_w = 2 * n_res + n_cond_pad
    tt = tile
    nt = p_len // tt - t_min
    dd1_pad = _round_up(dd1, 16)
    dd2_pad = _round_up(dd2, 16)
    pdd_pad = _round_up(prev_dd, 16) if prev_dd else 0
    lpad_blk = lpad // tt
    assert lpad % tt == 0 and dd1_pad <= lpad and dd2_pad <= lpad
    assert pdd_pad <= rpad and 0 < dd2 < tt

    def kernel(x1_hbm, x2_hbm, gxp_hbm, cond_ref, gxc_ref, gsk_ref,
               gcond_ref, wi1, wo1, wi2, wo2, y1_ref, y2_ref,
               gxc_out_ref, gxp_out_ref, gcond_out_ref,
               dwi1_ref, dbi1_ref, dwo1_ref, dbo1_ref,
               dwi2_ref, dbi2_ref, dwo2_ref, dbo2_ref,
               x1_scr, x2_scr, gxp_scr, xin_scr, head_scr, rd_sems):
        b = pl.program_id(0)
        t = pl.program_id(1)
        rt = nt - 1 - t          # descending tile order
        is_first = (b == 0) & (t == 0)

        def rd(hbm, scr, bb, tile_rt, slot, halo_pad, sem):
            start = lpad - halo_pad + (t_min + tile_rt) * tt
            return pltpu.make_async_copy(
                hbm.at[bb, pl.ds(start, tt + halo_pad), :],
                scr.at[slot], rd_sems.at[slot, sem])

        def rd_gxp(bb, tile_rt, slot):
            start = lpad + (t_min + tile_rt) * tt
            return pltpu.make_async_copy(
                gxp_hbm.at[bb, pl.ds(start, tt + pdd_pad), :],
                gxp_scr.at[slot], rd_sems.at[slot, 2])

        @pl.when(t == 0)
        def _():
            rd(x1_hbm, x1_scr, b, rt, 0, dd1_pad, 0).start()
            rd(x2_hbm, x2_scr, b, rt, 0, dd2_pad, 1).start()
            if prev_dd:
                rd_gxp(b, rt, 0).start()

        @pl.when(t + 1 < nt)
        def _():
            rd(x1_hbm, x1_scr, b, rt - 1, (t + 1) % 2, dd1_pad, 0).start()
            rd(x2_hbm, x2_scr, b, rt - 1, (t + 1) % 2, dd2_pad, 1).start()
            if prev_dd:
                rd_gxp(b, rt - 1, (t + 1) % 2).start()

        slot = jax.lax.rem(t, 2)
        rd(x1_hbm, x1_scr, b, rt, slot, dd1_pad, 0).wait()
        rd(x2_hbm, x2_scr, b, rt, slot, dd2_pad, 1).wait()
        if prev_dd:
            rd_gxp(b, rt, slot).wait()

        t0 = (t_min + rt) * tt
        rows = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0) + t0

        @pl.when(is_first)
        def _():
            for ref in (dwi1_ref, dbi1_ref, dwo1_ref, dbo1_ref,
                        dwi2_ref, dbi2_ref, dwo2_ref, dbo2_ref):
                ref[:] = jnp.zeros_like(ref)

        # ================= layer 2 (upper) backward =================
        valid2 = rows >= valid_lo2
        xin_scr[:, :n_res] = x2_scr[slot, dd2_pad - dd2 : dd2_pad - dd2 + tt, :]
        xin_scr[:, n_res : 2 * n_res] = x2_scr[slot, dd2_pad:, :]
        xin_scr[:, 2 * n_res :] = cond_ref[0]
        xin2 = jnp.where(valid2, xin_scr[:], 0).astype(jnp.bfloat16)
        y2 = jnp.where(valid2, y2_ref[0].astype(jnp.float32), 0.0)
        tf2 = jnp.tanh(y2[:, :n_dil])
        sg2 = jax.nn.sigmoid(y2[:, n_dil:])
        h2 = (tf2 * sg2).astype(jnp.bfloat16)

        gxn2 = jnp.where(rows >= cur_valid_lo,
                         gxc_ref[0].astype(jnp.float32), 0.0)
        if prev_dd:
            gp_hi = gxp_scr[slot, prev_dd : prev_dd + tt, :]
            gxn2 = gxn2 + jnp.where(rows + prev_dd < p_len,
                                    gp_hi.astype(jnp.float32), 0.0)
        gxn2 = jnp.where(valid2, gxn2, 0.0)
        gsk2 = jnp.where(valid2, gsk_ref[0].astype(jnp.float32), 0.0)
        g_out2 = jnp.concatenate([gxn2, gsk2], axis=-1).astype(jnp.bfloat16)
        g_h2 = jnp.dot(g_out2, wo2[:].T, preferred_element_type=jnp.float32)
        g_f2 = g_h2 * sg2 * (1.0 - tf2 * tf2)
        g_g2 = g_h2 * tf2 * sg2 * (1.0 - sg2)
        g_y2 = jnp.concatenate([g_f2, g_g2], axis=-1).astype(jnp.bfloat16)
        g_xin2 = jnp.dot(g_y2, wi2[:].T, preferred_element_type=jnp.float32)

        dwi2_ref[:] += jnp.dot(xin2.T, g_y2,
                               preferred_element_type=jnp.float32)
        dbi2_ref[:] += jnp.sum(g_y2.astype(jnp.float32), 0, keepdims=True)
        dwo2_ref[:] += jnp.dot(h2.T, g_out2,
                               preferred_element_type=jnp.float32)
        dbo2_ref[:] += jnp.sum(g_out2.astype(jnp.float32), 0, keepdims=True)

        # ---- layer 1's upstream cotangent, assembled in VMEM:
        # identity+cur at row q, plus layer 2's prev-tap term produced at
        # row q + dd2 (fresh below the tile top, persistent head above it)
        cur2 = gxn2 + g_xin2[:, n_res : 2 * n_res]
        prev2 = jnp.concatenate(
            [g_xin2[dd2:, :n_res], head_scr[:].astype(jnp.float32)], axis=0)
        prev2 = jnp.where(rows + dd2 < p_len, prev2, 0.0)
        head_scr[:] = g_xin2[:dd2, :n_res].astype(jnp.float32)

        # ================= layer 1 (lower) backward =================
        valid1 = rows >= valid_lo1
        xin_scr[:, :n_res] = x1_scr[slot, dd1_pad - dd1 : dd1_pad - dd1 + tt, :]
        xin_scr[:, n_res : 2 * n_res] = x1_scr[slot, dd1_pad:, :]
        xin1 = jnp.where(valid1, xin_scr[:], 0).astype(jnp.bfloat16)
        y1 = jnp.where(valid1, y1_ref[0].astype(jnp.float32), 0.0)
        tf1 = jnp.tanh(y1[:, :n_dil])
        sg1 = jax.nn.sigmoid(y1[:, n_dil:])
        h1 = (tf1 * sg1).astype(jnp.bfloat16)

        gxn1 = jnp.where(valid1, cur2 + prev2, 0.0)
        gsk1 = jnp.where(valid1, gsk_ref[0].astype(jnp.float32), 0.0)
        g_out1 = jnp.concatenate([gxn1, gsk1], axis=-1).astype(jnp.bfloat16)
        g_h1 = jnp.dot(g_out1, wo1[:].T, preferred_element_type=jnp.float32)
        g_f1 = g_h1 * sg1 * (1.0 - tf1 * tf1)
        g_g1 = g_h1 * tf1 * sg1 * (1.0 - sg1)
        g_y1 = jnp.concatenate([g_f1, g_g1], axis=-1).astype(jnp.bfloat16)
        g_xin1 = jnp.dot(g_y1, wi1[:].T, preferred_element_type=jnp.float32)

        dwi1_ref[:] += jnp.dot(xin1.T, g_y1,
                               preferred_element_type=jnp.float32)
        dbi1_ref[:] += jnp.sum(g_y1.astype(jnp.float32), 0, keepdims=True)
        dwo1_ref[:] += jnp.dot(h1.T, g_out1,
                               preferred_element_type=jnp.float32)
        dbo1_ref[:] += jnp.sum(g_out1.astype(jnp.float32), 0, keepdims=True)

        gxc_out_ref[0] = (gxn1 + g_xin1[:, n_res : 2 * n_res]
                          ).astype(jnp.bfloat16)
        gxp_out_ref[0] = g_xin1[:, :n_res].astype(jnp.bfloat16)
        gcond_out_ref[0] = (gcond_ref[0] + g_xin1[:, 2 * n_res :]
                            + g_xin2[:, 2 * n_res :])

    def spec(c, off=0):
        return pl.BlockSpec(
            (1, tt, c),
            lambda b, t, _o=off: (b, _o + t_min + (nt - 1 - t), 0),
            memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    vw = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x1 (manual halo)
            pl.BlockSpec(memory_space=pl.ANY),    # x2 (manual halo)
            pl.BlockSpec(memory_space=pl.ANY),    # gxprev (manual halo)
            spec(n_cond_pad),                        # cond tile
            spec(n_res, off=lpad_blk),               # gxcur tile
            spec(n_skp),                             # gskip tile
            spec(n_cond_pad),                        # gcond tile (aliased)
            vw, vw, vw, vw,                          # wi1 wo1 wi2 wo2
            spec(2 * n_dil),                         # y1 tile
            spec(2 * n_dil),                         # y2 tile
        ],
        out_specs=[
            spec(n_res, off=lpad_blk),               # gxcur'
            spec(n_res, off=lpad_blk),               # gxprev'
            spec(n_cond_pad),                        # gcond'
            wspec((xin_w, 2 * n_dil)), wspec((1, 2 * n_dil)),
            wspec((n_dil, n_res + n_skp)), wspec((1, n_res + n_skp)),
            wspec((xin_w, 2 * n_dil)), wspec((1, 2 * n_dil)),
            wspec((n_dil, n_res + n_skp)), wspec((1, n_res + n_skp)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, lp, n_res), jnp.bfloat16),
            jax.ShapeDtypeStruct((bsz, lp + rpad, n_res), jnp.bfloat16),
            jax.ShapeDtypeStruct(gcond.shape, jnp.float32),
            jax.ShapeDtypeStruct((xin_w, 2 * n_dil), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * n_dil), jnp.float32),
            jax.ShapeDtypeStruct((n_dil, n_res + n_skp), jnp.float32),
            jax.ShapeDtypeStruct((1, n_res + n_skp), jnp.float32),
            jax.ShapeDtypeStruct((xin_w, 2 * n_dil), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * n_dil), jnp.float32),
            jax.ShapeDtypeStruct((n_dil, n_res + n_skp), jnp.float32),
            jax.ShapeDtypeStruct((1, n_res + n_skp), jnp.float32),
        ],
        input_output_aliases={6: 2},                 # gcond in -> out
        scratch_shapes=[
            pltpu.VMEM((2, tt + dd1_pad, n_res), jnp.bfloat16),
            pltpu.VMEM((2, tt + dd2_pad, n_res), jnp.bfloat16),
            pltpu.VMEM((2, tt + pdd_pad, n_res), jnp.bfloat16),
            pltpu.VMEM((tt, xin_w), jnp.bfloat16),
            pltpu.VMEM((dd2, n_res), jnp.float32),   # persistent head
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x1, x2, gxprev, cond, gxcur, gskip, gcond,
      w_in1, w_out1, w_in2, w_out2, y1, y2)
    return outs


def gated_group_bwd(xs_g, cond, gxcur, gxprev, gskip, gcond, pks, ys_g, *,
                    dds, prev_dd: int, t_min: int, valid_los,
                    cur_valid_lo: int, tile: int, interpret: bool = False):
    """Fused backward of G consecutive gated layers (saved-y only).

    Generalization of :func:`gated_pair_bwd` from 2 to G layers: ALL
    inter-layer cotangent streams inside the group stay in VMEM.  The grid
    iterates tiles DESCENDING; each inner layer boundary j carries a
    persistent head scratch holding layer j's prev-tap cotangent rows
    [g + tt, g + tt + dd_j) produced by the previous (higher) tile —
    exactly the pair kernel's head, one per boundary.  Versus G/2 pair
    launches this removes G/2 - 1 round trips each of the gx streams, the
    gskip read, and the f32 gcond read+write.

    xs_g / ys_g / pks / dds / valid_los: per-layer tuples, LOWER layer
    first.  prev_dd / cur_valid_lo describe the layer ABOVE the group
    (identical contract to the pair kernel).  Requires every dds[1:] <
    tile.  Returns (gxcur', gxprev', gcond', (dwi, dbi, dwo, dbo) x G).
    """
    G = len(dds)
    assert G >= 2 and all(0 < d < tile for d in dds[1:])
    w_ins = [p[0].astype(jnp.bfloat16) for p in pks]
    w_outs = [p[2].astype(jnp.bfloat16) for p in pks]
    bsz, lp, n_res = xs_g[0].shape
    p_len = cond.shape[1]
    lpad = lp - p_len
    rpad = gxprev.shape[1] - lp
    n_cond_pad = cond.shape[-1]
    n_dil = w_ins[0].shape[-1] // 2
    n_skp = gskip.shape[-1]
    xin_w = 2 * n_res + n_cond_pad
    tt = tile
    nt = p_len // tt - t_min
    dd_pads = [_round_up(d, 16) for d in dds]
    pdd_pad = _round_up(prev_dd, 16) if prev_dd else 0
    lpad_blk = lpad // tt
    assert lpad % tt == 0 and pdd_pad <= rpad
    assert all(dp <= lpad for dp in dd_pads)

    head_offs, acc = [], 0
    for d in dds[1:]:
        head_offs.append(acc)
        acc += d
    n_head = max(acc, 1)

    def kernel(*refs):
        i = 0
        x_hbms = refs[i : i + G]; i += G
        gxp_hbm = refs[i]; i += 1
        cond_ref, gxc_ref, gsk_ref, gcond_ref = refs[i : i + 4]; i += 4
        wi_refs = refs[i : i + G]; i += G
        wo_refs = refs[i : i + G]; i += G
        y_refs = refs[i : i + G]; i += G
        gxc_out_ref, gxp_out_ref, gcond_out_ref = refs[i : i + 3]; i += 3
        dw_refs = refs[i : i + 4 * G]; i += 4 * G
        x_scrs = refs[i : i + G]; i += G
        gxp_scr, xin_scr, head_scr, rd_sems = refs[i : i + 4]

        b = pl.program_id(0)
        t = pl.program_id(1)
        rt = nt - 1 - t          # descending tile order
        is_first = (b == 0) & (t == 0)

        def rd_x(j, bb, tile_rt, slot):
            start = lpad - dd_pads[j] + (t_min + tile_rt) * tt
            return pltpu.make_async_copy(
                x_hbms[j].at[bb, pl.ds(start, tt + dd_pads[j]), :],
                x_scrs[j].at[slot], rd_sems.at[slot, j])

        def rd_gxp(bb, tile_rt, slot):
            start = lpad + (t_min + tile_rt) * tt
            return pltpu.make_async_copy(
                gxp_hbm.at[bb, pl.ds(start, tt + pdd_pad), :],
                gxp_scr.at[slot], rd_sems.at[slot, G])

        @pl.when(t == 0)
        def _():
            for j in range(G):
                rd_x(j, b, rt, 0).start()
            if prev_dd:
                rd_gxp(b, rt, 0).start()

        @pl.when(t + 1 < nt)
        def _():
            for j in range(G):
                rd_x(j, b, rt - 1, (t + 1) % 2).start()
            if prev_dd:
                rd_gxp(b, rt - 1, (t + 1) % 2).start()

        slot = jax.lax.rem(t, 2)
        for j in range(G):
            rd_x(j, b, rt, slot).wait()
        if prev_dd:
            rd_gxp(b, rt, slot).wait()

        t0 = (t_min + rt) * tt
        rows = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0) + t0

        @pl.when(is_first)
        def _():
            for ref in dw_refs:
                ref[:] = jnp.zeros_like(ref)

        xin_scr[:, 2 * n_res :] = cond_ref[0]
        gcond_acc = gcond_ref[0]
        cur_nxt = prev_nxt = None  # cotangent parts from the layer above
        for j in range(G - 1, -1, -1):
            valid = rows >= valid_los[j]
            dd = dds[j]
            dp = dd_pads[j]
            xin_scr[:, :n_res] = x_scrs[j][slot, dp - dd : dp - dd + tt, :]
            xin_scr[:, n_res : 2 * n_res] = x_scrs[j][slot, dp:, :]
            xin = jnp.where(valid, xin_scr[:], 0).astype(jnp.bfloat16)
            y = jnp.where(valid, y_refs[j][0].astype(jnp.float32), 0.0)
            tf = jnp.tanh(y[:, :n_dil])
            sg = jax.nn.sigmoid(y[:, n_dil:])
            h = (tf * sg).astype(jnp.bfloat16)

            if j == G - 1:
                gxn = jnp.where(rows >= cur_valid_lo,
                                gxc_ref[0].astype(jnp.float32), 0.0)
                if prev_dd:
                    gp_hi = gxp_scr[slot, prev_dd : prev_dd + tt, :]
                    gxn = gxn + jnp.where(rows + prev_dd < p_len,
                                          gp_hi.astype(jnp.float32), 0.0)
            else:
                gxn = cur_nxt + prev_nxt
            gxn = jnp.where(valid, gxn, 0.0)
            gsk = jnp.where(valid, gsk_ref[0].astype(jnp.float32), 0.0)
            g_out = jnp.concatenate([gxn, gsk], axis=-1).astype(jnp.bfloat16)
            g_h = jnp.dot(g_out, wo_refs[j][:].T,
                          preferred_element_type=jnp.float32)
            g_f = g_h * sg * (1.0 - tf * tf)
            g_g = g_h * tf * sg * (1.0 - sg)
            g_y = jnp.concatenate([g_f, g_g], axis=-1).astype(jnp.bfloat16)
            g_xin = jnp.dot(g_y, wi_refs[j][:].T,
                            preferred_element_type=jnp.float32)

            dwi, dbi, dwo, dbo = dw_refs[4 * j : 4 * j + 4]
            dwi[:] += jnp.dot(xin.T, g_y, preferred_element_type=jnp.float32)
            dbi[:] += jnp.sum(g_y.astype(jnp.float32), 0, keepdims=True)
            dwo[:] += jnp.dot(h.T, g_out, preferred_element_type=jnp.float32)
            dbo[:] += jnp.sum(g_out.astype(jnp.float32), 0, keepdims=True)
            gcond_acc = gcond_acc + g_xin[:, 2 * n_res :]

            if j > 0:
                # assemble layer j-1's upstream in VMEM: identity+cur at
                # row q plus this layer's prev-tap term produced at q+dd
                # (fresh below the tile top, persistent head above it)
                off = head_offs[j - 1]
                cur_nxt = gxn + g_xin[:, n_res : 2 * n_res]
                prev_nxt = jnp.concatenate(
                    [g_xin[dd:, :n_res],
                     head_scr[off : off + dd].astype(jnp.float32)], axis=0)
                prev_nxt = jnp.where(rows + dd < p_len, prev_nxt, 0.0)
                head_scr[off : off + dd] = g_xin[:dd, :n_res].astype(
                    jnp.float32)
            else:
                gxc_out_ref[0] = (gxn + g_xin[:, n_res : 2 * n_res]
                                  ).astype(jnp.bfloat16)
                gxp_out_ref[0] = g_xin[:, :n_res].astype(jnp.bfloat16)
        gcond_out_ref[0] = gcond_acc

    def spec(c, off=0):
        return pl.BlockSpec(
            (1, tt, c),
            lambda b, t, _o=off: (b, _o + t_min + (nt - 1 - t), 0),
            memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    vw = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    dw_specs, dw_shapes = [], []
    for _ in range(G):
        dw_specs += [wspec((xin_w, 2 * n_dil)), wspec((1, 2 * n_dil)),
                     wspec((n_dil, n_res + n_skp)), wspec((1, n_res + n_skp))]
        dw_shapes += [
            jax.ShapeDtypeStruct((xin_w, 2 * n_dil), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * n_dil), jnp.float32),
            jax.ShapeDtypeStruct((n_dil, n_res + n_skp), jnp.float32),
            jax.ShapeDtypeStruct((1, n_res + n_skp), jnp.float32),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(bsz, nt),
        in_specs=(
            [any_spec] * G + [any_spec]
            + [spec(n_cond_pad), spec(n_res, off=lpad_blk), spec(n_skp),
               spec(n_cond_pad)]
            + [vw] * (2 * G)
            + [spec(2 * n_dil)] * G
        ),
        out_specs=[
            spec(n_res, off=lpad_blk),               # gxcur'
            spec(n_res, off=lpad_blk),               # gxprev'
            spec(n_cond_pad),                        # gcond'
        ] + dw_specs,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, lp, n_res), jnp.bfloat16),
            jax.ShapeDtypeStruct((bsz, lp + rpad, n_res), jnp.bfloat16),
            jax.ShapeDtypeStruct(gcond.shape, jnp.float32),
        ] + dw_shapes,
        input_output_aliases={G + 4: 2},             # gcond in -> out
        scratch_shapes=(
            [pltpu.VMEM((2, tt + dd_pads[j], n_res), jnp.bfloat16)
             for j in range(G)]
            + [pltpu.VMEM((2, tt + pdd_pad, n_res), jnp.bfloat16),
               pltpu.VMEM((tt, xin_w), jnp.bfloat16),
               pltpu.VMEM((n_head, n_res), jnp.float32),
               pltpu.SemaphoreType.DMA((2, G + 1))]
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=110 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*xs_g, gxprev, cond, gxcur, gskip, gcond,
      *w_ins, *w_outs, *ys_g)
    return outs


def _full_fusion_ok(dils: tuple, tt: int) -> bool:
    # the whole-stack kernel keeps every inter-layer stream in VMEM across
    # one tile, so every inner dilation span must fit within a tile
    return len(dils) >= 2 and all(0 < d < tt for d in dils[1:])


def full_fusion_applies(cfg: WaveNetConfig, tile: int | None = None) -> bool:
    """True iff the whole-stack fused forward structurally applies at this
    tile (benches/tools should check this before labeling an A/B: the
    schedule knobs are best-effort and fall back silently otherwise)."""
    tt = tile or cfg.gated_tile
    dils = tuple(d * (cfg.filter_sz - 1) for d in cfg.dilations)
    return _full_fusion_ok(dils, tt)


@functools.lru_cache(maxsize=64)
def _stack_core(dils: tuple, t_in: int, n_skp: int, tile: int,
                interpret: bool, save_y: bool = True,
                fuse_pairs: bool = False, bwd_tile: int | None = None,
                full_fusion: bool = False, bwd_group: int = 0):
    """custom_vjp'd fused stack: (x0, cond_buf, packed_weights) -> skip_buf.

    Forward runs the fused layers; backward runs :func:`gated_layer_bwd` in
    reverse, saving each layer's input residual stream as residuals (L x
    [B, LPAD+P, n_res] bf16 — the cheapest complete residual from which the
    backward can rebuild its operands in-kernel).  With ``save_y`` (default;
    ``cfg.gated_save_y=False`` reverts) the forward also saves each layer's
    gate pre-activations y bf16, removing the backward's xin @ w_in
    recompute GEMM — 28% of backward FLOPs for ~2 KB/row/layer of extra HBM
    traffic (measured head-to-head in BASELINE.md)."""
    tt = tile
    # requested-but-inapplicable knobs fall back to the next schedule down;
    # say so once (lru_cache: one warning per distinct core) instead of
    # silently measuring/labeling the wrong schedule
    import warnings
    if full_fusion and not _full_fusion_ok(dils, tt):
        warnings.warn(
            f"gated_full_fusion does not apply (inner dilation >= tile "
            f"{tt}); using the pair/per-layer schedule", stacklevel=2)
    if bwd_group >= 3 and not save_y:
        warnings.warn(
            "gated_bwd_group requires gated_save_y=True; using the "
            "pair/per-layer backward", stacklevel=2)
    p_len = _round_up(t_in, tt)
    rpad = _round_up(512, tt)
    # measured on v5e (BASELINE.md): bwd tile = fwd tile is best (1.321M
    # vs 1.315M at tile/2 and 1.298M at tile/4) under the raised 64M
    # scoped-vmem limit.  cfg.gated_bwd_tile overrides for experiments
    # (must divide the forward tile, hence p_len and the paddings).
    tt_bwd = bwd_tile or tt

    def layer_geo(i, tsz=tt):
        ty = t_in - sum(dils[: i + 1])
        t_min = (p_len - ty) // tsz
        return ty, t_min

    def run_fwd(x, cond_buf, packed, save):
        bsz = x.shape[0]
        skip = jnp.zeros((bsz, p_len, n_skp), jnp.float32)
        if (full_fusion and len(dils) >= 2
                and all(0 < d < tt for d in dils[1:])):
            # whole-stack fusion: one kernel, inter-layer streams in VMEM,
            # skip accumulated once (gated_stack_fused); mids/y written in
            # the pair path's exact layout so the backward is unchanged
            skip, mids, ys_t = gated_stack_fused(
                x, cond_buf, skip, packed, dils=dils,
                t_min=layer_geo(0)[1], tile=tt, interpret=interpret,
                save_y=save and save_y, save_mids=save,
            )
            xs = (x,) + mids if save else ()
            return skip, tuple(xs), tuple(ys_t)
        xs, ys = [], []
        i = 0
        while i < len(dils):
            dd = dils[i]
            pair = (fuse_pairs and i + 1 < len(dils)
                    and 0 < dils[i + 1] < tt)
            if save:
                xs.append(x)
            _ty, t_min = layer_geo(i)
            if pair:
                outs = gated_pair_fused(
                    x, cond_buf, skip, packed[i], packed[i + 1],
                    dd1=dd, dd2=dils[i + 1], t_min=t_min, tile=tt,
                    interpret=interpret, save_y=save and save_y,
                )
                if save and save_y:
                    mid, x, skip, y1, y2 = outs
                    ys.extend((y1, y2))
                else:
                    mid, x, skip = outs
                if save:
                    xs.append(mid)
                i += 2
                continue
            w_in, b_in, w_out, b_out = packed[i]
            outs = gated_layer_fused(
                x, cond_buf, skip, w_in, b_in, w_out, b_out,
                dd=dd, t_min=t_min, tile=tt, interpret=interpret,
                save_y=save and save_y,
            )
            if save and save_y:
                x, skip, y = outs
                ys.append(y)
            else:
                x, skip = outs
            i += 1
        return skip, tuple(xs), tuple(ys)

    @jax.custom_vjp
    def core(x0, cond_buf, packed):
        skip, _, _ = run_fwd(x0, cond_buf, packed, save=False)
        return skip

    def core_fwd(x0, cond_buf, packed):
        skip, xs, ys = run_fwd(x0, cond_buf, packed, save=True)
        return skip, (xs, ys, cond_buf, packed)

    def core_bwd(res, g_skip):
        xs, ys, cond_buf, packed = res
        bsz, lp, n_res = xs[0].shape
        ncp = cond_buf.shape[-1]
        gskip = g_skip.astype(jnp.bfloat16)
        gxcur = jnp.zeros((bsz, lp, n_res), jnp.bfloat16)  # x_L unused
        gxprev = jnp.zeros((bsz, lp + rpad, n_res), jnp.bfloat16)
        gcond = jnp.zeros((bsz, p_len, ncp), jnp.float32)
        dpacked = [None] * len(dils)
        # segmentation is independent of the forward's fusion schedule (the
        # saved xs/ys cover every layer); fused segments require save_y
        # (no recompute path) and every inner dd < tt_bwd (the persistent
        # heads must fit one tile back)
        segs, i = [], 0
        if bwd_group >= 3 and save_y:
            # grouped backward: up to bwd_group consecutive layers per
            # kernel (gated_group_bwd)
            while i < len(dils):
                j = i
                while (j + 1 < len(dils) and (j - i + 1) < bwd_group
                       and 0 < dils[j + 1] < tt_bwd):
                    j += 1
                segs.append(tuple(range(i, j + 1)))
                i = j + 1
        else:
            while i < len(dils):
                if (fuse_pairs and i + 1 < len(dils) and 0 < dils[i + 1] < tt
                        and save_y and dils[i + 1] < tt_bwd):
                    segs.append((i, i + 1))
                    i += 2
                else:
                    segs.append((i,))
                    i += 1

        def qb(dwi, dbi, dwo, dbo):
            # weight cotangents stay FLOAT32 (matching the f32 packed
            # primals): the optimizer sees full-precision grads, same as
            # the XLA path — no bf16 quantization between bwd and Adam
            return (dwi.astype(jnp.float32), dbi.astype(jnp.float32),
                    dwo.astype(jnp.float32), dbo.astype(jnp.float32))

        for seg in reversed(segs):
            i = seg[0]
            j = seg[-1]                       # upper layer of the segment
            prev_dd = dils[j + 1] if j + 1 < len(dils) else 0
            # gxcur's producer is layer j+1's bwd, defined on ITS lattice
            cur_valid_lo = (p_len - layer_geo(j + 1)[0]
                            if j + 1 < len(dils) else p_len)
            ty, t_min = layer_geo(i, tt_bwd)
            if len(seg) >= 3:
                outs = gated_group_bwd(
                    tuple(xs[i : j + 1]), cond_buf, gxcur, gxprev, gskip,
                    gcond, tuple(packed[i : j + 1]), tuple(ys[i : j + 1]),
                    dds=tuple(dils[i : j + 1]), prev_dd=prev_dd,
                    t_min=t_min,
                    valid_los=tuple(p_len - layer_geo(k)[0]
                                    for k in range(i, j + 1)),
                    cur_valid_lo=cur_valid_lo, tile=tt_bwd,
                    interpret=interpret,
                )
                gxcur, gxprev, gcond = outs[0], outs[1], outs[2]
                for k in range(len(seg)):
                    dpacked[i + k] = qb(*outs[3 + 4 * k : 3 + 4 * k + 4])
                continue
            if len(seg) == 2:
                (gxcur, gxprev, gcond, dwi1, dbi1, dwo1, dbo1,
                 dwi2, dbi2, dwo2, dbo2) = gated_pair_bwd(
                    xs[i], xs[i + 1], cond_buf, gxcur, gxprev, gskip,
                    gcond, packed[i], packed[i + 1], ys[i], ys[i + 1],
                    dd1=dils[i], dd2=dils[i + 1], prev_dd=prev_dd,
                    t_min=t_min, valid_lo1=p_len - ty,
                    valid_lo2=p_len - layer_geo(i + 1)[0],
                    cur_valid_lo=cur_valid_lo, tile=tt_bwd,
                    interpret=interpret,
                )
                dpacked[i] = qb(dwi1, dbi1, dwo1, dbo1)
                dpacked[i + 1] = qb(dwi2, dbi2, dwo2, dbo2)
                continue
            w_in, b_in, w_out, _b_out = packed[i]
            gxcur, gxprev, gcond, dwi, dbi, dwo, dbo = gated_layer_bwd(
                xs[i], cond_buf, gxcur, gxprev, gskip, gcond, w_in, w_out,
                b_in, dd=dils[i], prev_dd=prev_dd, t_min=t_min,
                valid_lo=p_len - ty, cur_valid_lo=cur_valid_lo,
                tile=tt_bwd, interpret=interpret,
                y_saved=ys[i] if save_y else None,
            )
            dpacked[i] = qb(dwi, dbi, dwo, dbo)
        # fold the first layer's prev-tap grads into the x0 cotangent.
        # Rows outside each buffer's written/defined region are junk and are
        # masked to their true value (zero): gxcur below the first layer's
        # output lattice, gxprev beyond the frame or below the lattice.
        d0 = dils[0]
        lpad = lp - p_len
        vl = lpad + p_len - (t_in - d0)   # first out-lattice row of layer 0
        shifted = jax.lax.dynamic_slice_in_dim(gxprev, d0, lp, axis=1)
        row = jnp.arange(lp)[None, :, None]
        g_x0 = (jnp.where(row >= vl, gxcur, 0)
                + jnp.where((row >= vl - d0) & (row + d0 < lp), shifted, 0))
        return g_x0, gcond.astype(cond_buf.dtype), tuple(dpacked)

    core.defvjp(core_fwd, core_bwd)
    return core

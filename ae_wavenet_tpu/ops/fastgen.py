"""Fast autoregressive WaveNet sampling: O(1)/sample ring-buffer queues.

The reference generates naively — it re-runs the conv stack over the whole
receptive field for every emitted sample (SURVEY.md §3.4, O(R)/sample).
This module implements the Fast WaveNet algorithm (arXiv:1611.09482): each
dilated layer keeps a queue of its last ``dilation`` input activations, so
one new sample costs one matmul pass through the stack.

TPU-first design: the per-sample cell is a chain of small matmuls on [B, C]
blocks (batch amortizes the MXU), compiled once inside a ``lax.scan`` over
time; ring-buffer reads/writes are ``dynamic_index_in_dim`` at ``t mod d``.
Weights stay in registers/VMEM across the scan body — XLA hoists them.
A fully fused Pallas cell (all layers + sampling in one kernel, buffers
resident in VMEM) is the next optimization stage; this scan version is the
correctness anchor, verified bit-close against teacher forcing
(tests/test_fastgen.py).

State layout (pytree) per layer l: buf [B, n_res, d_l] holding the layer's
input activation at positions t-1 .. t-d_l (circular, index t mod d_l).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.utils.config import WaveNetConfig


class GenState(NamedTuple):
    bufs: Tuple[jax.Array, ...]  # per layer [B, n_res, d_l]
    prev_id: jax.Array           # [B] int32 — last emitted/consumed sample
    t: jax.Array                 # scalar int32 — global time (buffer phase)


def init_state(cfg: WaveNetConfig, batch: int, fill_id: int = 128) -> GenState:
    """Zero-filled queues; ``fill_id`` (mu-law silence) seeds the AR input."""
    bufs = tuple(
        jnp.zeros((batch, cfg.n_res, d), jnp.float32) for d in cfg.dilations
    )
    return GenState(
        bufs=bufs,
        prev_id=jnp.full((batch,), fill_id, jnp.int32),
        t=jnp.int32(0),
    )


def pack_params(params, cfg: WaveNetConfig, dtype=jnp.float32):
    """Pack the per-layer matmuls into two fused GEMMs per layer.

    MXU-first restructuring: the five small contractions of a gated layer
    become
        y      = [x_prev | x_cur | cond_t] @ W_in^T  + b_in     (one GEMM)
        [r|s]  = h @ W_out^T + b_out                            (one GEMM)
    which removes most per-op issue overhead in the sequential AR cell.
    Weights are pre-cast to the compute dtype once, outside the scan.
    """
    n_cond = cfg.n_lc_out + cfg.n_global_embed
    w_in, b_in, w_out, b_out = [], [], [], []
    for p in params["layers"]:
        w_in.append(jnp.concatenate(
            [p["w_prev"]["w"], p["w_cur"]["w"], p["w_cond"]["w"]], axis=1
        ).astype(dtype))  # [2*n_dil, 2*n_res + n_cond]
        b_in.append(p["w_prev"]["b"] + p["w_cur"]["b"] + p["w_cond"]["b"])
        w_out.append(jnp.concatenate(
            [p["w_res"]["w"], p["w_skip"]["w"]], axis=0
        ).astype(dtype))  # [n_res + n_skp, n_dil]
        b_out.append(jnp.concatenate([p["w_res"]["b"], p["w_skip"]["b"]]))
    packed = {
        # embed stays f32: the residual stream accumulates in f32 and the
        # ring buffers store it (casts happen at each GEMM input)
        "embed": params["embed"],
        "w_in": tuple(w_in), "b_in": tuple(b_in),
        "w_out": tuple(w_out), "b_out": tuple(b_out),
        "post1_w": params["post1"]["w"].astype(dtype),
        "post1_b": params["post1"]["b"],
        "post2_w": params["post2"]["w"].astype(dtype),
        "post2_b": params["post2"]["b"],
    }
    del n_cond
    return packed


def _cell(packed, cfg: WaveNetConfig, state: GenState, x_id: jax.Array,
          cond_t: jax.Array, dtype):
    """One AR step: consume sample id x_id [B] + cond column [B, n_cond]
    -> (new_state_bufs, logits [B, n_quant])."""
    x = jnp.take(packed["embed"], x_id, axis=0)  # [B, n_res]
    cond_t = cond_t.astype(dtype)
    skip = None
    new_bufs = []
    for i, d in enumerate(cfg.dilations):
        buf = state.bufs[i]
        ptr = jnp.mod(state.t, d)
        x_prev = jax.lax.dynamic_index_in_dim(buf, ptr, axis=2, keepdims=False)
        new_bufs.append(
            jax.lax.dynamic_update_index_in_dim(buf, x, ptr, axis=2)
        )
        xin = jnp.concatenate([x_prev.astype(dtype), x.astype(dtype), cond_t], axis=1)
        y = jnp.einsum("oc,bc->bo", packed["w_in"][i], xin,
                       preferred_element_type=jnp.float32) + packed["b_in"][i]
        f, g = jnp.split(y, 2, axis=1)
        h = (jnp.tanh(f) * jax.nn.sigmoid(g)).astype(dtype)
        rs = jnp.einsum("oc,bc->bo", packed["w_out"][i], h,
                        preferred_element_type=jnp.float32) + packed["b_out"][i]
        res, s = rs[:, : cfg.n_res], rs[:, cfg.n_res :]
        skip = s if skip is None else skip + s
        x = x + res  # f32 residual stream

    h = jax.nn.relu(skip).astype(dtype)
    h = jax.nn.relu(
        jnp.einsum("oc,bc->bo", packed["post1_w"], h,
                   preferred_element_type=jnp.float32) + packed["post1_b"]
    ).astype(dtype)
    logits = jnp.einsum("oc,bc->bo", packed["post2_w"], h,
                        preferred_element_type=jnp.float32) + packed["post2_b"]
    return tuple(new_bufs), logits


def _with_gc(params, cfg: WaveNetConfig, cond: jax.Array, gc_ids) -> jax.Array:
    """Append the (time-constant) speaker embedding to cond channels.
    cond: [B, n_lc_out, T] -> [B, n_lc_out + n_ge, T]."""
    b, _, t = cond.shape
    if gc_ids is None:
        g = jnp.zeros((b, cfg.n_global_embed), cond.dtype)
    else:
        g = jnp.take(params["gc_embed"], gc_ids, axis=0)
    g = jnp.broadcast_to(g[:, :, None], (b, cfg.n_global_embed, t))
    return jnp.concatenate([cond, g.astype(cond.dtype)], axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "dtype", "return_logits"))
def prime(params, cfg: WaveNetConfig, state: GenState, ids: jax.Array,
          cond: jax.Array, gc_ids=None, dtype=jnp.float32,
          return_logits: bool = False):
    """Warm the queues with known samples (teacher context).

    ids: [B, T0] real samples at positions [t, t+T0).  The first T0-1 are
    consumed through the stack (their logits discarded); the LAST one is
    left as ``prev_id`` so the next :func:`generate` step consumes it —
    emitting the sample at position t+T0.  cond: [B, n_lc_out, >= T0-1]
    columns for the consumed positions.
    """
    t0 = ids.shape[-1]
    cond = _with_gc(params, cfg, cond[..., : t0 - 1], gc_ids)
    cond_tm = jnp.transpose(cond, (2, 0, 1))  # time-major [T0-1, B, C]
    packed = pack_params(params, cfg, dtype)

    def body(st, xs):
        x_id, c = xs
        bufs, logits = _cell(packed, cfg, st, x_id, c, dtype)
        return GenState(bufs, x_id, st.t + 1), (logits if return_logits else None)

    ids_tm = jnp.transpose(ids[..., : t0 - 1], (1, 0))
    out, ys = jax.lax.scan(body, state, (ids_tm, cond_tm))
    out = GenState(out.bufs, ids[..., -1], out.t)
    if return_logits:
        return out, jnp.transpose(ys, (1, 2, 0))  # [B, n_quant, T0-1]
    return out


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "dtype", "temperature",
                     "return_logits"),
)
def generate(params, cfg: WaveNetConfig, state: GenState, cond: jax.Array,
             rng: jax.Array, gc_ids=None, n_steps: int | None = None,
             temperature: float = 1.0, dtype=jnp.float32,
             return_logits: bool = False):
    """Sample ``n_steps`` (default cond length) mu-law ids autoregressively.

    cond: [B, n_lc_out, T] — column p conditions the step that consumes the
    sample at position p (same lattice as training).  Returns (ids [B, T],
    final state); with ``return_logits`` also the per-step logits
    [B, n_quant, T] (the free-running predictive distributions — the
    quality metrics in eval/quality score ground truth under them)."""
    t_len = cond.shape[-1] if n_steps is None else n_steps
    if t_len > cond.shape[-1]:
        raise ValueError(
            f"n_steps={t_len} exceeds the {cond.shape[-1]} conditioning "
            f"columns provided"
        )
    cond = _with_gc(params, cfg, cond[..., :t_len], gc_ids)
    cond_tm = jnp.transpose(cond, (2, 0, 1))
    packed = pack_params(params, cfg, dtype)

    def body(carry, c):
        st, key = carry
        key, sub = jax.random.split(key)
        bufs, logits = _cell(packed, cfg, st, st.prev_id, c, dtype)
        if temperature == 0.0:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
            nxt = nxt.astype(jnp.int32)
        return (GenState(bufs, nxt, st.t + 1),
                key), (nxt, logits if return_logits else None)

    (final, _), (ids_tm, lg_tm) = jax.lax.scan(body, (state, rng), cond_tm)
    ids = jnp.transpose(ids_tm, (1, 0))
    if return_logits:
        return ids, final, jnp.transpose(lg_tm, (1, 2, 0))
    return ids, final


# --------------------------------------------------------------- naive oracle

def generate_naive(params, cfg: WaveNetConfig, ctx_ids: jax.Array,
                   cond: jax.Array, rng: jax.Array, gc_ids=None,
                   n_steps: int = 16, temperature: float = 1.0):
    """Reference-style O(R)/sample sampler (SURVEY.md §3.4): re-runs the full
    teacher-forcing stack per emitted sample.  Test oracle only.

    ctx_ids: [B, rf+1] the last rf+1 consumed samples (positions t-rf-1..t-1
    inclusive of the sample about to be consumed at the front... precisely:
    window of AR inputs such that apply() emits exactly 1 logit column).
    cond: [B, n_lc_out, rf+1+n_steps] columns aligned with the consumed
    inputs (same lattice as training)."""
    from ae_wavenet_tpu.models import wavenet as wn

    rf = wn.receptive_field(cfg)
    assert ctx_ids.shape[-1] == rf + 1
    ids = ctx_ids
    out = []
    for j in range(n_steps):
        window_cond = cond[..., j : j + rf + 1]
        logits = wn.apply(params, cfg, ids[..., -(rf + 1):], window_cond, gc_ids)
        rng, sub = jax.random.split(rng)
        if temperature == 0.0:
            nxt = jnp.argmax(logits[..., -1], axis=1).astype(jnp.int32)
        else:
            nxt = jax.random.categorical(sub, logits[..., -1] / temperature, axis=1)
            nxt = nxt.astype(jnp.int32)
        out.append(nxt)
        ids = jnp.concatenate([ids, nxt[:, None]], axis=-1)
    return jnp.stack(out, axis=1)

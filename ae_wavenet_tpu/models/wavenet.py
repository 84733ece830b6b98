"""Autoregressive WaveNet decoder with local + global conditioning.

Rebuild of the reference ``wavenet.py`` [H] (SURVEY.md §2.1, §3.3):
dilated causal conv stack (k=2, dilations 1..2^(n-1) over n_blocks blocks),
gated tanh/sigma units with conditioning added into both gates, residual +
skip connections, 2-layer ReLU post-net, 256-way mu-law softmax.

TPU-first redesign
------------------
* Every dilated k=2 "conv" is expressed as TWO 1x1 contractions on shifted
  views (``W_prev @ x[..., :-d] + W_cur @ x[..., d:]``): pure MXU matmuls,
  no im2col, no conv lowering.  The stack is causal by construction — VALID
  slicing only, each layer trims ``d`` samples from the left; alignment is
  static and comes from the geometry chain (:func:`dilated_geometry`).
* Local conditioning is upsampled 50 Hz -> 16 kHz by a stack of transposed
  convs (:func:`upsample_apply`) whose edge trims are planned by
  ``geometry.vconv`` — sample-exact alignment with the wav lattice.
* Global conditioning (speaker embedding) is broadcast over time and
  concatenated to the local conditioning channels; one per-layer projection
  feeds both into the gates.
* Compute dtype is configurable (bfloat16 matmuls, float32 accumulation via
  ``preferred_element_type``); parameters stay float32.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.geometry.vconv import Chain, Conv, PlanStep, Range, TConv
from ae_wavenet_tpu.ops.conv1d import tconv1d
from ae_wavenet_tpu.utils.config import WaveNetConfig


# ------------------------------------------------------------------ geometry

def dilated_geometry(cfg: WaveNetConfig) -> Chain:
    """Causal dilated stack as a chain (footprint per layer = Conv(k, dil))."""
    return Chain(
        [Conv(cfg.filter_sz, dilation=d, name=f"dil{i}")
         for i, d in enumerate(cfg.dilations)]
    )


def receptive_field(cfg: WaveNetConfig) -> int:
    """Left context consumed by the stack (input samples beyond each output)."""
    return (cfg.filter_sz - 1) * sum(cfg.dilations)


def upsample_geometry(cfg: WaveNetConfig) -> Chain:
    return Chain(
        [TConv(f, stride=s, name=f"up{i}")
         for i, (f, s) in enumerate(zip(cfg.lc_upsample_filters, cfg.lc_upsample_strides))]
    )


# ---------------------------------------------------------------------- init

def _dense(key, cout, cin, scale=None):
    scale = scale if scale is not None else (1.0 / jnp.sqrt(cin))
    return {
        "w": jax.random.normal(key, (cout, cin), jnp.float32) * scale,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def init(key: jax.Array, cfg: WaveNetConfig, n_lc_in: int | None = None) -> dict:
    """n_lc_in: channels of the raw local-conditioning input (defaults to
    cfg.n_lc_in; the MFCC inverter passes 3*n_mfcc)."""
    n_lc_in = cfg.n_lc_in if n_lc_in is None else n_lc_in
    keys = iter(jax.random.split(key, 16 + 8 * len(cfg.dilations)))
    params: dict = {}
    params["embed"] = (
        jax.random.normal(next(keys), (cfg.n_quant, cfg.n_res), jnp.float32)
        * (1.0 / jnp.sqrt(cfg.n_res))
    )
    params["gc_embed"] = (
        jax.random.normal(next(keys), (cfg.n_speakers, cfg.n_global_embed), jnp.float32)
        * (1.0 / jnp.sqrt(cfg.n_global_embed))
    )
    ups = []
    cin = n_lc_in
    for f in cfg.lc_upsample_filters:
        k = next(keys)
        scale = 1.0 / jnp.sqrt(cin * f)
        ups.append({
            "w": jax.random.normal(k, (cfg.n_lc_out, cin, f), jnp.float32) * scale,
            "b": jnp.zeros((cfg.n_lc_out,), jnp.float32),
        })
        cin = cfg.n_lc_out
    params["upsample"] = ups

    n_cond = cfg.n_lc_out + cfg.n_global_embed
    layers = []
    for _ in cfg.dilations:
        layers.append({
            "w_prev": _dense(next(keys), 2 * cfg.n_dil, cfg.n_res),
            "w_cur": _dense(next(keys), 2 * cfg.n_dil, cfg.n_res),
            "w_cond": _dense(next(keys), 2 * cfg.n_dil, n_cond),
            "w_res": _dense(next(keys), cfg.n_res, cfg.n_dil),
            "w_skip": _dense(next(keys), cfg.n_skp, cfg.n_dil),
        })
    params["layers"] = layers
    params["post1"] = _dense(next(keys), cfg.n_post, cfg.n_skp)
    params["post2"] = _dense(next(keys), cfg.n_quant, cfg.n_post, scale=1e-2)
    return params


# --------------------------------------------------------------------- apply

def _mm(p: dict, x: jax.Array, dtype) -> jax.Array:
    """1x1 'conv': [B, Cin, T] @ [Cout, Cin] -> [B, Cout, T].

    The MXU accumulates in f32 internally regardless; emitting the result in
    the compute dtype (bf16) halves the HBM traffic of every intermediate —
    the train step is bandwidth-bound on these [B, C, T] tensors, not
    FLOP-bound."""
    y = jnp.einsum(
        "oc,bct->bot", p["w"].astype(dtype), x.astype(dtype),
        preferred_element_type=dtype,
    )
    return y + p["b"][None, :, None].astype(dtype)


def upsample_apply(
    params: dict,
    cfg: WaveNetConfig,
    z: jax.Array,
    steps: Sequence[PlanStep] | None = None,
    *,
    dtype=jnp.float32,
) -> jax.Array:
    """z: [B, C, Tz] latents -> [B, n_lc_out, T] wav-rate conditioning.

    ``steps``: geometry plan for the upsample chain (static trims).  When
    None, all complete output positions are returned (generation path trims
    separately)."""
    x = z
    ups = params["upsample"] if isinstance(params, dict) and "upsample" in params else params
    for i, p in enumerate(ups):
        x = tconv1d(
            x.astype(dtype), p["w"].astype(dtype), p["b"],
            stride=cfg.lc_upsample_strides[i],
        )
        x = jax.nn.relu(x)
        if steps is not None:
            st = steps[i]
            x = x[..., st.trim_l : st.trim_l + st.keep]
    return x


def apply(
    params: dict,
    cfg: WaveNetConfig,
    x_ids: jax.Array,      # [B, T_in] mu-law ids (teacher forcing inputs)
    cond: jax.Array,       # [B, n_lc_out, T_in] wav-rate local conditioning
    gc_ids: jax.Array | None = None,  # [B] speaker ids
    *,
    dtype=jnp.float32,
    btq: bool = False,
) -> jax.Array:
    """Teacher-forcing forward: logits [B, n_quant, T_in - receptive_field].

    Position contract: input position p holds sample x[p]; output position j
    of the stack corresponds to input position j + RF and predicts x[j+RF+1]
    (the caller shifts targets; see autoencoder.WindowSpec).

    btq: return logits time-major [B, T_out, n_quant] instead — the fused
    Pallas stack's native layout, letting the loss skip a [B, Q, T]
    transpose (models/common.mu_ce consumes either layout)."""
    if cfg.filter_sz != 2:
        raise NotImplementedError("the two-tap matmul path requires filter_sz=2")
    rf = receptive_field(cfg)
    t_in = x_ids.shape[-1]
    t_out = t_in - rf

    if cfg.use_pallas_stack and dtype == jnp.bfloat16:
        from ae_wavenet_tpu.ops import gated_pallas as gp

        if (gp.supports_pallas_stack(cfg, t_in)
                and jax.devices()[0].platform == "tpu"):
            return gp.stack_apply(params, cfg, x_ids, cond, gc_ids, btq=btq)

    x = jnp.take(params["embed"], x_ids, axis=0)  # [B, T, n_res]
    # residual stream runs in the compute dtype: the [B, n_res, T] tensor is
    # read twice per layer, so bf16 halves the dominant HBM traffic
    x = jnp.transpose(x, (0, 2, 1)).astype(dtype)

    if gc_ids is not None:
        g = jnp.take(params["gc_embed"], gc_ids, axis=0)  # [B, n_ge]
        g = jnp.broadcast_to(g[:, :, None], (g.shape[0], g.shape[1], t_in))
        cond = jnp.concatenate([cond, g.astype(cond.dtype)], axis=1)
    else:
        pad = jnp.zeros((cond.shape[0], cfg.n_global_embed, t_in), cond.dtype)
        cond = jnp.concatenate([cond, pad], axis=1)

    # NOTE on structure: the straightforward per-layer form below (two tap
    # matmuls on sliced inputs + separate cond/res/skip 1x1s) measured
    # FASTER on v5e than a "fewer, bigger GEMMs" restructuring that merged
    # the taps / res+skip and sliced the (larger) outputs — the output-slice
    # copies cost more than the saved GEMM dispatches (542k vs 452k
    # samples/s/chip on the flagship bench).  Keep this shape.
    skip = jnp.zeros((x.shape[0], cfg.n_skp, t_out), jnp.float32)
    offset = 0  # left trim consumed so far
    for i, d in enumerate(cfg.dilations):
        p = params["layers"][i]
        dd = d * (cfg.filter_sz - 1)
        cur = x[..., dd:]
        prev = x[..., : x.shape[-1] - dd]
        y = _mm(p["w_prev"], prev, dtype) + _mm(p["w_cur"], cur, dtype)
        offset += dd
        y = y + _mm(p["w_cond"], cond[..., offset : t_in], dtype)
        f, g_ = jnp.split(y, 2, axis=1)
        h = jnp.tanh(f) * jax.nn.sigmoid(g_)
        x = cur + _mm(p["w_res"], h, dtype)
        skip = skip + _mm(p["w_skip"], h[..., h.shape[-1] - t_out :], dtype)

    h = jax.nn.relu(skip)
    h = jax.nn.relu(_mm(params["post1"], h, dtype))
    logits = _mm(params["post2"], h, dtype)
    if btq:
        return jnp.transpose(logits, (0, 2, 1))
    return logits

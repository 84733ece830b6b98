"""Chorowski-style MFCC encoder (rebuild of reference ``encoder.py`` [M],
SURVEY.md §2.1): stacked 1-D convs with residual pairs, one stride-2
downsampling conv, linear head to the bottleneck dimension.

TPU-first details: all convs are VALID (window sizing + trimming come from
the geometry chain, so shapes are static under jit); channels-second NCW
layout keeps time on the 128-lane axis; matmul-shaped 1x1 convs hit the MXU.

Pure-functional: ``init`` builds a parameter pytree, ``apply`` is a jittable
function of (params, cfg, x).  The layer structure is mirrored exactly by
:func:`geometry` — input frames [0, N) map to latents
[0, geometry(cfg).out_len(N)) with zero trim (all layers are
exact-achieving Convs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.geometry.vconv import Chain, Conv
from ae_wavenet_tpu.ops.conv1d import conv1d
from ae_wavenet_tpu.utils.config import EncoderConfig


def geometry(cfg: EncoderConfig) -> Chain:
    layers = []
    for i in range(cfg.n_pre_res):
        layers += [Conv(3, name=f"pre{i}a"), Conv(3, name=f"pre{i}b")]
    layers.append(Conv(cfg.down_filter, stride=cfg.down_stride, name="down"))
    for i in range(cfg.n_post_res):
        layers += [Conv(3, name=f"post{i}a"), Conv(3, name=f"post{i}b")]
    layers.append(Conv(1, name="head"))
    return Chain(layers)


def _conv_init(key, cout, cin, f):
    # He init for ReLU stacks
    scale = jnp.sqrt(2.0 / (cin * f))
    return {
        "w": jax.random.normal(key, (cout, cin, f), jnp.float32) * scale,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _ln_init(c):
    return {"g": jnp.ones((c,), jnp.float32), "o": jnp.zeros((c,), jnp.float32)}


def _ln(p, x):
    """Channel LayerNorm at each (batch, time) position: keeps the ReLU
    stack alive (a plain deep ReLU conv stack under VQ commitment pressure
    measurably collapses to all-dead units -> constant latents)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    return xn * p["g"][None, :, None] + p["o"][None, :, None]


def init(key: jax.Array, cfg: EncoderConfig) -> dict:
    keys = iter(jax.random.split(key, 64))
    params: dict = {"pre": [], "post": []}
    c = cfg.n_ch
    params["stem"] = _conv_init(next(keys), c, cfg.n_in, 1)
    for _ in range(cfg.n_pre_res):
        params["pre"].append(
            {"a": _conv_init(next(keys), c, c, 3),
             "b": _conv_init(next(keys), c, c, 3),
             "ln": _ln_init(c)}
        )
    params["down"] = _conv_init(next(keys), c, c, cfg.down_filter)
    params["down_ln"] = _ln_init(c)
    for _ in range(cfg.n_post_res):
        params["post"].append(
            {"a": _conv_init(next(keys), c, c, 3),
             "b": _conv_init(next(keys), c, c, 3),
             "ln": _ln_init(c)}
        )
    params["head"] = _conv_init(next(keys), cfg.n_out, c, 1)
    return params


def _res_pair(p: dict, x: jax.Array, dtype) -> jax.Array:
    """Two k=3 VALID convs with ReLU, residual added on the trimmed center,
    channel-LayerNormed."""
    h = jax.nn.relu(conv1d(x.astype(dtype), p["a"]["w"].astype(dtype), p["a"]["b"]))
    h = conv1d(h.astype(dtype), p["b"]["w"].astype(dtype), p["b"]["b"])
    y = jax.nn.relu(x[..., 2:-2] + h)
    return _ln(p["ln"], y.astype(jnp.float32)).astype(y.dtype)


def apply(params: dict, cfg: EncoderConfig, x: jax.Array, *, dtype=jnp.float32) -> jax.Array:
    """x: [B, n_in, F] MFCC stack -> latents [B, n_out, Tz].

    Tz = geometry(cfg).out_len(F); no trims needed by callers (all-Conv
    chain is exact-achieving).
    """
    x = conv1d(x.astype(dtype), params["stem"]["w"].astype(dtype), params["stem"]["b"])
    x = jax.nn.relu(x)
    for p in params["pre"]:
        x = _res_pair(p, x, dtype)
    x = jax.nn.relu(
        conv1d(x.astype(dtype), params["down"]["w"].astype(dtype), params["down"]["b"],
               stride=cfg.down_stride)
    )
    x = _ln(params["down_ln"], x.astype(jnp.float32)).astype(x.dtype)
    for p in params["post"]:
        x = _res_pair(p, x, dtype)
    z = conv1d(x.astype(dtype), params["head"]["w"].astype(dtype), params["head"]["b"])
    return z.astype(jnp.float32)

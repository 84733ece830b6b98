"""Mu-law companding codec (μ=255, 256 classes by default).

Rebuild of the reference's mu-law helpers (SURVEY.md §2.1 "mu-law codec",
reference ``util.py``).  Provided both as numpy (host preprocessing) and as
jittable jax functions (the on-device fused frontend computes teacher-forcing
targets from raw int16 wav inside the train step, per the north-star design).

Correctness contract (BASELINE.md): exact round-trip on the decodable set —
``encode(decode(q)) == q`` for every quantization id ``q``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _check(n_quant: int):
    if n_quant < 2 or n_quant % 2:
        raise ValueError(f"n_quant must be even and >= 2, got {n_quant}")


# ---------------------------------------------------------------- numpy ----

def mu_encode_np(x: np.ndarray, n_quant: int = 256) -> np.ndarray:
    """float wav in [-1, 1] -> int32 ids in [0, n_quant)."""
    _check(n_quant)
    mu = float(n_quant - 1)
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    return np.clip(np.rint((y + 1.0) / 2.0 * mu), 0, mu).astype(np.int32)


def mu_decode_np(q: np.ndarray, n_quant: int = 256) -> np.ndarray:
    """int ids in [0, n_quant) -> float wav in [-1, 1]."""
    _check(n_quant)
    mu = float(n_quant - 1)
    y = 2.0 * q.astype(np.float64) / mu - 1.0
    return (np.sign(y) * (np.expm1(np.abs(y) * np.log1p(mu))) / mu).astype(
        np.float32
    )


# ------------------------------------------------------------------ jax ----

def mu_encode(x: jax.Array, n_quant: int = 256) -> jax.Array:
    """Jittable mu-law encode: float wav in [-1, 1] -> int32 ids."""
    _check(n_quant)
    mu = float(n_quant - 1)
    x = jnp.clip(x, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) * (1.0 / np.log1p(mu))
    q = jnp.round((y + 1.0) * (0.5 * mu))
    return jnp.clip(q, 0, mu).astype(jnp.int32)


def mu_decode(q: jax.Array, n_quant: int = 256) -> jax.Array:
    """Jittable mu-law decode: int ids -> float32 wav in [-1, 1]."""
    _check(n_quant)
    mu = float(n_quant - 1)
    y = 2.0 * q.astype(jnp.float32) / mu - 1.0
    return jnp.sign(y) * jnp.expm1(jnp.abs(y) * np.log1p(mu)) / mu


def int16_to_float(x: jax.Array) -> jax.Array:
    """Raw int16 PCM -> float32 in [-1, 1] (on-device input stage)."""
    return x.astype(jnp.float32) * (1.0 / 32768.0)

"""Fused VQ nearest-neighbor kernel (Pallas, TPU).

North-star item (BASELINE.json): the VQ bottleneck's distance / argmin /
lookup / EMA-statistics pipeline runs as ONE device kernel.  The XLA
formulation in models/bottlenecks.py materializes the [N, K] distance matrix
and the [N, K] one-hot matrix through HBM; this kernel keeps both in VMEM
per tile and emits only:

    codes   [N]     — nearest codebook indices
    quant   [N, D]  — codebook rows (the lookup, computed as onehot @ E)
    counts  [K]     — sum of one-hots     (EMA count statistic)
    sums    [K, D]  — onehot^T @ z        (EMA sum statistic)

Distances use the MXU (-2 z E^T plus norms); argmin/one-hot are VPU ops;
counts/sums accumulate across the N-tile grid in VMEM outputs (TPU grid
iterations are sequential, so accumulation is race-free).

Used by models/bottlenecks.py when ``use_pallas`` is on; the XLA path is the
fallback and the correctness oracle (tests/test_vq_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(z_ref, e_ref, en2_ref, codes_ref, quant_ref, counts_ref, sums_ref):
    i = pl.program_id(0)
    z = z_ref[:]                 # [TN, D]
    e = e_ref[:]                 # [K, D]
    # squared distance: |z|^2 - 2 z.E^T + |e|^2 ; |z|^2 constant per row for
    # the argmin, so skip it.
    cross = jnp.dot(z, e.T, preferred_element_type=jnp.float32)   # [TN, K] MXU
    d2 = en2_ref[:] - 2.0 * cross                                  # [TN, K]
    codes = jnp.argmin(d2, axis=1)                                 # [TN]
    k = e.shape[0]
    onehot = (
        codes[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    ).astype(jnp.float32)                                          # [TN, K]
    codes_ref[:] = codes.astype(jnp.int32)[:, None]
    # HIGHEST precision: default MXU f32 matmul truncates inputs to bf16,
    # but the lookup must return the codebook rows exactly (one-hot select)
    quant_ref[:] = jnp.dot(
        onehot, e, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(i == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        sums_ref[:] = jnp.zeros_like(sums_ref)

    counts_ref[:] += jnp.sum(onehot, axis=0, keepdims=True)
    sums_ref[:] += jnp.dot(
        onehot.T, z, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def vq_lookup_fused(
    z: jax.Array,          # [N, D] float32 flattened latents
    codebook: jax.Array,   # [K, D] float32
    tile_n: int = 512,
    interpret: bool = False,
):
    """-> (codes [N] int32, quant [N, D], counts [K], sums [K, D])."""
    n, d = z.shape
    k = codebook.shape[0]
    pad = (-n) % tile_n
    z_p = jnp.pad(z, ((0, pad), (0, 0))) if pad else z
    np_ = n + pad
    en2 = jnp.sum(jnp.square(codebook), axis=1)[None, :]  # [1, K]

    grid = (np_ // tile_n,)
    codes, quant, counts, sums = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 1), jnp.int32),
            jax.ShapeDtypeStruct((np_, d), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((k, d), jnp.float32),
        ],
        interpret=interpret,
    )(z_p, codebook, en2)
    codes = codes[:n, 0]
    quant = quant[:n]
    if pad:
        # padded rows are z=0: they vote for argmin(|e|^2) and add nothing to
        # sums; remove their phantom counts.
        pad_code = jnp.argmin(en2[0])
        counts = counts.at[0, pad_code].add(-float(pad))
    return codes, quant, counts[0], sums
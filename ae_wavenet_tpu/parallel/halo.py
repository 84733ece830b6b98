"""Sequence parallelism for dilated causal convs: halo exchange over a mesh.

SURVEY.md §5 "Long-context / sequence handling": the reference trains long
audio by windowed slicing (no sequence parallelism of any kind — there is no
attention; the model is convolutional).  The TPU-native analogue of context
parallelism for a conv stack is to shard the TIME axis over a mesh axis and
exchange receptive-field halos between neighboring shards with
``lax.ppermute`` — each dilated layer needs only its left context
(``(filter_sz-1)*dilation`` samples) from the previous shard, so the
communication per layer is tiny and rides the ICI ring.

This module provides the primitive (:func:`halo_left`), a sequence-parallel
causal dilated conv (:func:`sp_dilated_conv`), and a sequence-parallel gated
WaveNet stack forward (:func:`sp_wavenet_stack`) demonstrating end-to-end
sharded teacher-forcing.  Semantics: the GLOBAL computation is a causal conv
with zero left-padding (shard 0 receives zeros), so outputs align 1:1 with
inputs; equivalence vs the single-device computation is exact
(tests/test_halo.py).

Not required for parity with the reference (windowed training keeps memory
O(window)); this is the scaling path for very long windows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ae_wavenet_tpu.ops.conv1d import conv1d


def halo_left(x: jax.Array, n: int, axis_name: str) -> jax.Array:
    """Return the last ``n`` time columns of the LEFT neighbor's shard
    (zeros on shard 0).  x: [..., T_local]."""
    if n > x.shape[-1]:
        raise ValueError(
            f"halo of {n} exceeds local shard length {x.shape[-1]}; each "
            f"shard must hold at least (filter_sz-1)*max_dilation samples"
        )
    size = lax.axis_size(axis_name)
    tail = x[..., -n:]
    perm = [(i, i + 1) for i in range(size - 1)]  # shard i -> i+1
    halo = lax.ppermute(tail, axis_name, perm)    # shard 0 receives zeros
    return halo


def sp_dilated_conv(
    x: jax.Array, w: jax.Array, b: jax.Array | None, dilation: int,
    axis_name: str,
) -> jax.Array:
    """Causal dilated conv on a time-sharded tensor: [B, C, T_loc] ->
    [B, Cout, T_loc]; global semantics = zero-left-padded causal conv."""
    span = (w.shape[-1] - 1) * dilation
    if span == 0:
        return conv1d(x, w, b)
    halo = halo_left(x, span, axis_name)
    return conv1d(jnp.concatenate([halo, x], axis=-1), w, b, dilation=dilation)


def sp_wavenet_stack(
    params: dict, dilations, x: jax.Array, cond: jax.Array, axis_name: str,
    *, dtype=jnp.float32,
):
    """Sequence-parallel gated WaveNet stack (teacher-forcing forward).

    x: [B, n_res, T_loc] residual-stream input (embedded samples);
    cond: [B, n_cond, T_loc] conditioning, both sharded on T.
    Returns skip sum [B, n_skp, T_loc].  Uses the same parameter pytree as
    models.wavenet layers.
    """
    skip = None
    for i, d in enumerate(dilations):
        p = params["layers"][i]
        w2 = jnp.stack([p["w_prev"]["w"], p["w_cur"]["w"]], axis=-1)  # [O,C,2]
        y = sp_dilated_conv(
            x.astype(dtype), w2.astype(dtype),
            (p["w_prev"]["b"] + p["w_cur"]["b"]), d, axis_name,
        )
        y = y + jnp.einsum(
            "oc,bct->bot", p["w_cond"]["w"].astype(dtype), cond.astype(dtype),
            preferred_element_type=jnp.float32,
        ) + p["w_cond"]["b"][None, :, None]
        f, g = jnp.split(y, 2, axis=1)
        h = jnp.tanh(f) * jax.nn.sigmoid(g)
        res = jnp.einsum("oc,bct->bot", p["w_res"]["w"].astype(dtype),
                         h.astype(dtype), preferred_element_type=jnp.float32)
        s = jnp.einsum("oc,bct->bot", p["w_skip"]["w"].astype(dtype),
                       h.astype(dtype), preferred_element_type=jnp.float32)
        s = s + p["w_skip"]["b"][None, :, None]
        x = x + res + p["w_res"]["b"][None, :, None]
        skip = s if skip is None else skip + s
    return skip


def make_sp_forward(params: dict, dilations, mesh: Mesh, axis_name: str = "seq"):
    """Wrap sp_wavenet_stack in shard_map over ``mesh[axis_name]``; takes
    GLOBAL [B, C, T] tensors (T divisible by the axis size) and returns the
    global skip tensor."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis_name), P(None, None, axis_name)),
        out_specs=P(None, None, axis_name),
    )
    def fwd(x, cond):
        return sp_wavenet_stack(params, dilations, x, cond, axis_name)

    return fwd

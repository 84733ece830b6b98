"""1-D convolution primitives matching the geometry conventions of
:mod:`ae_wavenet_tpu.geometry.vconv`.

All tensors are NCW (batch, channels, time) — channels-second keeps the time
axis last, which is the 128-lane axis on TPU and lets XLA tile the convs onto
the MXU.  Everything here is VALID (no implicit padding): window sizing and
trimming are decided by the geometry layer at config time, so shapes are
static under jit.

Rebuild counterpart of the reference's use of ``torch.nn.Conv1d`` /
``ConvTranspose1d`` inside ``wavenet.py`` / ``encoder.py`` (SURVEY.md §2.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# dimension_numbers for NCW activations, OIW kernels.
_DN = lax.conv_dimension_numbers((1, 1, 1), (1, 1, 1), ("NCH", "OIH", "NCH"))


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """VALID 1-D conv. x: [B, Cin, T], w: [Cout, Cin, F] -> [B, Cout, T'].

    Geometry: ``vconv.Conv(filter_sz=F, stride=stride, dilation=dilation)``.
    """
    # NOTE: output dtype follows the input dtype (no preferred_element_type
    # upcast): the TPU MXU accumulates bf16 convs in f32 internally, and an
    # explicit f32 upcast here breaks the conv VJP (the transpose rule would
    # pair an f32 cotangent with bf16 weights, which lax rejects).
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
    )
    if b is not None:
        y = y + b[None, :, None].astype(y.dtype)
    return y


def tconv1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int,
) -> jax.Array:
    """Transposed 1-D conv returning only COMPLETE output positions.

    x: [B, Cin, T], w: [Cout, Cin, F] -> [B, Cout, (T-1)*stride + 1 - (F-1)].

    Implemented as zero-stuffing + full conv; the ragged edges (positions
    missing filter taps) are sliced off per
    ``vconv.TConv.full_to_complete`` so the output lattice matches the
    geometry layer ``vconv.TConv(filter_sz=F, stride=stride)`` exactly.
    """
    f = w.shape[-1]
    # lhs_dilation zero-stuffs x: fine lattice length (T-1)*stride + 1, then
    # pad (f-1) on both sides => FULL conv; slice to the complete range.
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(f - 1, f - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
    )
    y = y[..., (f - 1) : y.shape[-1] - (f - 1)]
    if b is not None:
        y = y + b[None, :, None].astype(y.dtype)
    return y

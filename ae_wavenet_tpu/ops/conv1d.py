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

    When F is a multiple of the stride (every shipped upsampler config:
    filters default to 2*stride), the op is computed PHASE-DECOMPOSED: each
    of the ``stride`` output phases touches exactly F/stride filter taps,
    so it becomes F/stride shifted [B, Cin, N] @ [Cin, Cout] matmuls per
    phase, then an interleave — no zero-stuffing, so the MXU does no
    multiplies against stuffed zeros (the ``lhs_dilation`` lowering wastes
    (stride-1)/stride of its FLOPs on them).  Otherwise falls back to
    zero-stuffing + full conv.  Both paths slice the ragged edges per
    ``vconv.TConv.full_to_complete`` so the output lattice matches the
    geometry layer ``vconv.TConv(filter_sz=F, stride=stride)`` exactly.
    """
    f = w.shape[-1]
    if stride > 1 and f % stride == 0:
        return _tconv1d_phased(x, w, b, stride=stride)
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


def _tconv1d_phased(x, w, b, *, stride: int):
    """Phase decomposition of :func:`tconv1d` for F = m * stride.

    lax's conv is a correlation, so the complete-range output index obeys
    u = j*stride - k (input j, tap k; verified against delta probes of the
    zero-stuffing oracle in tests/test_conv1d.py): phase p = u mod stride
    touches exactly the taps k = (stride - p) % stride + i*stride,
    i in [0, m), read from x at j = n + i (p == 0) / n + 1 + i (p > 0) —
    m shifted [B, Cin, N] slices, each hitting one [Cout, Cin] tap
    matrix."""
    s = stride
    f = w.shape[-1]
    m = f // s
    bsz, _cin, t = x.shape
    cout = w.shape[0]
    length = (t - 1) * s + 1 - (f - 1)
    n_max = [(length - 1 - p) // s for p in range(s)]
    n_all = max(n_max) + 1
    phases = []
    for p in range(s):
        k0 = (s - p) % s
        base = 0 if p == 0 else 1
        n_p = n_max[p] + 1
        acc = None
        for i in range(m):
            a = base + i
            xs = lax.slice_in_dim(x, a, a + n_p, axis=2)
            term = jnp.einsum("oc,bct->bot", w[:, :, k0 + i * s], xs)
            acc = term if acc is None else acc + term
        if n_p < n_all:
            acc = jnp.pad(acc, ((0, 0), (0, 0), (0, n_all - n_p)))
        phases.append(acc)
    y = jnp.stack(phases, axis=-1).reshape(bsz, cout, n_all * s)
    y = y[..., :length]
    if b is not None:
        y = y + b[None, :, None].astype(y.dtype)
    return y

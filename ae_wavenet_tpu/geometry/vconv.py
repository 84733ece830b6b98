"""Virtual-convolution geometry: exact coordinate bookkeeping for conv stacks.

This is the TPU-native rebuild of the reference's ``vconv.py`` (the
distinctive infrastructure piece of hrbigelow/ae-wavenet — see SURVEY.md §2.1
"Virtual-conv geometry").  The reference uses it to (a) size data-loader
windows including the receptive field and (b) trim tensors so wav targets
align sample-exactly with upsampled conditioning.

Design difference from the reference: the reference threads VirtualConv
objects through its nn.Modules and computes ranges at runtime.  Here ALL
geometry is resolved at **config time** into plain Python integers, so the
jitted train step contains only static slices — XLA sees fixed shapes and
never recompiles.  Layers are declarative specs; a :class:`Chain` composes
them and answers range queries in either direction.

Coordinate conventions
----------------------
* All ranges are half-open ``[b, e)`` on the integer lattice of a layer's
  input or output.
* A layer's *output* contains only **complete** positions — positions whose
  every filter tap lands on a real input sample (padding taps count as real).
  For strided transposed convs this means the ragged edges (positions that
  would receive fewer than the full tap count) are excluded; the tensor
  implementation must slice them off, and :meth:`TConv.full_to_complete`
  gives the offset.
* ``in_range(ob, oe)``: minimal input range needed to compute outputs
  ``[ob, oe)`` exactly.
* ``out_range(ib, ie)``: maximal output range computable from inputs
  ``[ib, ie)`` alone (plus edge padding when the range touches an edge).

Every formula is property-tested against a brute-force dependency oracle
built from actual jax convolutions (tests/test_vconv.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class Range:
    """Half-open integer range [b, e)."""

    b: int
    e: int

    def __post_init__(self):
        if self.e < self.b:
            raise ValueError(f"empty-or-negative range [{self.b}, {self.e})")

    def __len__(self) -> int:
        return self.e - self.b

    def shift(self, k: int) -> "Range":
        return Range(self.b + k, self.e + k)

    def union(self, other: "Range") -> "Range":
        return Range(min(self.b, other.b), max(self.e, other.e))

    def intersect(self, other: "Range") -> "Range":
        b, e = max(self.b, other.b), min(self.e, other.e)
        return Range(b, max(b, e))

    def contains(self, other: "Range") -> bool:
        return self.b <= other.b and other.e <= self.e

    def as_tuple(self) -> Tuple[int, int]:
        return (self.b, self.e)


@dataclasses.dataclass(frozen=True)
class Conv:
    """Strided (possibly dilated) convolution, VALID with optional edge pads.

    Output position ``o`` reads input positions
    ``{o*stride - pad_l + k*dilation : k in [0, filter_sz)}``; the bounding
    footprint is ``[o*stride - pad_l, o*stride - pad_l + span)`` with
    ``span = (filter_sz - 1) * dilation + 1``.  Pad taps are virtual inputs
    hanging off the array edges (e.g. librosa-style centered framing).
    """

    filter_sz: int
    stride: int = 1
    dilation: int = 1
    pad_l: int = 0
    pad_r: int = 0
    name: str = "conv"

    def __post_init__(self):
        if self.filter_sz < 1 or self.stride < 1 or self.dilation < 1:
            raise ValueError(f"bad conv spec {self}")

    @property
    def span(self) -> int:
        return (self.filter_sz - 1) * self.dilation + 1

    def out_len(self, in_len: int) -> int:
        eff = in_len + self.pad_l + self.pad_r
        if eff < self.span:
            return 0
        return (eff - self.span) // self.stride + 1

    def in_range(self, out: Range, in_len: int | None = None) -> Range:
        """Real-input range needed for outputs [out.b, out.e).

        Padding is available only at the true array edges; callers that pass
        ``in_len`` get the range clipped to [0, in_len).  Without ``in_len``
        the unclipped footprint (which may be negative / overhang) is
        returned with pads subtracted only on the left edge.
        """
        b = out.b * self.stride - self.pad_l
        e = (out.e - 1) * self.stride - self.pad_l + self.span
        if in_len is not None:
            b, e = max(b, 0), min(e, in_len)
        return Range(b, e)

    def out_range(self, inp: Range, in_len: int) -> Range:
        """Outputs fully computable from real inputs [inp.b, inp.e).

        Edge padding counts as available only when ``inp`` touches the
        corresponding edge of the full array (length ``in_len``).
        """
        lo = inp.b - (self.pad_l if inp.b == 0 else 0)
        hi = inp.e + (self.pad_r if inp.e == in_len else 0)
        # need o*stride - pad_l >= lo  and  o*stride - pad_l + span <= hi
        ob = _ceil_div(lo + self.pad_l, self.stride)
        oe = (hi - self.span + self.pad_l) // self.stride + 1
        ob = max(ob, 0)
        return Range(ob, max(ob, oe))


@dataclasses.dataclass(frozen=True)
class TConv:
    """Transposed (fractionally-strided) convolution, complete outputs only.

    Equivalent view: zero-stuff the input by ``stride`` (sample ``i`` sits at
    fine-lattice position ``i*stride``), then run a FULL convolution with the
    ``filter_sz``-tap filter.  jax's ``conv_transpose(padding='VALID')``
    produces ``(n-1)*stride + filter_sz`` outputs; output ``j`` (full-conv
    coords) reads fine positions ``[j - filter_sz + 1, j + 1)``.  A position
    is *complete* iff that whole window lies inside the real fine lattice
    ``[0, (n-1)*stride + 1)``; complete outputs are
    ``j in [filter_sz - 1, (n-1)*stride + 1)``.  This class's output lattice
    is those complete positions re-indexed from 0 (o = j - (filter_sz-1)).
    """

    filter_sz: int
    stride: int
    name: str = "tconv"

    def __post_init__(self):
        if self.filter_sz < self.stride:
            raise ValueError(
                f"tconv filter_sz {self.filter_sz} < stride {self.stride}: "
                "output would have gaps with zero taps"
            )

    @property
    def full_to_complete(self) -> int:
        """Offset to slice off the left ragged edge of the full-size output."""
        return self.filter_sz - 1

    def out_len(self, in_len: int) -> int:
        if in_len < 1:
            return 0
        n = (in_len - 1) * self.stride + 1 - (self.filter_sz - 1)
        return max(n, 0)

    def in_range(self, out: Range, in_len: int | None = None) -> Range:
        """Implementation-aligned: the smallest input window such that
        :func:`ops.conv1d.tconv1d` applied to it produces a superset of
        ``out``.  (The impl keeps only positions whose full fine-lattice
        window lies inside the window's fine lattice, so this is slightly
        wider than the mathematical tap-dependency range when
        ``stride`` does not divide ``out.b``.)"""
        b = out.b // self.stride
        e = _ceil_div(out.e + self.filter_sz - 2, self.stride) + 1
        if in_len is not None:
            b, e = max(b, 0), min(e, in_len)
        return Range(b, e)

    def out_range(self, inp: Range, in_len: int) -> Range:
        del in_len  # no padding; unused
        ob = max(inp.b * self.stride, 0)
        oe = (inp.e - 1) * self.stride + 2 - self.filter_sz
        return Range(ob, max(ob, oe))


Layer = Conv | TConv


def impl_out_range(layer: Layer, inp: Range) -> Range:
    """Global output range produced by applying the tensor implementation
    (:mod:`ae_wavenet_tpu.ops.conv1d`) to exactly the window ``inp``.

    For pad-free strided convs the window start must be lattice-aligned
    (``inp.b % stride == 0``) or the computed values would sit off the global
    output lattice."""
    if isinstance(layer, Conv):
        if layer.pad_l or layer.pad_r:
            raise ValueError("impl_out_range only supports pad-free convs")
        if inp.b % layer.stride:
            raise ValueError(f"window start {inp.b} not aligned to stride {layer.stride}")
        n = layer.out_len(len(inp))
        return Range(inp.b // layer.stride, inp.b // layer.stride + n)
    oe = (inp.e - 1) * layer.stride + 2 - layer.filter_sz
    return Range(inp.b * layer.stride, max(inp.b * layer.stride, oe))


@dataclasses.dataclass(frozen=True)
class PlanStep:
    """One layer of an exact-computation plan (bottom-up order)."""

    layer: Layer
    in_want: Range   # global input range the layer must be fed
    out_want: Range  # global output range to keep (== next step's in_want)
    trim_l: int      # left slice offset into the implementation's output

    @property
    def keep(self) -> int:
        return len(self.out_want)


@dataclasses.dataclass(frozen=True)
class Chain:
    """A stack of layers; composes range queries through the whole stack."""

    layers: Tuple[Layer, ...]

    def __init__(self, layers: Sequence[Layer]):
        object.__setattr__(self, "layers", tuple(layers))

    def __add__(self, other: "Chain | Sequence[Layer]") -> "Chain":
        other_layers = other.layers if isinstance(other, Chain) else tuple(other)
        return Chain(self.layers + other_layers)

    def out_len(self, in_len: int) -> int:
        n = in_len
        for l in self.layers:
            n = l.out_len(n)
        return n

    def in_range(self, out: Range, in_len: int | None = None) -> Range:
        """Input range needed at the *bottom* of the chain for top outputs.

        ``in_len`` (if given) is the bottom-most input length; intermediate
        lengths are derived from it for pad-edge handling.
        """
        lens: list[int | None] = [None] * len(self.layers)
        if in_len is not None:
            n = in_len
            for i, l in enumerate(self.layers):
                lens[i] = n
                n = l.out_len(n)
        r = out
        for l, n in zip(reversed(self.layers), reversed(lens)):
            r = l.in_range(r, n)
        return r

    def out_range(self, inp: Range, in_len: int) -> Range:
        r, n = inp, in_len
        for l in self.layers:
            r2 = l.out_range(r, n)
            n = l.out_len(n)
            r = r2
        return r

    def plan(self, out: Range, in_len: int | None = None) -> Tuple[PlanStep, ...]:
        """Exact-computation plan: per layer (bottom-up), the window to feed
        it and the static slice of its implementation output to keep, such
        that feeding the bottom layer ``plan[0].in_want`` reproduces the full
        computation on ``out`` bit-exactly.  All ints — resolved before
        tracing, so the jitted model sees only static slices.
        """
        wants: list[Range] = [out]
        for l in reversed(self.layers):
            wants.append(l.in_range(wants[-1], None))
        wants.reverse()  # wants[i] = input range of layer i; wants[-1] = out
        if in_len is not None and (wants[0].b < 0 or wants[0].e > in_len):
            raise ValueError(
                f"output range {out} needs input {wants[0]} outside [0, {in_len})"
            )
        steps = []
        for i, l in enumerate(self.layers):
            io = impl_out_range(l, wants[i])
            if not io.contains(wants[i + 1]):
                raise AssertionError(
                    f"geometry bug: layer {l} fed {wants[i]} produces {io}, "
                    f"want {wants[i + 1]}"
                )
            steps.append(
                PlanStep(l, wants[i], wants[i + 1], wants[i + 1].b - io.b)
            )
        return tuple(steps)

    @property
    def receptive_field(self) -> int:
        """Input samples needed to produce one output (stride-1 chains)."""
        return len(self.in_range(Range(0, 1)))

    def total_stride(self) -> Tuple[int, int]:
        """Net (numerator, denominator) resampling ratio of the chain."""
        num = den = 1
        for l in self.layers:
            if isinstance(l, Conv):
                num *= l.stride
            else:
                den *= l.stride
        g = math.gcd(num, den)
        return num // g, den // g


def apply_plan(steps: Sequence[PlanStep], x, apply_fn):
    """Run a plan: ``x`` covers ``steps[0].in_want`` on its last axis;
    ``apply_fn(layer, x)`` applies one layer's tensor implementation.
    Returns the tensor covering exactly the planned output range."""
    for st in steps:
        x = apply_fn(st.layer, x)
        x = x[..., st.trim_l : st.trim_l + st.keep]
    return x

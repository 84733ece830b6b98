"""Property tests for the virtual-convolution geometry (SURVEY.md §7 step 1).

The gold-standard oracle is tensor-level: for random chains, computing a
layer stack on the `in_range`-sized window must reproduce the full
computation on the queried output range EXACTLY (bitwise, float32).  This is
precisely the contract the data loader and model trimming rely on.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ae_wavenet_tpu.geometry.vconv import (
    Chain, Conv, Range, TConv, apply_plan,
)
from ae_wavenet_tpu.ops.conv1d import conv1d, tconv1d


def _apply_layer(layer, x):
    """Apply one geometry layer to x [B, C, T] with fixed random weights."""
    rng = np.random.default_rng(hash((layer.filter_sz, getattr(layer, "stride", 1))) % 2**32)
    cout = x.shape[1]
    w = jnp.asarray(rng.normal(size=(cout, x.shape[1], layer.filter_sz)), jnp.float32)
    if isinstance(layer, Conv):
        assert layer.pad_l == 0 and layer.pad_r == 0, "pads tested separately"
        return conv1d(x, w, stride=layer.stride, dilation=layer.dilation)
    return tconv1d(x, w, stride=layer.stride)


def _apply_chain(chain, x):
    for l in chain.layers:
        x = _apply_layer(l, x)
    return x


def _random_chain(rng):
    layers = []
    for _ in range(rng.integers(1, 5)):
        if rng.random() < 0.6:
            f = int(rng.integers(1, 9))
            s = int(rng.integers(1, 4))
            d = int(rng.integers(1, 5)) if s == 1 else 1
            layers.append(Conv(f, stride=s, dilation=d))
        else:
            s = int(rng.integers(1, 5))
            f = int(rng.integers(s, s + 6))
            layers.append(TConv(f, stride=s))
    return Chain(layers)


@pytest.mark.parametrize("trial", range(40))
def test_chain_window_equals_full_computation(trial):
    rng = np.random.default_rng(trial)
    chain = _random_chain(rng)
    in_len = int(rng.integers(64, 257))
    out_len = chain.out_len(in_len)
    if out_len < 2:
        pytest.skip("degenerate chain for this length")

    x = jnp.asarray(rng.normal(size=(1, 2, in_len)), jnp.float32)
    full = _apply_chain(chain, x)
    assert full.shape[-1] == out_len, (chain, in_len)

    # random output subrange: the plan must reproduce the full computation
    # on the window bit-exactly.
    ob = int(rng.integers(0, out_len - 1))
    oe = int(rng.integers(ob + 1, out_len + 1))
    r_in = chain.in_range(Range(ob, oe), in_len)
    assert 0 <= r_in.b and r_in.e <= in_len
    steps = chain.plan(Range(ob, oe), in_len)
    assert steps[0].in_want.as_tuple() == r_in.as_tuple()
    window = apply_plan(steps, x[..., r_in.b : r_in.e], _apply_layer)
    # exact up to XLA reduction-order rounding (summation strategy may
    # differ between window sizes); any alignment bug shows up as O(1)
    # errors, not 1e-7.
    np.testing.assert_allclose(
        np.asarray(window), np.asarray(full[..., ob:oe]),
        rtol=2e-5, atol=1e-4,
        err_msg=f"chain={chain} in_len={in_len} out=[{ob},{oe}) in={r_in}",
    )


@pytest.mark.parametrize("trial", range(40))
def test_in_range_is_minimal(trial):
    """Shrinking the window by one sample on either side must break it."""
    rng = np.random.default_rng(1000 + trial)
    chain = _random_chain(rng)
    in_len = int(rng.integers(64, 257))
    out_len = chain.out_len(in_len)
    if out_len < 2:
        pytest.skip("degenerate")
    ob = int(rng.integers(0, out_len - 1))
    oe = int(rng.integers(ob + 1, out_len + 1))
    r = chain.in_range(Range(ob, oe), in_len)
    want = oe - ob
    # one less on the left (if possible): fewer outputs available before ob
    got_l = chain.out_range(Range(r.b + 1, r.e), in_len)
    assert not (got_l.b <= ob and oe <= got_l.e) or len(Range(r.b + 1, r.e)) == 0
    got_r = chain.out_range(Range(r.b, r.e - 1), in_len)
    assert not (got_r.b <= ob and oe <= got_r.e)
    # and the full window does suffice per out_range
    got = chain.out_range(r, in_len)
    assert got.b <= ob and oe <= got.e, (chain, r, got, (ob, oe))
    del want


@pytest.mark.parametrize("trial", range(40))
def test_out_range_is_sound_and_tight(trial):
    """out_range(inp) outputs are computable from inp; one more is not."""
    rng = np.random.default_rng(2000 + trial)
    chain = _random_chain(rng)
    in_len = int(rng.integers(64, 257))
    out_len = chain.out_len(in_len)
    if out_len < 2:
        pytest.skip("degenerate")
    ib = int(rng.integers(0, in_len - 16))
    ie = int(rng.integers(ib + 8, in_len + 1))
    got = chain.out_range(Range(ib, ie), in_len)
    if len(got) == 0:
        return
    # sound: the needed inputs for `got` lie within [ib, ie)
    need = chain.in_range(got, in_len)
    assert ib <= need.b and need.e <= ie, (chain, (ib, ie), got, need)
    # tight: extending by one output on either side exceeds [ib, ie)
    if got.b > 0:
        need_l = chain.in_range(Range(got.b - 1, got.e), in_len)
        assert need_l.b < ib or need_l.e > ie
    if got.e < out_len:
        need_r = chain.in_range(Range(got.b, got.e + 1), in_len)
        assert need_r.b < ib or need_r.e > ie


def test_conv_padding_geometry():
    """Centered framing (librosa-style) geometry: pads count as real taps."""
    c = Conv(400, stride=160, pad_l=200, pad_r=200)
    n = 16000
    assert c.out_len(n) == (n + 400 - 400) // 160 + 1
    r = c.in_range(Range(0, 1), n)
    assert r.as_tuple() == (0, 200)  # left half supplied by padding
    full = c.out_range(Range(0, n), n)
    assert full.as_tuple() == (0, c.out_len(n))
    # interior input range gets no padding credit
    mid = c.out_range(Range(160, n - 160), n)
    need = c.in_range(mid, None)
    assert need.b >= 160 - 200  # unclipped may reach into pad zone


def test_receptive_field_wavenet_like():
    # two blocks of dilations 1..512, kernel size 2 => RF = 2*1023 + 1
    dil = [2**i for i in range(10)] * 2
    chain = Chain([Conv(2, dilation=d) for d in dil])
    assert chain.receptive_field == sum(dil) + 1
    num, den = chain.total_stride()
    assert (num, den) == (1, 1)


def test_total_stride_frontend_like():
    # MFCC hop 160, encoder downsample 2, upsampling back by 320
    chain = Chain(
        [Conv(400, stride=160), Conv(4, stride=2), TConv(8, stride=4),
         TConv(8, stride=4), TConv(10, stride=5), TConv(8, stride=4)]
    )
    assert chain.total_stride() == (1, 1)

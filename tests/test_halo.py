"""Sequence-parallel halo exchange: exact equivalence with the single-device
zero-left-padded causal computation (8-way CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ae_wavenet_tpu.models import wavenet
from ae_wavenet_tpu.parallel.halo import make_sp_forward, sp_dilated_conv
from ae_wavenet_tpu.ops.conv1d import conv1d
from ae_wavenet_tpu.utils.config import WaveNetConfig


def _mesh():
    return Mesh(np.asarray(jax.devices()), axis_names=("seq",))


def test_sp_dilated_conv_matches_padded():
    rng = np.random.default_rng(0)
    b, c, t, d, f = 2, 4, 128, 4, 2
    x = jnp.asarray(rng.normal(size=(b, c, t)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, c, f)), jnp.float32)
    mesh = _mesh()

    sp = jax.shard_map(
        lambda xx: sp_dilated_conv(xx, w, None, d, "seq"),
        mesh=mesh, in_specs=P(None, None, "seq"), out_specs=P(None, None, "seq"),
    )
    got = np.asarray(sp(x))

    pad = jnp.pad(x, ((0, 0), (0, 0), ((f - 1) * d, 0)))
    want = np.asarray(conv1d(pad, w, dilation=d))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sp_wavenet_stack_matches_single_device():
    cfg = WaveNetConfig(
        n_blocks=2, n_block_layers=3, n_res=8, n_dil=8, n_skp=8, n_post=8,
        n_lc_in=4, n_lc_out=6, n_speakers=4, n_global_embed=2,
    )
    params = wavenet.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    b, t = 2, 256  # divisible by 8 shards
    n_cond = cfg.n_lc_out + cfg.n_global_embed
    x = jnp.asarray(rng.normal(size=(b, cfg.n_res, t)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(b, n_cond, t)), jnp.float32)

    mesh = _mesh()
    fwd = make_sp_forward(params["wavenet"] if "wavenet" in params else params,
                          cfg.dilations, mesh)
    got = np.asarray(fwd(x, cond))

    # single-device oracle: same math with zero left padding per layer
    def oracle(x, cond):
        skip = None
        for i, d in enumerate(cfg.dilations):
            p = params["layers"][i]
            w2 = jnp.stack([p["w_prev"]["w"], p["w_cur"]["w"]], axis=-1)
            xp = jnp.pad(x, ((0, 0), (0, 0), (d, 0)))
            y = conv1d(xp, w2, p["w_prev"]["b"] + p["w_cur"]["b"], dilation=d)
            y = y + jnp.einsum("oc,bct->bot", p["w_cond"]["w"], cond)
            y = y + p["w_cond"]["b"][None, :, None]
            f_, g_ = jnp.split(y, 2, axis=1)
            h = jnp.tanh(f_) * jax.nn.sigmoid(g_)
            res = jnp.einsum("oc,bct->bot", p["w_res"]["w"], h)
            s = jnp.einsum("oc,bct->bot", p["w_skip"]["w"], h)
            s = s + p["w_skip"]["b"][None, :, None]
            x = x + res + p["w_res"]["b"][None, :, None]
            skip = s if skip is None else skip + s
        return skip

    want = np.asarray(oracle(x, cond))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

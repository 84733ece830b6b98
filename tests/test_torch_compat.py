"""Torch checkpoint shim round-trip (SURVEY.md §5 checkpoint-parity item)."""

import numpy as np
import pytest

import jax

from ae_wavenet_tpu.models import autoencoder as ae
from ae_wavenet_tpu.training import torch_compat as tc
from ae_wavenet_tpu.utils.config import tiny_config


def test_round_trip(tmp_path):
    cfg = tiny_config()
    params, bn_state = ae.init(jax.random.PRNGKey(0), cfg)
    tree = {"params": params, "bn_state": bn_state}
    p = str(tmp_path / "ref_style.ckpt")
    tc.export_torch(p, 123, tree, cfg)

    step, tree2, cfg2 = tc.import_torch(p, tree)
    assert step == 123
    assert cfg2 == cfg
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(tree2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shape_mismatch_rejected(tmp_path):
    cfg = tiny_config()
    params, bn = ae.init(jax.random.PRNGKey(0), cfg)
    p = str(tmp_path / "x.ckpt")
    tc.export_torch(p, 1, {"params": params}, cfg)
    cfg_big = tiny_config()
    import dataclasses
    cfg_big = dataclasses.replace(
        cfg_big, wavenet=dataclasses.replace(cfg_big.wavenet, n_res=64)
    )
    params_big, _ = ae.init(jax.random.PRNGKey(0), cfg_big)
    with pytest.raises(ValueError, match="shape"):
        tc.import_torch(p, {"params": params_big})


def test_named_keys_are_stable():
    cfg = tiny_config()
    params, _ = ae.init(jax.random.PRNGKey(0), cfg)
    names = sorted(tc.flatten_named({"params": params}))
    assert "params.wavenet.embed" in names
    assert any(n.startswith("params.wavenet.layers.0.w_cond") for n in names)
    assert any(n.startswith("params.encoder.pre.0.a.w") for n in names)

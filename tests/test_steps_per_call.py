"""K-step dispatch amortization (TrainConfig.steps_per_call): ONE jitted
program advances K steps via lax.scan over a staged batch block.

Contract: numerics are IDENTICAL to K dispatches of the 1-step program —
same per-step RNG (fold_in on the absolute step), same data order, same
optimizer/bottleneck-state sequencing.  Closes the compute-vs-e2e dispatch
gap (round-2 verdict weak #1 / BASELINE.md "Chassis e2e").
"""

import dataclasses
import io

import numpy as np
import pytest

from ae_wavenet_tpu.data.dataset import PackedDataset, WindowSampler
from ae_wavenet_tpu.data.loader import device_batches
from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset
from ae_wavenet_tpu.training.chassis import Chassis
from ae_wavenet_tpu.utils.config import tiny_config


@pytest.fixture(scope="module")
def data_prefix(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    prefix = str(d / "synth")
    make_synthetic_dataset(prefix, n_clips=6, n_speakers=3, seed=1)
    return prefix


def _cfg(k):
    cfg = tiny_config()
    return dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, n_steps=8, log_every=4, steps_per_call=k))


def test_block_loader_stacks_consecutive_batches(data_prefix):
    ds = PackedDataset(data_prefix)
    s = WindowSampler(ds, u_len=3000, batch_sz=2, seed=5)
    singles = [s.batch_at(i) for i in range(4)]
    got = list(device_batches(s, 0, 4, block=2))
    assert [g[0] for g in got] == [0, 2]
    for (first, (wavs, spks)), lo in zip(got, [0, 2]):
        assert wavs.shape == (2, 2, 3000) and spks.shape == (2, 2)
        for i in range(2):
            np.testing.assert_array_equal(np.asarray(wavs)[i], singles[lo + i][0])
            np.testing.assert_array_equal(np.asarray(spks)[i], singles[lo + i][1])


def test_block_loader_rejects_ragged(data_prefix):
    ds = PackedDataset(data_prefix)
    s = WindowSampler(ds, u_len=3000, batch_sz=2, seed=5)
    with pytest.raises(ValueError, match="multiple of block"):
        list(device_batches(s, 0, 5, block=2))


def test_k_step_chassis_matches_single_step(data_prefix):
    a = Chassis(_cfg(1), data_prefix, log_stream=io.StringIO())
    hist_a = a.train(8)
    b = Chassis(_cfg(4), data_prefix, log_stream=io.StringIO())
    hist_b = b.train(8)

    # log points land on the same steps (the crossing logic generalizes
    # `(s+1) % log_every == 0` to K-step blocks)
    assert [h["step"] for h in hist_a] == [4, 8]
    assert [h["step"] for h in hist_b] == [4, 8]
    np.testing.assert_allclose(
        [h["recon_ce"] for h in hist_a], [h["recon_ce"] for h in hist_b],
        rtol=1e-5, atol=1e-6)

    import jax
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=1e-5, atol=1e-6)


def test_k_step_checkpoint_cadence(data_prefix, tmp_path):
    """ckpt_every=4 with K=2 saves at steps 4 and 8; resume continues."""
    cfg = _cfg(2)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ckpt_every=4))
    ck = str(tmp_path / "ck")
    ch = Chassis(cfg, data_prefix, ckpt_dir=ck, log_stream=io.StringIO())
    ch.train(8)
    ch2 = Chassis(cfg, data_prefix, ckpt_dir=ck, log_stream=io.StringIO())
    assert ch2.resume() == 8


def test_rejects_nondivisible_n_steps(data_prefix):
    ch = Chassis(_cfg(4), data_prefix, log_stream=io.StringIO())
    with pytest.raises(ValueError, match="multiple of"):
        ch.train(6)

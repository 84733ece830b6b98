"""Multi-host data parallelism over jax.distributed (DCN path).

SURVEY.md §2.2 comm backend: the rebuild's plan is one process per host
with the mesh extended over DCN via ``jax.distributed.initialize``.  This
test runs the REAL thing at CPU scale: two separate processes, two local
CPU devices each, one 4-device global mesh — per-process shard feeding
(mesh.put_sharded), replicated params (mesh.put_replicated), XLA
collectives over the TCP coordinator.  Metrics must agree across processes
(they are global pmeans) and match a single-process 4-device run of the
identical config bit-for-bit in f32.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: opt-in via `pytest -m slow`

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset

    d = tmp_path_factory.mktemp("data")
    prefix = str(d / "synth")
    make_synthetic_dataset(prefix, n_clips=10, n_speakers=4, seed=0)
    return prefix


def test_two_process_dp_matches_single_process(tmp_path, synth_data):
    port = _free_port()
    outs = [tmp_path / f"worker{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(i), "2", str(port), synth_data, str(outs[i])],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            # platform flags must be in the env BEFORE interpreter startup
            # (sitecustomize imports jax immediately)
            env={
                **os.environ,
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
                "PYTHONPATH": os.path.dirname(HERE)
                + os.pathsep + os.environ.get("PYTHONPATH", ""),
            },
        )
        for i in range(2)
    ]
    results = []
    for i, p in enumerate(procs):
        try:
            _, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker {i} failed:\n{err.decode()[-3000:]}"
        with open(outs[i]) as f:
            results.append(json.load(f))

    # global pmean'd metrics: identical on every process
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=0, atol=0)
    # checkpoint contract: process 0 wrote, both resumed at the same step
    # and the post-resume step agrees (replicated state restored identically)
    assert results[0]["resumed_step"] == results[1]["resumed_step"] == 2
    np.testing.assert_allclose(results[0]["post_resume_loss"],
                               results[1]["post_resume_loss"],
                               rtol=0, atol=0)
    # K-step dispatch (steps_per_call=2) across processes: the [K, B, ...]
    # block sharding feeds per-process shards; pmean'd metrics still agree
    np.testing.assert_allclose(results[0]["kstep_loss"],
                               results[1]["kstep_loss"],
                               rtol=0, atol=0)

    # and equal to a single-process 4-device mesh run of the same config
    import dataclasses

    import jax

    from ae_wavenet_tpu.parallel import mesh as mesh_mod
    from ae_wavenet_tpu.training.chassis import Chassis
    from ae_wavenet_tpu.utils.config import tiny_config

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_sz=4, log_every=1)
    )
    mesh = mesh_mod.make_mesh(jax.devices()[:4])
    ch = Chassis(cfg, synth_data, mesh=mesh,
                 log_stream=open(os.devnull, "w"))
    history = ch.train(2)
    np.testing.assert_allclose(
        results[0]["losses"], [h["loss"] for h in history],
        rtol=1e-5, atol=1e-6,
    )

"""Worker process for tests/test_multihost.py (not a test module).

Runs one process of a 2-process jax.distributed CPU cluster: 2 local CPU
devices per process -> a 4-device global 'data' mesh spanning both
processes, the TPU-world shape of one-process-per-host DP over DCN
(SURVEY.md §2.2 comm backend; reference: torch_xla ``xmp.spawn`` [H]).

Usage: python multihost_worker.py PID NPROC PORT DATA_PREFIX OUT_JSON
"""

import json
import os
import sys


def main() -> int:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, data_prefix, out_path = sys.argv[3], sys.argv[4], sys.argv[5]
    # --xla_force_host_platform_device_count=2 must arrive via the
    # subprocess environment (test_multihost.py sets it).  The platform
    # must be forced through jax.config: this machine's sitecustomize
    # registers the TPU backend at interpreter startup and overrides
    # JAX_PLATFORMS, so the env var alone is too late (tests/conftest.py
    # has the same note).  Order matters: config BEFORE initialize, both
    # before any backend use.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ae_wavenet_tpu.parallel import mesh as mesh_mod

    mesh_mod.initialize_distributed(f"localhost:{port}", nproc, pid)

    import dataclasses

    from ae_wavenet_tpu.training.chassis import Chassis
    from ae_wavenet_tpu.utils.config import tiny_config

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()
    assert len(jax.local_devices()) == 2

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_sz=4, log_every=1)
    )
    mesh = mesh_mod.make_mesh()
    ckpt_dir = os.path.join(os.path.dirname(out_path), "ckpt")
    ch = Chassis(cfg, data_prefix, ckpt_dir=ckpt_dir, mesh=mesh,
                 log_stream=open(os.devnull, "w"))
    history = ch.train(2)
    # multi-host checkpoint contract: process 0 writes, everyone
    # synchronizes (training/checkpoint.py), and every process can resume
    ch.save()
    ch2 = Chassis(cfg, data_prefix, ckpt_dir=ckpt_dir, mesh=mesh,
                  log_stream=open(os.devnull, "w"))
    resumed = ch2.resume()
    history2 = ch2.train(1)
    # K-step dispatch over the multi-process mesh: the staged [K, B, ...]
    # block is placed with block_sharding (batch on axis 1) through
    # make_array_from_callback — the one DP combination no other test
    # exercises across processes
    cfg_k = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps_per_call=2)
    )
    ch3 = Chassis(cfg_k, data_prefix, ckpt_dir=ckpt_dir, mesh=mesh,
                  log_stream=open(os.devnull, "w"))
    ch3.resume()
    history3 = ch3.train(2)
    with open(out_path, "w") as f:
        json.dump(
            {
                "pid": pid,
                "losses": [h["loss"] for h in history],
                "grad_norms": [h["grad_norm"] for h in history],
                "resumed_step": resumed,
                "post_resume_loss": history2[-1]["loss"],
                "kstep_loss": history3[-1]["loss"],
            },
            f,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

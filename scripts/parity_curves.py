"""Loss-curve parity evidence (SURVEY.md §6 north star "matched
reconstruction loss curves"): train the JAX chassis and the independent
PyTorch mirror (scripts/torch_mirror.py) from IDENTICAL init on IDENTICAL
batches and record both CE trajectories -> docs/parity_curves.json.

Covers BASELINE config 1 (tiny plain-AE) and the deterministic VQ twin
(EMA codebook + STE + commitment warmup + latent->MFCC aux head; jitter
and dead-code restarts off — they draw JAX RNG the mirror cannot follow).

Usage: PARITY_STEPS=200 python scripts/parity_curves.py
"""

from __future__ import annotations

import dataclasses as dc
import io
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset
from ae_wavenet_tpu.data.dataset import PackedDataset, WindowSampler
from ae_wavenet_tpu.training.chassis import Chassis
from ae_wavenet_tpu.utils.config import BottleneckConfig, tiny_config
from scripts import torch_mirror as tm

STEPS = int(os.environ.get("PARITY_STEPS", "200"))

td = tempfile.mkdtemp()
prefix = os.path.join(td, "synth")
make_synthetic_dataset(prefix, n_clips=10, n_speakers=4, seed=0)


def run(label: str, cfg) -> dict:
    ch = Chassis(cfg, prefix, log_stream=io.StringIO())
    # snapshot to host BEFORE training: the jitted step donates param buffers
    init_params = jax.tree.map(lambda x: np.array(x), ch.params)
    init_bn = jax.tree.map(lambda x: np.array(x), ch.bn_state)
    hist = ch.train(STEPS)
    jax_ce = [h["recon_ce"] for h in hist]

    ds = PackedDataset(prefix)
    sampler = WindowSampler(ds, ch.spec.u_len, cfg.train.batch_sz,
                            cfg.train.seed)
    torch_ce, bn_t = tm.train_curve(cfg, ch.spec, init_params, sampler,
                                    STEPS, bn_state=init_bn or None,
                                    return_state=True)

    diffs = [abs(a - b) for a, b in zip(jax_ce, torch_ce)]
    out = {
        "config": label,
        "steps": STEPS,
        "learning_rate": cfg.train.learning_rate,
        "jax_ce": [round(v, 5) for v in jax_ce],
        "torch_ce": [round(v, 5) for v in torch_ce],
        "abs_diff_max": round(max(diffs), 6),
        "abs_diff_mean": round(sum(diffs) / len(diffs), 6),
        "abs_diff_max_first_50": round(max(diffs[:50]), 6),
    }
    if bn_t is not None and "codebook" in bn_t:
        out["codebook_abs_diff_max"] = float(
            np.abs(np.asarray(ch.bn_state["codebook"])
                   - np.asarray(bn_t["codebook"])).max()
        )
    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, list)}, indent=1), flush=True)
    return out


def run_vae(label: str, cfg) -> dict:
    """VAE parity runs the DETERMINISTIC objective (see
    scripts/parity_common.det_vae_jax_curve), so the JAX side is a direct
    optax loop rather than the Chassis."""
    from ae_wavenet_tpu.models import autoencoder as ae
    from scripts.parity_common import det_vae_jax_curve

    spec = ae.make_window_spec(cfg)
    ds = PackedDataset(prefix)
    sampler = WindowSampler(ds, spec.u_len, cfg.train.batch_sz,
                            cfg.train.seed)
    jax_ce, init_params = det_vae_jax_curve(cfg, spec, sampler, STEPS)
    torch_ce = tm.train_curve(cfg, spec, init_params, sampler, STEPS)
    diffs = [abs(a - b) for a, b in zip(jax_ce, torch_ce)]
    out = {
        "config": label,
        "steps": STEPS,
        "learning_rate": cfg.train.learning_rate,
        "jax_ce": [round(v, 5) for v in jax_ce],
        "torch_ce": [round(v, 5) for v in torch_ce],
        "abs_diff_max": round(max(diffs), 6),
        "abs_diff_mean": round(sum(diffs) / len(diffs), 6),
        "abs_diff_max_first_50": round(max(diffs[:50]), 6),
    }
    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, list)}, indent=1), flush=True)
    return out


cfg_ae = tiny_config()
cfg_ae = dc.replace(cfg_ae, train=dc.replace(cfg_ae.train, n_steps=STEPS,
                                             log_every=1, learning_rate=1e-3))
cfg_vq = dc.replace(
    cfg_ae,
    bottleneck=BottleneckConfig(kind="vq", n_dim=16, vq_k=64, jitter_p=0.0,
                                vq_restart_thresh=0.0, vq_warmup_steps=50),
    train=dc.replace(cfg_ae.train, aux_frame_weight=1.0),
)
cfg_vae = dc.replace(
    cfg_ae,
    bottleneck=BottleneckConfig(kind="vae", n_dim=16, free_nats=0.1,
                                kl_anneal_steps=50),
    train=dc.replace(cfg_ae.train, aux_frame_weight=1.0),
)

results = [run("tiny plain-AE (BASELINE config 1)", cfg_ae),
           run("tiny VQ-EMA + aux head (deterministic twin)", cfg_vq),
           run_vae("tiny VAE + aux head (deterministic twin)", cfg_vae)]

os.makedirs("docs", exist_ok=True)
with open("docs/parity_curves.json", "w") as f:
    json.dump(results, f, indent=1)

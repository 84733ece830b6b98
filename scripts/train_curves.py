"""Produce convergence curves for the three bottleneck families on the
synthetic fixture (CPU-runnable evidence of end-to-end training health;
the reference publishes no curves to compare against — SURVEY.md §6)."""
import dataclasses as dc
import io, json, os, sys, tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax
jax.config.update("jax_platforms", "cpu")

from ae_wavenet_tpu.data.preprocess import make_synthetic_dataset
from ae_wavenet_tpu.training.chassis import Chassis
from ae_wavenet_tpu.utils.config import BottleneckConfig, tiny_config

STEPS = int(os.environ.get("CURVE_STEPS", "2000"))
td = tempfile.mkdtemp()
prefix = os.path.join(td, "synth")
make_synthetic_dataset(prefix, n_clips=12, n_speakers=4, seed=0)

out = {}
for kind, bn in [
    ("ae", BottleneckConfig(kind="ae", n_dim=16)),
    ("vq", BottleneckConfig(kind="vq", n_dim=16, vq_k=64, jitter_p=0.0)),
    ("vae", BottleneckConfig(kind="vae", n_dim=16, free_nats=0.05,
                             kl_anneal_steps=STEPS // 2)),
]:
    cfg = tiny_config()
    cfg = dc.replace(cfg, bottleneck=bn,
                     train=dc.replace(cfg.train, batch_sz=8, n_steps=STEPS,
                                      log_every=max(STEPS // 40, 10),
                                      learning_rate=1e-3,
                                      # 5 is coprime with the 4-speaker
                                      # period, so the holdout split spans
                                      # all speakers (holdout_every=4 would
                                      # hold out exactly speaker 0, leaving
                                      # its embedding untrained)
                                      holdout_every=5))
    ch = Chassis(cfg, prefix, log_stream=io.StringIO())
    hist = ch.train(STEPS)
    ev = ch.evaluate(n_batches=4)
    out[kind] = {
        "steps": [h["step"] for h in hist],
        "recon_ce": [round(h["recon_ce"], 4) for h in hist],
        "extra": {k: round(hist[-1][k], 4) for k in hist[-1]
                  if k in ("perplexity", "kl", "commitment")},
        "eval_recon_ce_holdout": round(ev["recon_ce"], 4),
    }
    print(kind, "final train CE", out[kind]["recon_ce"][-1],
          "holdout CE", out[kind]["eval_recon_ce_holdout"],
          out[kind]["extra"], flush=True)

os.makedirs("docs", exist_ok=True)
with open("docs/training_curves.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote docs/training_curves.json")

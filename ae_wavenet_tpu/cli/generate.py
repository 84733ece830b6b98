"""CLI: generation / reconstruction (rebuild of reference ``test.py`` /
``generate.py`` [M], SURVEY.md §3.4) — but on the O(1)/sample fast-queue
path instead of the reference's naive O(R)/sample loop.

    python -m ae_wavenet_tpu.cli.generate --ckpt-dir DIR --data PREFIX \
        [--clip I] [--n-samples N] [--temperature T] --out out.wav
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--data", required=True, help="packed dataset prefix")
    p.add_argument("--clip", type=int, default=0, help="clip index to autoencode")
    p.add_argument("--n-samples", type=int, default=16000)
    p.add_argument("--max-input", type=int, default=64000,
                   help="cap on input samples fed to the encoder")
    p.add_argument("--temperature", type=float, default=1.0,
                   help="sampling temperature (0 = greedy). Default 1.0 is "
                        "MEASURED (BASELINE.md 'rollout divergence'): lower "
                        "temperatures do not improve ground-truth NLL and "
                        "worsen spectral distance; greedy collapses the "
                        "audio (spectral_l2 62 vs 21 at 1.0)")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-streaming fused kernel (TPU; ~1.3x "
                        "faster AR sampling, slight quantization noise)")
    p.add_argument("--int4", action="store_true",
                   help="int4 nibble-packed weight streaming (TPU; 4x "
                        "smaller weight footprint than bf16 but measured "
                        "SLOWER than --int8 — unpack overhead exceeds the "
                        "bandwidth saving (BASELINE.md round-5 grid); use "
                        "only when HBM capacity-bound, and check "
                        "scripts/quality_quantized.py for the checkpoint)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True, help="output .wav path")
    a = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ae_wavenet_tpu.audio.mulaw import mu_decode
    from ae_wavenet_tpu.data.dataset import PackedDataset
    from ae_wavenet_tpu.models import registry
    from ae_wavenet_tpu.training import checkpoint as ckpt_mod
    from ae_wavenet_tpu.utils.wavio import write_wav

    step, tree, cfg = ckpt_mod.load(a.ckpt_dir, a.step)
    print(f"loaded step {step} ({cfg.model_kind}, bottleneck={cfg.bottleneck.kind})")
    model = registry.get(cfg.model_kind)
    # rebuild canonical pytree structure (orbax may restore tuples as lists);
    # guarded rebuild shared with Chassis.resume (checkpoint.merge_into)
    ref_params, ref_bn = model.init(jax.random.PRNGKey(0), cfg)
    params = ckpt_mod.merge_into(ref_params, tree["params"], "params")
    bn_state = ckpt_mod.merge_into(ref_bn, tree["bn_state"], "bn_state")

    ds = PackedDataset(a.data)
    o, l = int(ds.offsets[a.clip]), int(ds.lengths[a.clip])
    wav = np.asarray(ds.data[o : o + min(l, a.max_input)])[None, :]
    spk = ds.speakers[a.clip : a.clip + 1]
    print(f"clip {a.clip}: {wav.shape[-1]} samples, speaker {int(spk[0])}")

    # both model families expose the same reconstruct() contract
    ids, start = model.reconstruct(
        params, bn_state, cfg, jnp.asarray(wav), jnp.asarray(spk),
        jax.random.PRNGKey(a.seed), temperature=a.temperature,
        n_samples=a.n_samples, quantized="int4" if a.int4 else a.int8,
    )

    out = np.asarray(mu_decode(ids, cfg.wavenet.n_quant))[0]
    write_wav(a.out, out, cfg.spec.sample_rate)
    print(f"wrote {a.out}: {len(out)} samples "
          f"(reconstructs input positions [{start}, {start + len(out)}))")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

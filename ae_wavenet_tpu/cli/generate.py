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
    p.add_argument("--temperature", type=float, default=1.0)
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
    # rebuild canonical pytree structure (orbax may restore tuples as lists)
    ref_params, ref_bn = model.init(jax.random.PRNGKey(0), cfg)
    merge = lambda ref, new: jax.tree.unflatten(
        jax.tree.structure(ref), [jnp.asarray(x) for x in jax.tree.leaves(new)]
    )
    params = merge(ref_params, tree["params"])
    bn_state = merge(ref_bn, tree["bn_state"])

    ds = PackedDataset(a.data)
    o, l = int(ds.offsets[a.clip]), int(ds.lengths[a.clip])
    wav = np.asarray(ds.data[o : o + min(l, a.max_input)])[None, :]
    spk = ds.speakers[a.clip : a.clip + 1]
    print(f"clip {a.clip}: {wav.shape[-1]} samples, speaker {int(spk[0])}")

    if cfg.model_kind == "autoencoder":
        from ae_wavenet_tpu.models import autoencoder as ae

        ids, start = ae.reconstruct(
            params, bn_state, cfg, jnp.asarray(wav), jnp.asarray(spk),
            jax.random.PRNGKey(a.seed), temperature=a.temperature,
            n_samples=a.n_samples,
        )
    else:
        from ae_wavenet_tpu.models import mfcc_inverter as mi
        from ae_wavenet_tpu.models import wavenet as wn_mod
        from ae_wavenet_tpu.audio import mfcc as mfcc_mod
        from ae_wavenet_tpu.audio.mulaw import int16_to_float, mu_encode
        from ae_wavenet_tpu.geometry.vconv import Range
        from ae_wavenet_tpu.ops import fastgen

        chain = mi.cond_chain(cfg)
        r0 = chain.in_range(Range(0, 1))
        c_off = (r0.b + r0.e) // 2
        wavf = int16_to_float(jnp.asarray(wav))
        frames = mfcc_mod.mfcc_delta_stack(wavf, cfg.spec)
        mean = jnp.mean(frames, axis=-1, keepdims=True)
        var = jnp.var(frames, axis=-1, keepdims=True)
        frames = (frames - mean) * jax.lax.rsqrt(var + 1e-6)
        up = wn_mod.upsample_geometry(cfg.wavenet)
        steps = up.plan(Range(0, up.out_len(frames.shape[-1])))
        cond = wn_mod.upsample_apply(params["wavenet"], cfg.wavenet, frames, steps)
        rf = wn_mod.receptive_field(cfg.wavenet)
        idsx = mu_encode(wavf, cfg.wavenet.n_quant)
        ctx = idsx[..., c_off : c_off + rf + 1]
        st = fastgen.init_state(cfg.wavenet, 1)
        st = fastgen.prime(params["wavenet"], cfg.wavenet, st, ctx, cond,
                           jnp.asarray(spk))
        n = min(a.n_samples, cond.shape[-1] - rf - 1)
        ids, _ = fastgen.generate(
            params["wavenet"], cfg.wavenet, st, cond[..., rf : rf + n],
            jax.random.PRNGKey(a.seed), gc_ids=jnp.asarray(spk),
            temperature=a.temperature,
        )
        start = c_off + rf + 1

    out = np.asarray(mu_decode(ids, cfg.wavenet.n_quant))[0]
    write_wav(a.out, out, cfg.spec.sample_rate)
    print(f"wrote {a.out}: {len(out)} samples "
          f"(reconstructs input positions [{start}, {start + len(out)}))")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""CLI: training (rebuild of reference ``train.py`` + ``parse_tools.py`` [H]).

Two-phase contract like the reference: ``new`` takes the full architecture +
training flags; ``resume`` reloads the config persisted inside the checkpoint
and only allows runtime overrides (n-steps, logging) — architecture cannot
drift.

    python -m ae_wavenet_tpu.cli.train new --data PREFIX --ckpt-dir DIR \
        [--preset tiny|full] [--bottleneck ae|vae|vq] [--model autoencoder|mfcc_inverter] ...
    python -m ae_wavenet_tpu.cli.train resume --ckpt-dir DIR [--n-steps N]
"""

from __future__ import annotations

import argparse
import dataclasses

from ae_wavenet_tpu.utils import config as config_mod


def _int_tuple(s: str) -> tuple:
    return tuple(int(x) for x in s.split(",") if x)


def _float_tuple(s: str) -> tuple:
    return tuple(float(x) for x in s.split(",") if x)


def _add_runtime_flags(p):
    p.add_argument("--data", required=True, help="packed dataset prefix")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--n-steps", type=int, default=None)
    p.add_argument("--log-every", type=int, default=None)
    p.add_argument("--ckpt-every", type=int, default=None)
    p.add_argument("--ckpt-keep", type=int, default=None,
                   help="retention: keep only the newest N complete "
                        "checkpoints, plus the best-holdout-CE one "
                        "(0 = keep everything)")
    p.add_argument("--mesh", action="store_true",
                   help="shard the batch over all visible devices")
    # multi-host (SURVEY.md §2.2: DP over DCN via jax.distributed)
    p.add_argument("--distributed", action="store_true",
                   help="jax.distributed.initialize() before building the "
                        "mesh (TPU pods autodetect; implies --mesh)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (unset = autodetect)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--eval-every", type=int, default=0,
                   help="run Chassis.evaluate() every N steps (0 = off)")
    p.add_argument("--steps-per-call", type=int, default=None,
                   help="K>1: one jitted program advances K steps (amortizes "
                        "host dispatch; numerics identical — n-steps must "
                        "be a multiple of K).  Preemption note: SIGTERM is "
                        "only consulted BETWEEN dispatches, so the save "
                        "latency grows by up to one K-step block's wall "
                        "time; on preemptible hosts keep K * step_time well "
                        "inside the grace window (K<=16 at flagship scale)")
    # observability (SURVEY.md §5 rows 1-2, 5)
    p.add_argument("--tb-logdir", default=None,
                   help="also write metrics as TensorBoard scalars")
    p.add_argument("--profile-steps", type=int, default=0,
                   help="trace the first N steps to --profile-dir (Perfetto)")
    p.add_argument("--profile-dir", default=None,
                   help="jax.profiler trace output dir (default: CKPT/profile)")
    p.add_argument("--nan-checks", action="store_true",
                   help="verify metrics+params are finite at every log point "
                        "and raise at the first non-finite step")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ae-wavenet-tpu-train", description=__doc__)
    sub = p.add_subparsers(dest="mode", required=True)

    new = sub.add_parser("new", help="start a fresh run")
    _add_runtime_flags(new)
    new.add_argument(
        "--preset", default="full",
        choices=["tiny", "full", "vq", "vae", "chorowski"],
        help="BASELINE configs: tiny(1) vq(2) vae(3) chorowski(4)",
    )
    new.add_argument("--model", choices=["autoencoder", "mfcc_inverter"],
                     default="autoencoder")
    new.add_argument("--bottleneck", choices=["ae", "vae", "vq", "zero"], default=None)
    # architecture overrides (subset mirroring the reference's flag names)
    new.add_argument("--n-quant", type=int, default=None)
    new.add_argument("--n-res", type=int, default=None)
    new.add_argument("--n-dil", type=int, default=None)
    new.add_argument("--n-skp", type=int, default=None)
    new.add_argument("--n-post", type=int, default=None)
    new.add_argument("--n-blocks", type=int, default=None)
    new.add_argument("--n-block-layers", type=int, default=None)
    new.add_argument("--bn-dim", type=int, default=None, help="bottleneck dim")
    new.add_argument("--vq-k", type=int, default=None)
    new.add_argument("--vq-groups", type=int, default=None,
                     help="grouped (product) VQ: G independent codebooks "
                          "over n_dim/G-dim subvectors; multiplies the "
                          "code-entropy ceiling by G (G=4 is the measured "
                          "best on the v3 gain protocol, BASELINE.md)")
    new.add_argument("--n-speakers", type=int, default=None)
    new.add_argument("--jitter-p", type=float, default=None)
    new.add_argument("--free-nats", type=float, default=None)
    new.add_argument("--kl-anneal-steps", type=int, default=None)
    new.add_argument("--ema-decay", type=float, default=None)
    new.add_argument("--vq-beta", type=float, default=None,
                     help="commitment loss weight")
    new.add_argument("--vq-restart-thresh", type=float, default=None,
                     help="EMA-count floor for dead-code restarts (0 = off)")
    new.add_argument("--vq-warmup-steps", type=int, default=None,
                     help="linear commitment-weight ramp 0 -> vq-beta over "
                          "this many steps (0 = constant)")
    new.add_argument("--vq-use-pallas", action="store_true", default=None,
                     help="use the fused Pallas VQ kernel (ops/vq_pallas.py); "
                          "default off — measured at parity with XLA at "
                          "flagship shapes (BASELINE.md)")
    new.add_argument("--n-lc-out", type=int, default=None,
                     help="channels inside the conditioning upsampler")
    new.add_argument("--n-global-embed", type=int, default=None,
                     help="speaker embedding dim")
    new.add_argument("--lc-upsample-strides", type=_int_tuple, default=None,
                     help="comma list; product must equal hop_sz*down_stride")
    new.add_argument("--lc-upsample-filters", type=_int_tuple, default=None,
                     help="comma list, same length as strides (default 2*stride)")
    # training overrides
    new.add_argument("--batch-sz", type=int, default=None)
    new.add_argument("--n-win", type=int, default=None)
    new.add_argument("--learning-rate", type=float, default=None)
    new.add_argument("--lr-boundaries", type=_int_tuple, default=None,
                     help="comma list of steps at which the LR changes")
    new.add_argument("--lr-values", type=_float_tuple, default=None,
                     help="comma list of LRs, len = len(boundaries)+1")
    new.add_argument("--weight-decay", type=float, default=None)
    new.add_argument("--aux-frame-weight", type=float, default=None,
                     help="latent->MFCC-frame auxiliary loss weight; keeps "
                          "the VQ codebook alive early in training "
                          "(scripts/diag_vq.py; 0 = off)")
    new.add_argument("--grad-clip", type=float, default=None)
    new.add_argument("--holdout-every", type=int, default=None,
                     help="every k-th clip is held out for evaluate()")
    new.add_argument("--seed", type=int, default=None)
    new.add_argument("--compute-dtype", choices=["float32", "bfloat16"], default=None)
    new.add_argument("--frame-norm", choices=["window", "dataset"], default=None,
                     help="MFCC normalization: per-window stats (reference "
                          "behavior) or fixed dataset stats (train==gen)")
    new.add_argument("--pallas-stack", action="store_true", default=None,
                     help="fused Pallas gated-conv training stack (TPU, "
                          "bf16; BASELINE.md head-to-head)")
    # fused-stack kernel knobs (persisted in the checkpointed config so a
    # resume reproduces the exact computation; formerly GATED_* env vars)
    new.add_argument("--gated-tile", type=int, default=None,
                     help="fused-stack forward time tile (default 1024)")
    new.add_argument("--gated-bwd-tile", type=int, default=None,
                     help="fused-stack backward tile (0 = same as forward; "
                          "must divide it)")
    new.add_argument("--no-gated-save-y", dest="gated_save_y",
                     action="store_false", default=None,
                     help="recompute gate pre-activations in the backward "
                          "instead of saving them (less HBM, more FLOPs)")
    new.add_argument("--no-gated-fuse-pairs", dest="gated_fuse_pairs",
                     action="store_false", default=None,
                     help="disable two-layer pair fusion in the fused stack")
    new.add_argument("--gated-bwd-group", type=int, default=None,
                     help=">=3: grouped backward, N consecutive layers per "
                          "kernel with VMEM-resident cotangent streams")
    new.add_argument("--gated-full-fusion", action="store_true", default=None,
                     help="whole-stack single-kernel forward (inter-layer "
                          "streams VMEM-resident; backward keeps the pair "
                          "schedule)")
    new.add_argument("--fastgen-vmem-dil-max", type=int, default=None,
                     help="AR sampler: rings with dilation <= this stay "
                          "VMEM-resident (default 16)")

    res = sub.add_parser("resume", help="resume from the latest checkpoint")
    _add_runtime_flags(res)
    res.add_argument("--step", type=int, default=None, help="checkpoint step")
    res.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                     default=None,
                     help="runtime numerics override (params stay f32; safe "
                          "to change on resume)")
    return p


def config_from_args(a) -> config_mod.RunConfig:
    cfg = config_mod.PRESETS[a.preset]()
    wn, bn, tr, enc = cfg.wavenet, cfg.bottleneck, cfg.train, cfg.encoder
    if a.frame_norm is not None:
        cfg = dataclasses.replace(
            cfg, spec=dataclasses.replace(cfg.spec, norm=a.frame_norm))
    if a.pallas_stack:
        wn = dataclasses.replace(wn, use_pallas_stack=True)

    def over(dc, **kv):
        kv = {k: v for k, v in kv.items() if v is not None}
        return dataclasses.replace(dc, **kv) if kv else dc

    wn = over(wn, n_quant=a.n_quant, n_res=a.n_res, n_dil=a.n_dil,
              n_skp=a.n_skp, n_post=a.n_post, n_blocks=a.n_blocks,
              n_block_layers=a.n_block_layers, n_speakers=a.n_speakers,
              n_lc_out=a.n_lc_out, n_global_embed=a.n_global_embed,
              lc_upsample_strides=a.lc_upsample_strides,
              lc_upsample_filters=a.lc_upsample_filters,
              gated_tile=a.gated_tile, gated_bwd_tile=a.gated_bwd_tile,
              gated_save_y=a.gated_save_y,
              gated_fuse_pairs=a.gated_fuse_pairs,
              gated_full_fusion=a.gated_full_fusion,
              gated_bwd_group=a.gated_bwd_group,
              fastgen_vmem_dil_max=a.fastgen_vmem_dil_max)
    if a.lc_upsample_strides is not None and a.lc_upsample_filters is None:
        wn = dataclasses.replace(
            wn, lc_upsample_filters=tuple(2 * s for s in a.lc_upsample_strides)
        )
    bn = over(bn, kind=a.bottleneck, n_dim=a.bn_dim, vq_k=a.vq_k,
              vq_groups=a.vq_groups,
              jitter_p=a.jitter_p, free_nats=a.free_nats,
              kl_anneal_steps=a.kl_anneal_steps, ema_decay=a.ema_decay,
              vq_beta=a.vq_beta, vq_restart_thresh=a.vq_restart_thresh,
              vq_use_pallas=a.vq_use_pallas,
              vq_warmup_steps=a.vq_warmup_steps)
    if a.bn_dim is not None:
        enc = dataclasses.replace(enc, n_out=a.bn_dim)
        wn = dataclasses.replace(wn, n_lc_in=a.bn_dim)
    if a.lr_boundaries is not None or a.lr_values is not None:
        lb = a.lr_boundaries if a.lr_boundaries is not None else tr.lr_boundaries
        lv = a.lr_values if a.lr_values is not None else tr.lr_values
        if len(lv) != len(lb) + 1:
            raise SystemExit(
                f"--lr-values needs len(--lr-boundaries)+1 entries "
                f"(got {len(lv)} values for {len(lb)} boundaries)"
            )
        tr = dataclasses.replace(tr, lr_boundaries=lb, lr_values=lv)
    tr = over(tr, batch_sz=a.batch_sz, n_win=a.n_win,
              learning_rate=a.learning_rate, grad_clip=a.grad_clip,
              weight_decay=a.weight_decay, holdout_every=a.holdout_every,
              seed=a.seed, compute_dtype=a.compute_dtype,
              aux_frame_weight=a.aux_frame_weight)
    if a.model == "mfcc_inverter":
        # upsampling must invert hop_sz alone (no encoder downsample)
        wn = dataclasses.replace(
            wn, lc_upsample_strides=(5, 4, 4, 2), lc_upsample_filters=(10, 8, 8, 4)
        )
    return dataclasses.replace(
        cfg, wavenet=wn, bottleneck=bn, train=tr, encoder=enc, model_kind=a.model
    )


def main(argv=None) -> int:
    a = build_parser().parse_args(argv)
    # defer heavy imports so --help stays fast
    if a.distributed:
        # must run before any jax API touches the backend
        from ae_wavenet_tpu.parallel.mesh import initialize_distributed
        initialize_distributed(a.coordinator, a.num_processes, a.process_id)
        a.mesh = True
    from ae_wavenet_tpu.parallel.mesh import make_mesh
    from ae_wavenet_tpu.training import checkpoint as ckpt_mod
    from ae_wavenet_tpu.training.chassis import Chassis

    if a.mode == "new":
        cfg = config_from_args(a)
    else:
        if not a.ckpt_dir:
            raise SystemExit("resume requires --ckpt-dir")
        step = ckpt_mod.latest_step(a.ckpt_dir) if a.step is None else a.step
        if step is None:
            raise SystemExit(f"no checkpoints under {a.ckpt_dir}")
        import json
        import os
        with open(os.path.join(a.ckpt_dir, f"step_{step:08d}", "run_config.json")) as f:
            cfg = config_mod.from_json(f.read())

    def over(dc, **kv):
        kv = {k: v for k, v in kv.items() if v is not None}
        return dataclasses.replace(dc, **kv) if kv else dc

    cfg = dataclasses.replace(
        cfg, train=over(cfg.train, n_steps=a.n_steps, log_every=a.log_every,
                        ckpt_every=a.ckpt_every, ckpt_keep=a.ckpt_keep,
                        steps_per_call=a.steps_per_call,
                        compute_dtype=getattr(a, "compute_dtype", None))
    )
    mesh = make_mesh() if a.mesh else None
    profile_dir = a.profile_dir
    if a.profile_steps and profile_dir is None:
        import os
        profile_dir = os.path.join(a.ckpt_dir or ".", "profile")
    ch = Chassis(cfg, a.data, ckpt_dir=a.ckpt_dir, mesh=mesh,
                 tb_logdir=a.tb_logdir, nan_checks=a.nan_checks,
                 profile_dir=profile_dir, profile_steps=a.profile_steps)
    if a.mode == "resume":
        ch.resume(a.step)
        print(f"resumed at step {ch.step}")
    print(config_mod.to_json(cfg))
    ch.train(cfg.train.n_steps, eval_every=a.eval_every)
    if a.ckpt_dir:
        path = ch.save()
        print(f"saved {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

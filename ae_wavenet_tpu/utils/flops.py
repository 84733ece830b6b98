"""Analytic FLOP model for the autoencoder train step (MFU accounting).

The reference publishes no FLOP numbers (SURVEY.md §6); this model exists so
``bench.py`` can report achieved FLOP/s and fraction-of-peak (MFU) next to
samples/sec.  Counting convention: one multiply-accumulate = 2 FLOPs; only
matmul/conv FLOPs are counted (elementwise gates, LayerNorm, softmax-CE,
EMA updates and the Adam step are O(activations) or O(params) and amount to
<1% of the dilated stack's GEMM work at flagship shapes).  The backward pass
of a matmul costs 2x its forward (dL/dx and dL/dW GEMMs), so a train step is
3x the forward count.  Validated against XLA's own HLO cost analysis in
``tests/test_flops.py``.

All sequence lengths are computed exactly with the same VALID-window
arithmetic the model applies (every conv here is VALID; see
models/wavenet.apply and models/encoder.apply).
"""

from __future__ import annotations

from ae_wavenet_tpu.models import autoencoder as ae_mod
from ae_wavenet_tpu.models.common import WindowSpec
from ae_wavenet_tpu.utils.config import RunConfig

# Peak dense bf16 TFLOP/s per chip, published TPU specs.  Keyed by the
# generation tag used on this machine (PALLAS_AXON_TPU_GEN) / device_kind
# substrings.
PEAK_BF16_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def peak_bf16_flops(device_kind: str | None = None) -> float | None:
    """Peak bf16 FLOP/s for this chip, or None if unknown (e.g. CPU)."""
    import os

    if device_kind:
        dk = device_kind.lower().replace(" ", "")
        if "v5lite" in dk:
            return PEAK_BF16_FLOPS["v5e"]
        for k, v in sorted(PEAK_BF16_FLOPS.items(), reverse=True):
            if k in dk:
                return v
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    if gen in PEAK_BF16_FLOPS:
        return PEAK_BF16_FLOPS[gen]
    return None


def _mm(t: int, cout: int, cin: int, k: int = 1) -> int:
    """FLOPs of a length-t 1-D conv as matmul: [cout, cin*k] x [cin*k, t]."""
    return 2 * t * cout * cin * k


def forward_flops(cfg: RunConfig, spec: WindowSpec) -> dict:
    """Per-ITEM (batch element) forward FLOPs, by component."""
    sp, enc, wn, bn = cfg.spec, cfg.encoder, cfg.wavenet, cfg.bottleneck
    out: dict[str, int] = {}

    # --- MFCC frontend (audio/mfcc.py): DFT(cos+sin) + power->mel + DCT,
    # all matmuls over F0 frames of the raw window U[fb:fe]
    f0 = (spec.fe - spec.fb - sp.win_sz) // sp.hop_sz + 1
    n_bins = sp.n_fft // 2 + 1
    out["mfcc"] = (
        2 * _mm(f0, n_bins, sp.win_sz)        # cos + sin DFT matmuls
        + _mm(f0, sp.n_mels, n_bins)          # mel filterbank
        + _mm(f0, sp.n_mfcc, sp.n_mels)       # DCT
    )

    # --- encoder (models/encoder.py): stem 1x1, res pairs of k=3 VALID
    # convs, strided down conv, res pairs, 1x1 head.  VALID lengths tracked
    # exactly.
    t = spec.n_frames
    e = _mm(t, enc.n_ch, enc.n_in)                      # stem
    for _ in range(enc.n_pre_res):
        e += _mm(t - 2, enc.n_ch, enc.n_ch, 3)
        e += _mm(t - 4, enc.n_ch, enc.n_ch, 3)
        t -= 4
    t_down = (t - enc.down_filter) // enc.down_stride + 1
    e += _mm(t_down, enc.n_ch, enc.n_ch, enc.down_filter)
    t = t_down
    for _ in range(enc.n_post_res):
        e += _mm(t - 2, enc.n_ch, enc.n_ch, 3)
        e += _mm(t - 4, enc.n_ch, enc.n_ch, 3)
        t -= 4
    e += _mm(t, enc.n_out, enc.n_ch)                    # head
    out["encoder"] = e
    tz = t  # latent length

    # --- bottleneck: VQ distance matrix is the only GEMM-shaped piece
    if bn.kind == "vq":
        out["bottleneck"] = _mm(tz, bn.vq_k, bn.n_dim)
    else:
        out["bottleneck"] = 0

    # --- aux latent->MFCC head (models/autoencoder.forward)
    if ae_mod.aux_frame_active(cfg):
        out["aux_frame"] = _mm(tz, 3 * sp.n_mfcc, bn.n_dim)
    else:
        out["aux_frame"] = 0

    # --- upsampling transposed convs (phase-decomposed, ops/conv1d.tconv1d):
    # each input position feeds `filter` output taps -> 2*t*cin*cout*f per
    # layer, where t is the PREVIOUS layer's post-trim length (upsample_apply
    # slices each layer's output to its geometry-plan keep before the next)
    u = 0
    t_up, cin = tz, wn.n_lc_in
    for i, f in enumerate(wn.lc_upsample_filters):
        u += _mm(t_up, wn.n_lc_out, cin, f)
        cin = wn.n_lc_out
        t_up = spec.up_steps[i].keep
    out["upsample"] = u

    # --- dilated gated stack (models/wavenet.apply): per layer, two tap
    # matmuls + cond projection over the layer's VALID output length, res
    # 1x1 over the same, skip 1x1 over t_out only
    n_cond = wn.n_lc_out + wn.n_global_embed
    t_out = spec.n_win
    d = 0
    t_l = spec.t_in
    for dil in wn.dilations:
        t_l -= dil * (wn.filter_sz - 1)   # layer output length
        d += 2 * _mm(t_l, 2 * wn.n_dil, wn.n_res)      # w_prev + w_cur
        d += _mm(t_l, 2 * wn.n_dil, n_cond)            # w_cond
        d += _mm(t_l, wn.n_res, wn.n_dil)              # w_res
        d += _mm(t_out, wn.n_skp, wn.n_dil)            # w_skip
    d += _mm(t_out, wn.n_post, wn.n_skp)               # post1
    d += _mm(t_out, wn.n_quant, wn.n_post)             # post2
    out["decoder"] = d

    out["total"] = sum(out.values())
    return out


def train_step_flops_per_item(cfg: RunConfig, spec: WindowSpec) -> int:
    """Forward + backward matmul FLOPs per batch item (3x forward)."""
    return 3 * forward_flops(cfg, spec)["total"]


def train_step_flops_per_sample(cfg: RunConfig, spec: WindowSpec) -> float:
    """Per emitted-loss-sample train FLOPs (the bench's unit of work)."""
    return train_step_flops_per_item(cfg, spec) / spec.n_win

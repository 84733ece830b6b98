"""Independent PyTorch mirror of the tiny-config training step, used as the
loss-curve parity oracle (SURVEY.md §6 north star "matched reconstruction
loss curves"; the reference mount is empty, so parity is demonstrated against
an independent same-math implementation instead).

The mirror consumes the SAME raw int16 windows as the JAX chassis, imports
the SAME initial parameters (via training/torch_compat naming), and runs the
same optimizer — the CE trajectories must then agree to float tolerance.
Every op is written with torch primitives (unfold/conv1d/matmul); only the
config-derived constant matrices (mel filterbank, DCT, DFT, delta kernel)
come from ae_wavenet_tpu.audio.mfcc, since they are data, not model code.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

from ae_wavenet_tpu.audio import mfcc as mfcc_mod
from ae_wavenet_tpu.training.torch_compat import flatten_named
from ae_wavenet_tpu.utils.config import RunConfig


def params_to_torch(params) -> dict:
    """JAX param pytree -> {dotted_name: torch leaf tensor} (trainable)."""
    out = {}
    for k, v in flatten_named(params).items():
        t = torch.from_numpy(np.asarray(v, dtype=np.float32).copy())
        t.requires_grad_(True)
        out[k] = t
    return out


def _mu_encode(x: torch.Tensor, n_quant: int) -> torch.Tensor:
    mu = float(n_quant - 1)
    x = torch.clamp(x, -1.0, 1.0)
    y = torch.sign(x) * torch.log1p(mu * torch.abs(x)) * (1.0 / math.log1p(mu))
    return torch.clamp(torch.round((y + 1.0) * (0.5 * mu)), 0, mu).long()


def _mfcc_stack(wav: torch.Tensor, spec) -> torch.Tensor:
    """wav [B, T] -> [B, 3*n_mfcc, F'] (mirror of audio/mfcc.mfcc_delta_stack)."""
    frames = wav.unfold(-1, spec.win_sz, spec.hop_sz)  # [B, F, win]
    window = torch.from_numpy(
        np.hanning(spec.win_sz + 1)[:-1].astype(np.float32)
    )
    fw = frames * window
    cosm, sinm = mfcc_mod._dft_matrices(spec.win_sz, spec.n_fft)
    re = fw @ torch.from_numpy(cosm)
    im = fw @ torch.from_numpy(sinm)
    power = re.square() + im.square()
    mel = power @ torch.from_numpy(mfcc_mod.mel_filterbank(spec)).T
    logmel = torch.log(torch.clamp(mel, min=1e-10))
    mf = logmel @ torch.from_numpy(
        mfcc_mod.dct_matrix(spec.n_mfcc, spec.n_mels)
    ).T
    mf = mf.transpose(-1, -2)  # [B, n_mfcc, F]

    w = spec.delta_wing
    k = mfcc_mod.delta_kernel(w)

    def delta(x):
        return sum(
            float(k[i]) * x[..., i : x.shape[-1] - 2 * w + i]
            for i in range(2 * w + 1)
        )

    d1 = delta(mf)
    d2 = delta(d1)
    return torch.cat(
        [mf[..., 2 * w : mf.shape[-1] - 2 * w], d1[..., w : d1.shape[-1] - w], d2],
        dim=-2,
    )


def _normalize(frames: torch.Tensor) -> torch.Tensor:
    mean = frames.mean(-1, keepdim=True)
    var = frames.var(-1, unbiased=False, keepdim=True)
    return (frames - mean) / torch.sqrt(var + 1e-6)


def _ln(p: dict, prefix: str, x: torch.Tensor) -> torch.Tensor:
    mean = x.mean(1, keepdim=True)
    var = x.var(1, unbiased=False, keepdim=True)
    xn = (x - mean) / torch.sqrt(var + 1e-6)
    return xn * p[f"{prefix}.g"][None, :, None] + p[f"{prefix}.o"][None, :, None]


def _conv(p, prefix, x, stride=1, dilation=1):
    return F.conv1d(x, p[f"{prefix}.w"], p[f"{prefix}.b"],
                    stride=stride, dilation=dilation)


def _tconv(p, prefix, x, stride):
    """Mirror of ops/conv1d.tconv1d: zero-stuff + full correlation, then keep
    only complete output positions."""
    w, b = p[f"{prefix}.w"], p[f"{prefix}.b"]  # w: [Cout, Cin, f]
    bsz, cin, t = x.shape
    f = w.shape[-1]
    u = x.new_zeros(bsz, cin, (t - 1) * stride + 1)
    u[..., ::stride] = x
    y = F.conv1d(u, w, padding=f - 1)
    y = y[..., f - 1 : y.shape[-1] - (f - 1)]
    return y + b[None, :, None]


def _encoder(p: dict, cfg, x: torch.Tensor) -> torch.Tensor:
    e = cfg.encoder
    x = F.relu(_conv(p, "encoder.stem", x))
    for i in range(e.n_pre_res):
        h = F.relu(_conv(p, f"encoder.pre.{i}.a", x))
        h = _conv(p, f"encoder.pre.{i}.b", h)
        x = _ln(p, f"encoder.pre.{i}.ln", F.relu(x[..., 2:-2] + h))
    x = F.relu(_conv(p, "encoder.down", x, stride=e.down_stride))
    x = _ln(p, "encoder.down_ln", x)
    for i in range(e.n_post_res):
        h = F.relu(_conv(p, f"encoder.post.{i}.a", x))
        h = _conv(p, f"encoder.post.{i}.b", h)
        x = _ln(p, f"encoder.post.{i}.ln", F.relu(x[..., 2:-2] + h))
    return _conv(p, "encoder.head", x)


def _mm(p, prefix, x):
    return torch.einsum("oc,bct->bot", p[f"{prefix}.w"], x) \
        + p[f"{prefix}.b"][None, :, None]


def _wavenet(p: dict, cfg, x_ids, cond, spk):
    wn = cfg.wavenet
    rf = (wn.filter_sz - 1) * sum(wn.dilations)
    t_in = x_ids.shape[-1]
    t_out = t_in - rf
    x = p["wavenet.embed"][x_ids].permute(0, 2, 1)
    g = p["wavenet.gc_embed"][spk][:, :, None].expand(-1, -1, t_in)
    cond = torch.cat([cond, g], 1)
    skip = 0.0
    offset = 0
    for i, d in enumerate(wn.dilations):
        pre = f"wavenet.layers.{i}"
        dd = d * (wn.filter_sz - 1)
        cur = x[..., dd:]
        prev = x[..., : x.shape[-1] - dd]
        y = _mm(p, f"{pre}.w_prev", prev) + _mm(p, f"{pre}.w_cur", cur)
        offset += dd
        y = y + _mm(p, f"{pre}.w_cond", cond[..., offset:t_in])
        f_, g_ = y.chunk(2, 1)
        h = torch.tanh(f_) * torch.sigmoid(g_)
        x = cur + _mm(p, f"{pre}.w_res", h)
        skip = skip + _mm(p, f"{pre}.w_skip", h[..., h.shape[-1] - t_out :])
    h = F.relu(skip)
    h = F.relu(_mm(p, "wavenet.post1", h))
    return _mm(p, "wavenet.post2", h)


def _vq_apply(bn: dict, cfg_bn, z: torch.Tensor, step: int):
    """Deterministic mirror of models/bottlenecks._apply_vq: MXU-style
    distance contraction, EMA codebook update with Laplace smoothing,
    straight-through estimator, commitment warmup.  Jitter and dead-code
    restarts draw JAX RNG (not reproducible from torch) and must be off."""
    assert cfg_bn.jitter_p == 0.0 and cfg_bn.vq_restart_thresh == 0.0, \
        "mirror covers the deterministic VQ config (jitter/restarts off)"
    b, d, t = z.shape
    zf = z.permute(0, 2, 1).reshape(b * t, d)
    e = bn["codebook"]
    d2 = (zf.square().sum(1, keepdim=True) - 2.0 * (zf @ e.T)
          + e.square().sum(1)[None, :])
    idx = d2.argmin(1)
    onehot = F.one_hot(idx, e.shape[0]).float()
    q = onehot @ e
    counts = onehot.sum(0)
    sums = onehot.T @ zf.detach()
    dec = cfg_bn.ema_decay
    nc = dec * bn["ema_counts"] + (1.0 - dec) * counts
    ns = dec * bn["ema_sums"] + (1.0 - dec) * sums
    n = nc.sum()
    smoothed = (nc + cfg_bn.ema_eps) / (n + e.shape[0] * cfg_bn.ema_eps) * n
    new_state = {"codebook": (ns / smoothed[:, None]).detach(),
                 "ema_counts": nc.detach(), "ema_sums": ns.detach()}
    commitment = (zf - q.detach()).square().sum(1).mean()
    w = (min(step / cfg_bn.vq_warmup_steps, 1.0)
         if cfg_bn.vq_warmup_steps > 0 else 1.0)
    zq = zf + (q - zf).detach()
    zq = zq.reshape(b, t, d).permute(0, 2, 1)
    return zq, new_state, w * cfg_bn.vq_beta * commitment


def _vae_apply(p: dict, cfg_bn, z: torch.Tensor, step: int):
    """Mirror of models/bottlenecks._apply_vae on its DETERMINISTIC path
    (train=False: zq = mu, no reparameterization draw — the eps stream is
    JAX RNG the mirror cannot reproduce); the KL term (free-bits floor +
    linear annealing) is identical to the train path, so parity on this
    objective covers the mu/sig heads, the KL math, and the gradient flow."""
    mu = torch.einsum("bdt,ed->bet", z, p["bottleneck.w_mu"]) \
        + p["bottleneck.b_mu"][None, :, None]
    log_sig = torch.einsum("bdt,ed->bet", z, p["bottleneck.w_sig"]) \
        + p["bottleneck.b_sig"][None, :, None]
    log_sig = torch.clamp(log_sig, -7.0, 7.0)
    kl = 0.5 * (mu.square() + torch.exp(2.0 * log_sig) - 2.0 * log_sig - 1.0)
    kl = torch.clamp(kl, min=cfg_bn.free_nats)
    kl = kl.sum(1).mean()
    w = (min(step / cfg_bn.kl_anneal_steps, 1.0)
         if cfg_bn.kl_anneal_steps > 0 else 1.0)
    return mu, w * kl


def step_loss(p: dict, cfg: RunConfig, spec, wav_i16: np.ndarray,
              spk: np.ndarray, bn_state: dict | None = None, step: int = 0):
    """One teacher-forcing step (mirror of models/autoencoder.loss_fn for
    the 'ae', deterministic 'vq', and deterministic 'vae' configs, incl.
    the latent->MFCC auxiliary head).  Returns (total, recon_ce,
    new_bn_state)."""
    assert cfg.bottleneck.kind in ("ae", "vq", "vae"), \
        "mirror covers ae/vq/vae"
    wav = torch.from_numpy(np.asarray(wav_i16)).float() * (1.0 / 32768.0)
    spk = torch.from_numpy(np.asarray(spk)).long()

    frames = _normalize(_mfcc_stack(wav[..., spec.fb : spec.fe], cfg.spec))
    z = _encoder(p, cfg, frames)

    extra = z.new_zeros(())
    new_bn_state = bn_state
    if cfg.bottleneck.kind == "vq":
        zq, new_bn_state, bn_loss = _vq_apply(bn_state, cfg.bottleneck, z, step)
        extra = extra + bn_loss
    elif cfg.bottleneck.kind == "vae":
        zq, bn_loss = _vae_apply(p, cfg.bottleneck, z, step)
        extra = extra + bn_loss
    else:
        zq = z
    if cfg.train.aux_frame_weight > 0:
        # aligned-frame prediction head; the (c0, stride) alignment is a
        # config-derived geometry constant (data, not model code)
        from ae_wavenet_tpu.models.autoencoder import frame_align

        c0, s = frame_align(cfg)
        tz = zq.shape[-1]
        tgt = frames[..., c0 : c0 + s * tz : s].detach()
        pred = torch.einsum("bdt,cd->bct", zq, p["aux_frame.w"]) \
            + p["aux_frame.b"][None, :, None]
        extra = extra + cfg.train.aux_frame_weight * (pred - tgt).square().mean()

    cond = zq
    for i, st in enumerate(spec.up_steps):
        cond = F.relu(_tconv(p, f"wavenet.upsample.{i}", cond,
                             cfg.wavenet.lc_upsample_strides[i]))
        cond = cond[..., st.trim_l : st.trim_l + st.keep]

    ids = _mu_encode(wav, cfg.wavenet.n_quant)
    x_ids = ids[..., spec.w0 : spec.w0 + spec.t_in]
    logits = _wavenet(p, cfg, x_ids, cond, spk)
    targets = ids[..., spec.tgt_b : spec.tgt_b + spec.n_win]
    ce = F.cross_entropy(logits, targets)
    return ce + extra, ce, new_bn_state


def loss(p: dict, cfg: RunConfig, spec, wav_i16: np.ndarray,
         spk: np.ndarray) -> torch.Tensor:
    """One teacher-forcing CE on a raw int16 window batch (plain-AE)."""
    assert cfg.bottleneck.kind == "ae", "use step_loss for vq"
    _, ce, _ = step_loss(p, cfg, spec, wav_i16, spk)
    return ce


def inverter_loss(p: dict, cfg: RunConfig, spec, wav_i16: np.ndarray,
                  spk: np.ndarray) -> torch.Tensor:
    """Mirror of models/mfcc_inverter.loss_fn (vocoder baseline: the WaveNet
    conditioned directly on normalized MFCC, no encoder/bottleneck)."""
    wav = torch.from_numpy(np.asarray(wav_i16)).float() * (1.0 / 32768.0)
    spk = torch.from_numpy(np.asarray(spk)).long()
    cond = _normalize(_mfcc_stack(wav[..., spec.fb : spec.fe], cfg.spec))
    for i, st in enumerate(spec.up_steps):
        cond = F.relu(_tconv(p, f"wavenet.upsample.{i}", cond,
                             cfg.wavenet.lc_upsample_strides[i]))
        cond = cond[..., st.trim_l : st.trim_l + st.keep]
    ids = _mu_encode(wav, cfg.wavenet.n_quant)
    x_ids = ids[..., spec.w0 : spec.w0 + spec.t_in]
    logits = _wavenet(p, cfg, x_ids, cond, spk)
    targets = ids[..., spec.tgt_b : spec.tgt_b + spec.n_win]
    return F.cross_entropy(logits, targets)


def train_curve(cfg: RunConfig, spec, params, sampler, n_steps: int,
                start_step: int = 0, bn_state: dict | None = None,
                return_state: bool = False):
    """Adam-train the mirror on sampler batches; returns per-step recon CE
    (and, with return_state, the final EMA bottleneck state)."""
    p = params_to_torch(params)
    if bn_state is not None:
        bn_state = {k: torch.from_numpy(np.asarray(v, dtype=np.float32).copy())
                    for k, v in bn_state.items()}
    t = cfg.train
    opt = torch.optim.Adam(p.values(), lr=t.learning_rate,
                           betas=(t.adam_b1, t.adam_b2), eps=t.adam_eps)
    ces = []
    for s in range(start_step, start_step + n_steps):
        wav, spk = sampler.batch_at(s)
        opt.zero_grad(set_to_none=True)
        total, ce, bn_state = step_loss(p, cfg, spec, wav, spk, bn_state, s)
        total.backward()
        opt.step()
        ces.append(float(ce.detach()))
    return (ces, bn_state) if return_state else ces

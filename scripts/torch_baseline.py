"""Measure the reference-equivalent PyTorch CPU training throughput.

The reference repo publishes no numbers and its mount is empty (BASELINE.md),
so the baseline is established empirically: this is an independent PyTorch
implementation of the SAME training step our flagship bench runs (Chorowski
encoder + VQ-EMA bottleneck + conditioned WaveNet, identical channel sizes,
batch and window), on CPU like the reference's non-accelerated path.  It is
deliberately GENEROUS to the baseline: MFCC frontend cost is excluded
(precomputed frames are fed), no mu-law host cost is charged, and float32
conv kernels (oneDNN) do the work.

Prints samples/sec; the constant in bench.py records the measured value.
"""

from __future__ import annotations

import json
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)

# flagship dims (mirror ae_wavenet_tpu.utils.config defaults)
N_IN, N_CH, N_BN = 39, 768, 64
VQ_K = 512
N_RES, N_DIL, N_SKP, N_POST, N_QUANT = 384, 256, 256, 256, 256
N_LC_OUT, N_GE, N_SPK = 128, 32, 40
DILATIONS = [2**i for _ in range(2) for i in range(10)]
UP = [(10, 5), (8, 4), (8, 4), (8, 4)]
BATCH, N_WIN = 16, 1600
RF = sum(DILATIONS)


class Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = nn.Conv1d(N_IN, N_CH, 1)
        self.pre = nn.ModuleList([nn.Conv1d(N_CH, N_CH, 3) for _ in range(2)])
        self.down = nn.Conv1d(N_CH, N_CH, 4, stride=2)
        self.post = nn.ModuleList([nn.Conv1d(N_CH, N_CH, 3) for _ in range(4)])
        self.head = nn.Conv1d(N_CH, N_BN, 1)

    def forward(self, x):
        x = F.relu(self.stem(x))
        h = F.relu(self.pre[0](x))
        x = F.relu(x[..., 2:-2] + self.pre[1](h))
        x = F.relu(self.down(x))
        for i in range(0, 4, 2):
            h = F.relu(self.post[i](x))
            x = F.relu(x[..., 2:-2] + self.post[i + 1](h))
        return self.head(x)


class VQEMA(nn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer("codebook", torch.randn(VQ_K, N_BN))
        self.register_buffer("counts", torch.ones(VQ_K))
        self.register_buffer("sums", self.codebook.clone())

    def forward(self, z):
        b, d, t = z.shape
        zf = z.permute(0, 2, 1).reshape(-1, d)
        d2 = torch.cdist(zf, self.codebook)
        idx = d2.argmin(1)
        onehot = F.one_hot(idx, VQ_K).float()
        q = onehot @ self.codebook
        with torch.no_grad():
            self.counts.mul_(0.99).add_(0.01 * onehot.sum(0))
            self.sums.mul_(0.99).add_(0.01 * (onehot.t() @ zf))
            n = self.counts.sum()
            smoothed = (self.counts + 1e-5) / (n + VQ_K * 1e-5) * n
            self.codebook.copy_(self.sums / smoothed[:, None])
        commit = ((zf - q.detach()) ** 2).sum(1).mean()
        zq = zf + (q - zf).detach()
        return zq.reshape(b, t, d).permute(0, 2, 1), 0.25 * commit


class WaveNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.embed = nn.Embedding(N_QUANT, N_RES)
        self.gc = nn.Embedding(N_SPK, N_GE)
        ups, cin = [], N_BN
        for f, s in UP:
            ups.append(nn.ConvTranspose1d(cin, N_LC_OUT, f, stride=s))
            cin = N_LC_OUT
        self.ups = nn.ModuleList(ups)
        self.conv = nn.ModuleList(
            [nn.Conv1d(N_RES, 2 * N_DIL, 2, dilation=d) for d in DILATIONS]
        )
        self.cond = nn.ModuleList(
            [nn.Conv1d(N_LC_OUT + N_GE, 2 * N_DIL, 1) for _ in DILATIONS]
        )
        self.res = nn.ModuleList([nn.Conv1d(N_DIL, N_RES, 1) for _ in DILATIONS])
        self.skip = nn.ModuleList([nn.Conv1d(N_DIL, N_SKP, 1) for _ in DILATIONS])
        self.post1 = nn.Conv1d(N_SKP, N_POST, 1)
        self.post2 = nn.Conv1d(N_POST, N_QUANT, 1)

    def forward(self, ids, z, spk):
        cond = z
        for up in self.ups:
            cond = F.relu(up(cond))
        t_in = ids.shape[-1]
        cond = cond[..., :t_in]
        g = self.gc(spk)[:, :, None].expand(-1, -1, t_in)
        cond = torch.cat([cond, g], 1)
        x = self.embed(ids).permute(0, 2, 1)
        t_out = t_in - RF
        skip = 0
        off = 0
        for i, d in enumerate(DILATIONS):
            y = self.conv[i](x)
            off += d
            y = y + self.cond[i](cond[..., off:])
            f, gate = y.chunk(2, 1)
            h = torch.tanh(f) * torch.sigmoid(gate)
            x = x[..., d:] + self.res[i](h)
            skip = skip + self.skip[i](h[..., h.shape[-1] - t_out:])
        h = F.relu(skip)
        h = F.relu(self.post1(h))
        return self.post2(h)


def main():
    torch.set_num_threads(torch.get_num_threads())
    enc, vq, wn = Encoder(), VQEMA(), WaveNet()
    params = list(enc.parameters()) + list(wn.parameters())
    opt = torch.optim.Adam(params, lr=4e-4)

    # frames for t_in + upsample slack; frontend cost excluded (generous)
    t_in = N_WIN + RF
    n_frames = (t_in // 320 + 14) * 2
    frames = torch.randn(BATCH, N_IN, n_frames)
    ids = torch.randint(0, N_QUANT, (BATCH, t_in))
    tgt = torch.randint(0, N_QUANT, (BATCH, N_WIN))
    spk = torch.randint(0, N_SPK, (BATCH,))

    def step():
        opt.zero_grad(set_to_none=True)
        z, commit = vq(enc(frames))
        logits = wn(ids, z, spk)
        loss = F.cross_entropy(logits, tgt) + commit
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        step()
    dt = time.perf_counter() - t0
    sps = BATCH * N_WIN * n_iter / dt
    print(json.dumps({
        "torch_cpu_samples_per_sec": round(sps, 1),
        "sec_per_step": round(dt / n_iter, 2),
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()

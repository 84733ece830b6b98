"""Packed dataset + deterministic window sampler.

Rebuild of the reference ``data.py`` [H] (~``Slice``/``VirtualBatch``,
SURVEY.md §2.1): memory-maps the packed wav, draws random fixed-length
training windows whose size (loss samples + receptive-field halo + frontend
footprint) was computed by the geometry layer (``models.autoencoder
.WindowSpec``), and yields static-shape int16 batches.

TPU-first redesign of the reference's checkpointable iterator: instead of
saving DataLoader iterator/RNG state, the batch at step ``s`` is a PURE
FUNCTION of ``(seed, s)`` (an independent SeedSequence-derived stream per
step — NOT a shared counter-advanced stream; see batch_at).  Resume ==
restart at the checkpointed step; the sample stream continues identically —
same contract, no mutable state to serialize.
"""

from __future__ import annotations

import json

import numpy as np


class PackedDataset:
    """Memory-mapped packed int16 wav + JSON index (see data/preprocess.py)."""

    def __init__(self, prefix: str):
        with open(prefix + ".json") as f:
            self.index = json.load(f)
        self.data = np.memmap(prefix + ".dat", dtype="<i2", mode="r")
        self.sample_rate = self.index["sample_rate"]
        self.n_speakers = self.index["n_speakers"]
        self.offsets = np.array([c["offset"] for c in self.index["clips"]], np.int64)
        self.lengths = np.array([c["length"] for c in self.index["clips"]], np.int64)
        self.speakers = np.array([c["speaker"] for c in self.index["clips"]], np.int32)

    def __len__(self) -> int:
        return len(self.offsets)


class WindowSampler:
    """Deterministic random-window batches: ``batch_at(step)``.

    Clips shorter than the window are excluded; eligible clips are sampled
    proportionally to the number of valid window positions (matches the
    uniform-over-samples semantics of slicing a concatenated stream, without
    ever crossing clip boundaries).
    """

    def __init__(self, ds: PackedDataset, u_len: int, batch_sz: int,
                 seed: int = 0, clip_indices=None):
        """clip_indices: optional subset of clip rows to draw from (used for
        train/holdout splits)."""
        self.ds = ds
        self.u_len = int(u_len)
        self.batch_sz = int(batch_sz)
        self.seed = int(seed)
        valid = ds.lengths - self.u_len + 1
        mask = valid > 0
        if clip_indices is not None:
            sub = np.zeros(len(ds), bool)
            sub[np.asarray(clip_indices, np.int64)] = True
            mask &= sub
        self.eligible = np.nonzero(mask)[0]
        if len(self.eligible) == 0:
            raise ValueError(
                f"no clip is >= the window length {u_len}; "
                f"max clip length is {int(ds.lengths.max()) if len(ds) else 0}"
            )
        w = valid[self.eligible].astype(np.float64)
        self.probs = w / w.sum()

    def batch_at(self, step: int) -> tuple[np.ndarray, np.ndarray]:
        """-> (wav [B, u_len] int16, speaker [B] int32); pure in (seed, step).

        NOTE: seeded via SeedSequence([seed, step]), NOT a raw Philox counter
        — counter=step advances the stream by one 4-double block per step
        while a batch consumes many blocks, so consecutive steps would share
        ~75% of their draws (verified empirically; severe duplicate-window
        bug)."""
        rng = np.random.default_rng([self.seed, step])
        rows = rng.choice(self.eligible, size=self.batch_sz, p=self.probs)
        max_off = self.ds.lengths[rows] - self.u_len
        offs = self.ds.offsets[rows] + (rng.random(self.batch_sz) * (max_off + 1)).astype(np.int64)
        from ae_wavenet_tpu.data import native

        wav = native.gather_windows(self.ds.data, offs, self.u_len)
        return wav, self.ds.speakers[rows]

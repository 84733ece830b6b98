"""Pluggable bottlenecks: plain AE, VAE (KL-annealed), VQ-VAE with EMA
codebook updates + straight-through estimator + temporal jitter.

Rebuild of the reference bottleneck modules (SURVEY.md §2.1; behavior [H],
algorithms from Chorowski et al. 2019 / van den Oord et al. 2017).

TPU-first design notes
----------------------
* The VQ distance/argmin/one-hot statistics are pure matmuls on the MXU:
  ``d(z, E) = |z|^2 - 2 z E^T + |E|^2`` and the EMA count/sum statistics are
  ``onehot^T @ 1`` / ``onehot^T @ z`` contractions — no scatters.
* EMA buffers are non-gradient state threaded through the train step.  Under
  data parallelism the batch axis is sharded; the contractions above reduce
  over the GLOBAL batch (XLA inserts the psum over ICI automatically when the
  step is jitted with sharded batch inputs) — this is the "fused VQ device
  kernel" + cross-replica EMA psum the north star requires.  A hand-written
  Pallas fusion of the same computation lives in ops/vq_pallas.py.
* All three bottlenecks share one interface::

      params, state = init(key, cfg)
      z_q, state, aux = apply(params, state, cfg, z, rng, step, train)

  where ``aux`` carries loss terms and diagnostics.  ``state`` is empty for
  AE/VAE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ae_wavenet_tpu.utils.config import BottleneckConfig


def init(key: jax.Array, cfg: BottleneckConfig):
    if cfg.kind in ("ae", "zero"):
        return {}, {}
    if cfg.kind == "vae":
        k1, k2 = jax.random.split(key)
        s = 1.0 / jnp.sqrt(cfg.n_dim)
        params = {
            "w_mu": jax.random.normal(k1, (cfg.n_dim, cfg.n_dim), jnp.float32) * s,
            "b_mu": jnp.zeros((cfg.n_dim,), jnp.float32),
            "w_sig": jax.random.normal(k2, (cfg.n_dim, cfg.n_dim), jnp.float32) * s,
            "b_sig": jnp.zeros((cfg.n_dim,), jnp.float32),
        }
        return params, {}
    if cfg.kind == "vq":
        # small-scale init: a N(0,1) codebook sits far outside the encoder's
        # initial output distribution, so one code captures everything and
        # usage collapses (perplexity ~1) for hundreds of steps; 1/sqrt(D)
        # keeps codes inside the data cloud from step one
        g = cfg.vq_groups
        if g == 1:
            shape, counts_shape = (cfg.vq_k, cfg.n_dim), (cfg.vq_k,)
        else:
            # grouped (product) VQ: G independent codebooks over D/G-dim
            # sub-vectors — the bottleneck's information ceiling scales to
            # G * ln(K) nats/latent (SoundStream/EnCodec-style capacity)
            shape = (g, cfg.vq_k, cfg.n_dim // g)
            counts_shape = (g, cfg.vq_k)
        codebook = jax.random.normal(key, shape, jnp.float32) * (
            1.0 / jnp.sqrt(shape[-1]))
        state = {
            "codebook": codebook,
            "ema_counts": jnp.ones(counts_shape, jnp.float32),
            "ema_sums": codebook.copy(),
        }
        return {}, state
    raise ValueError(f"unknown bottleneck kind {cfg.kind!r}")


# ----------------------------------------------------------------- plain AE

def _apply_ae(z):
    return z, {}, {"bn_loss": jnp.float32(0.0)}


# ---------------------------------------------------------------------- VAE

def _apply_vae(params, cfg: BottleneckConfig, z, rng, step, train):
    # z: [B, D, T]
    mu = jnp.einsum("bdt,ed->bet", z, params["w_mu"]) + params["b_mu"][None, :, None]
    log_sig = (
        jnp.einsum("bdt,ed->bet", z, params["w_sig"]) + params["b_sig"][None, :, None]
    )
    log_sig = jnp.clip(log_sig, -7.0, 7.0)
    if train:
        eps = jax.random.normal(rng, mu.shape, mu.dtype)
        zq = mu + jnp.exp(log_sig) * eps
    else:
        zq = mu
    # KL(N(mu, sig) || N(0, 1)) per dim, free-bits floored, averaged
    kl_dims = 0.5 * (jnp.square(mu) + jnp.exp(2.0 * log_sig) - 2.0 * log_sig - 1.0)
    kl = jnp.maximum(kl_dims, cfg.free_nats)
    kl = jnp.mean(jnp.sum(kl, axis=1))  # nats per latent frame
    if cfg.kl_anneal_steps > 0:
        w = jnp.minimum(step.astype(jnp.float32) / cfg.kl_anneal_steps, 1.0)
    else:
        w = jnp.float32(1.0)
    # posterior-health diagnostics (the VAE analogue of VQ perplexity;
    # round-3 lesson: a unit-green bottleneck can still be uselessly
    # collapsed in real training, so the step reports what the latents
    # carry): active_units counts dims whose UNfloored batch-mean KL
    # exceeds 0.02 nats — collapse shows as active_units -> 0 while
    # recon_ce approaches the 'zero'-ablation baseline
    kl_dim_mean = jnp.mean(kl_dims, axis=(0, 2))  # [D], pre-free-bits
    active = jnp.sum((kl_dim_mean > 0.02).astype(jnp.float32))
    aux = {"bn_loss": w * kl, "kl": kl, "kl_weight": w,
           "active_units": active,
           "mu_var": jnp.mean(jnp.var(mu, axis=(0, 2)))}
    return zq, {}, aux


# ------------------------------------------------------------------- VQ-EMA

def _jitter(zq, rng, p):
    """Temporal jitter regularizer (Chorowski §jitter): each timestep is
    independently replaced by its left/right neighbor with prob p/2 each."""
    b, d, t = zq.shape
    u = jax.random.uniform(rng, (b, 1, t))
    left = jnp.concatenate([zq[..., :1], zq[..., :-1]], axis=-1)
    right = jnp.concatenate([zq[..., 1:], zq[..., -1:]], axis=-1)
    out = jnp.where(u < p / 2, left, zq)
    return jnp.where(u > 1.0 - p / 2, right, out)


def _apply_vq(state, cfg: BottleneckConfig, z, rng, step, train,
              axis_name=None):
    # z: [B, D, T] -> flatten to [N, D].  Under shard_map DP (axis_name set)
    # z is the LOCAL shard; EMA statistics are psum'd to the global batch.
    #
    # The computation carries a leading GROUP axis throughout (grouped /
    # product VQ, cfg.vq_groups > 1: G independent codebooks over D/G-dim
    # sub-vectors).  G == 1 keeps the historical unbatched state shapes
    # ([K, D] codebook) so existing checkpoints load unchanged; the [1, ...]
    # views below are free.
    b, d, t = z.shape
    G = max(1, cfg.vq_groups)
    dg = d // G
    if axis_name is not None:
        # decorrelate per-replica stochastic choices (jitter, restarts)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
    e = state["codebook"]          # [K, D] (G=1) or [G, K, D/G]
    eg = e if e.ndim == 3 else e[None]
    cnt0 = state["ema_counts"]
    cntg = cnt0 if cnt0.ndim == 2 else cnt0[None]
    sum0 = state["ema_sums"]
    sumg = sum0 if sum0.ndim == 3 else sum0[None]
    zf = jnp.reshape(jnp.transpose(z, (0, 2, 1)), (b * t, d))
    n_vec = b * t
    if cfg.vq_use_pallas:
        # fused kernel path (G == 1 only, validated at config construction)
        from ae_wavenet_tpu.ops.vq_pallas import vq_lookup_fused

        idx, q, counts, sums = vq_lookup_fused(
            jax.lax.stop_gradient(zf), e, tile_n=min(512, max(8, n_vec))
        )
        counts, sums, q = counts[None], sums[None], q
    else:
        zg = jnp.transpose(jnp.reshape(zf, (n_vec, G, dg)), (1, 0, 2))
        # squared distances via MXU-friendly contraction, per group
        d2 = (
            jnp.sum(jnp.square(zg), axis=2, keepdims=True)
            - 2.0 * jnp.einsum("gnd,gkd->gnk", zg, eg)
            + jnp.sum(jnp.square(eg), axis=2)[:, None, :]
        )  # [G, N, K]
        idx = jnp.argmin(d2, axis=2)  # [G, N]
        onehot = jax.nn.one_hot(idx, cfg.vq_k, dtype=jnp.float32)  # [G, N, K]
        qg = jnp.einsum("gnk,gkd->gnd", onehot, eg)  # [G, N, dg]
        q = jnp.reshape(jnp.transpose(qg, (1, 0, 2)), (n_vec, d))

        # EMA codebook statistics over the GLOBAL batch (sharded-N
        # contraction compiles to a psum over the data axis under pjit).
        counts = jnp.sum(onehot, axis=1)  # [G, K]
        sums = jnp.einsum("gnk,gnd->gkd", onehot,
                          jax.lax.stop_gradient(zg))  # [G, K, dg]
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
        sums = jax.lax.psum(sums, axis_name)
    decay = cfg.ema_decay
    new_counts = decay * cntg + (1.0 - decay) * counts
    new_sums = decay * sumg + (1.0 - decay) * sums
    n = jnp.sum(new_counts, axis=1, keepdims=True)  # [G, 1]
    smoothed = (new_counts + cfg.ema_eps) / (n + cfg.vq_k * cfg.ema_eps) * n
    new_codebook = new_sums / smoothed[..., None]

    if cfg.vq_restart_thresh > 0.0:
        # dead-code random restarts (SoundStream/Jukebox-style): codes whose
        # EMA usage decays below the threshold are re-seeded from random
        # encoder outputs of the current batch — without this, commitment
        # pressure collapses usage to one code (perplexity -> 1).  Under DP
        # the gather of replicated indices from the sharded batch yields
        # identical candidates on every replica.
        rng_r = jax.random.fold_in(rng, 1)
        ridx = jax.random.randint(rng_r, (G, cfg.vq_k), 0, n_vec)
        zg_all = jnp.transpose(jnp.reshape(zf, (n_vec, G, dg)), (1, 0, 2))
        cand = jax.lax.stop_gradient(
            jnp.take_along_axis(zg_all, ridx[..., None], axis=1)
        )  # [G, K, dg]
        if axis_name is not None:
            # every replica must re-seed dead codes IDENTICALLY: broadcast
            # replica 0's candidates (rng was decorrelated above)
            mine = (jax.lax.axis_index(axis_name) == 0).astype(cand.dtype)
            cand = jax.lax.psum(cand * mine, axis_name)
        dead = new_counts < cfg.vq_restart_thresh  # [G, K]
        new_codebook = jnp.where(dead[..., None], cand, new_codebook)
        new_sums = jnp.where(dead[..., None], cand, new_sums)
        new_counts = jnp.where(dead, 1.0, new_counts)
        n_restarts = jnp.sum(dead.astype(jnp.float32))
    else:
        n_restarts = jnp.float32(0.0)

    if e.ndim == 2:  # restore the historical G=1 state shapes
        new_codebook, new_counts, new_sums = (
            new_codebook[0], new_counts[0], new_sums[0])
    new_state = {
        "codebook": new_codebook if train else state["codebook"],
        "ema_counts": new_counts if train else state["ema_counts"],
        "ema_sums": new_sums if train else state["ema_sums"],
    }

    commitment = jnp.mean(jnp.sum(jnp.square(zf - jax.lax.stop_gradient(q)), axis=1))
    # straight-through: gradient flows to z, value is q
    zq = zf + jax.lax.stop_gradient(q - zf)
    zq = jnp.transpose(jnp.reshape(zq, (b, t, d)), (0, 2, 1))
    zq_pre_jitter = zq
    if train and cfg.jitter_p > 0.0:
        zq = _jitter(zq, rng, cfg.jitter_p)

    # per-group usage perplexity, averaged over groups (scale stays
    # comparable to K; the JOINT codeword perplexity would be the product)
    avg = counts / jnp.maximum(jnp.sum(counts, axis=-1, keepdims=True), 1.0)
    perplexity = jnp.mean(
        jnp.exp(-jnp.sum(avg * jnp.log(jnp.maximum(avg, 1e-10)), axis=-1)))
    if cfg.vq_warmup_steps > 0:
        # commitment warmup: see BottleneckConfig.vq_warmup_steps
        w = jnp.minimum(step.astype(jnp.float32) / cfg.vq_warmup_steps, 1.0)
    else:
        w = jnp.float32(1.0)
    aux = {
        "bn_loss": w * cfg.vq_beta * commitment,
        "commitment": commitment,
        "perplexity": perplexity,
        # codebook health: dead codes re-seeded THIS step (0 when restarts
        # are disabled or in eval mode) — trended in long runs
        "restarts": n_restarts if train else jnp.float32(0.0),
        # pre-jitter quantized latents for the aux frame head: jitter is a
        # decoder-side regularizer; aux targets at jittered positions would
        # be systematic label noise (popped from aux before metrics logging)
        "zq_pre_jitter": zq_pre_jitter,
    }
    return zq, new_state, aux


def apply(params, state, cfg: BottleneckConfig, z, rng, step, train: bool,
          axis_name=None):
    """Dispatch on cfg.kind.  z: [B, n_dim, T] -> (z_q, new_state, aux).

    axis_name: data-parallel axis when running inside shard_map — the VQ-EMA
    statistics psum to the global batch (the pjit path needs no axis: XLA
    inserts the psum from the sharded-batch contraction automatically)."""
    if cfg.kind == "ae":
        zq, new_state, aux = _apply_ae(z)
    elif cfg.kind == "zero":
        # conditioning ablation: the decoder sees all-zero local conditioning
        # (and still its speaker embedding); recon CE under 'zero' is the
        # pure-AR baseline that 'ae'/'vq'/'vae' runs are compared against
        zq, new_state, aux = jnp.zeros_like(z), {}, {"bn_loss": jnp.float32(0.0)}
    elif cfg.kind == "vae":
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        zq, new_state, aux = _apply_vae(params, cfg, z, rng, step, train)
    elif cfg.kind == "vq":
        zq, new_state, aux = _apply_vq(state, cfg, z, rng, step, train,
                                       axis_name)
    else:
        raise ValueError(f"unknown bottleneck kind {cfg.kind!r}")
    return zq, new_state, aux

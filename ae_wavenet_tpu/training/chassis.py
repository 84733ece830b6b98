"""Training chassis: owns model/optimizer/loader, runs the compiled step loop.

Rebuild of the reference ``chassis.py`` [H] (SURVEY.md §2.1, §3.1): step
loop, loss accumulation and reporting, LR schedule, periodic checkpointing,
device placement.  TPU-native differences:

* ONE jitted train step (fwd + bwd + optimizer + VQ-EMA update) — the whole
  thing is a single XLA program; buffers are donated so params update
  in-place in HBM.
* Data parallelism: batch sharded over a 1-D mesh, params replicated; XLA
  inserts the grad allreduce over ICI (no xm.optimizer_step equivalent
  needed).
* No per-step host syncs: metrics stay on device and are only fetched at
  log points (the classic torch_xla perf trap the reference had to avoid,
  §3.1).
* RNG: per-step keys are fold_in(base, step) — fully reproducible and
  resume-stable.
"""

from __future__ import annotations

import contextlib
import functools
import signal
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ae_wavenet_tpu.data.dataset import PackedDataset, WindowSampler
from ae_wavenet_tpu.data.loader import device_batches
from ae_wavenet_tpu.models import autoencoder as ae
from ae_wavenet_tpu.parallel import mesh as mesh_mod
from ae_wavenet_tpu.training import checkpoint as ckpt_mod
from ae_wavenet_tpu.utils import debug as debug_mod
from ae_wavenet_tpu.utils import profiling as prof_mod
from ae_wavenet_tpu.utils.config import RunConfig
from ae_wavenet_tpu.utils.logging import MetricsLogger


def make_optimizer(cfg: RunConfig) -> optax.GradientTransformation:
    t = cfg.train
    if t.lr_boundaries:
        schedules = [optax.constant_schedule(v) for v in t.lr_values]
        lr = optax.join_schedules(schedules, list(t.lr_boundaries))
    else:
        lr = t.learning_rate
    tx = []
    if t.grad_clip > 0:
        tx.append(optax.clip_by_global_norm(t.grad_clip))
    if t.weight_decay > 0:
        tx.append(optax.adamw(lr, b1=t.adam_b1, b2=t.adam_b2, eps=t.adam_eps,
                              weight_decay=t.weight_decay))
    else:
        tx.append(optax.adam(lr, b1=t.adam_b1, b2=t.adam_b2, eps=t.adam_eps))
    return optax.chain(*tx)


def make_train_step(cfg: RunConfig, spec: ae.WindowSpec, optimizer, base_key,
                    mesh=None, loss_fn=None, n_steps_per_call: int = 1):
    """Build the single compiled train step.

    (params, opt_state, bn_state, wav_i16, spk, step) ->
    (params, opt_state, bn_state, metrics)

    With ``n_steps_per_call`` K > 1 the compiled program advances K steps
    per dispatch (``lax.scan`` over a staged [K, B, ...] batch block; wav/spk
    gain a leading K axis, ``step`` is the block's FIRST step, and the
    returned metrics are the last step's) — amortizing the fixed per-step
    host dispatch cost that opens a compute-vs-e2e gap on slow hosts
    (BASELINE.md "Chassis e2e").
    """
    loss_fn = ae.loss_fn if loss_fn is None else loss_fn
    k_steps = n_steps_per_call
    dp_impl = cfg.train.dp_impl
    if mesh is not None and cfg.wavenet.use_pallas_stack:
        # pallas_call does not auto-partition under pjit sharding
        # annotations; the fused stack requires the explicit per-shard
        # program (each device runs the kernels on its local batch)
        dp_impl = "shard_map"

    def one_step(params, opt_state, bn_state, wav, spk, step, axis_name):
        rng = jax.random.fold_in(base_key, step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bn_state, metrics)), grads = grad_fn(
            params, bn_state, cfg, spec, wav, spk, rng, step,
            axis_name=axis_name,
        )
        if axis_name is not None:
            # loss/grads are local-batch means; equal shard sizes make the
            # pmean exactly the global-batch mean
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.tree.map(
                lambda v: jax.lax.pmean(v, axis_name), dict(metrics))
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_params, new_opt_state, new_bn_state, metrics

    if k_steps == 1:
        def step_fn(params, opt_state, bn_state, wav, spk, step,
                    axis_name=None):
            return one_step(params, opt_state, bn_state, wav, spk, step,
                            axis_name)
    else:
        def step_fn(params, opt_state, bn_state, wavs, spks, step0,
                    axis_name=None):
            def body(carry, xs):
                params, opt_state, bn_state = carry
                wav, spk, i = xs
                params, opt_state, bn_state, metrics = one_step(
                    params, opt_state, bn_state, wav, spk, step0 + i,
                    axis_name)
                return (params, opt_state, bn_state), metrics
            (params, opt_state, bn_state), ms = jax.lax.scan(
                body, (params, opt_state, bn_state),
                (wavs, spks, jnp.arange(k_steps, dtype=jnp.int32)))
            metrics = jax.tree.map(lambda v: v[-1], ms)
            return params, opt_state, bn_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0, 1, 2))
    from jax.sharding import PartitionSpec as P

    batch_p = P("data") if k_steps == 1 else P(None, "data")
    if dp_impl == "shard_map":
        sm = jax.shard_map(
            functools.partial(step_fn, axis_name="data"),
            mesh=mesh,
            in_specs=(P(), P(), P(), batch_p, batch_p, P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(sm, donate_argnums=(0, 1, 2))
    repl = mesh_mod.replicated(mesh)
    data = jax.sharding.NamedSharding(mesh, batch_p)
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, repl, data, data, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1, 2),
    )


class Chassis:
    """Owns cfg + state; ``train(n)`` runs the loop; checkpoint/resume."""

    def __init__(
        self,
        cfg: RunConfig,
        data_prefix: str,
        ckpt_dir: str | None = None,
        mesh=None,
        log_stream=None,
        tb_logdir: str | None = None,
        nan_checks: bool = False,
        profile_dir: str | None = None,
        profile_steps: int = 0,
    ):
        self.cfg = cfg
        self.ckpt_dir = ckpt_dir
        self.mesh = mesh
        self.logger = MetricsLogger(
            stream=log_stream if log_stream is not None else sys.stdout,
            tb_logdir=tb_logdir,
        )
        self.nan_checks = nan_checks
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps if profile_dir else 0
        # True iff the most recent train() call stopped early on
        # SIGTERM/SIGINT.  The step-count arithmetic callers used before is
        # ambiguous when the signal lands during the FINAL block of a
        # requested range (train() completes the range AND saves) — this
        # flag is not.
        self.preempted = False
        from ae_wavenet_tpu.models import registry
        self.model = registry.get(cfg.model_kind)
        self.spec = self.model.make_window_spec(cfg)
        self.dataset = PackedDataset(data_prefix)
        if cfg.spec.norm == "dataset" and not cfg.spec.stats_mean:
            # compute fixed frame statistics once and bake them into the
            # config (serialized into every checkpoint, so resume and
            # generation normalize identically — models/common.py)
            import dataclasses

            from ae_wavenet_tpu.data.preprocess import dataset_frame_stats
            mean, var = dataset_frame_stats(data_prefix, cfg.spec)
            cfg = dataclasses.replace(
                cfg, spec=dataclasses.replace(cfg.spec, stats_mean=mean,
                                              stats_var=var))
            self.cfg = cfg
        if self.dataset.n_speakers > cfg.wavenet.n_speakers:
            raise ValueError(
                f"dataset has {self.dataset.n_speakers} speakers but "
                f"wavenet.n_speakers={cfg.wavenet.n_speakers}"
            )
        if mesh is not None:
            mesh_mod.check_batch_divisible(cfg.train.batch_sz, mesh)
        # optional clip-level train/holdout split (train.holdout_every=k:
        # every k-th clip is excluded from training and used for eval)
        k = cfg.train.holdout_every
        n_clips = len(self.dataset)
        if k > 0 and n_clips > 1:
            all_idx = np.arange(n_clips)
            hold = all_idx[all_idx % k == 0]
            train_idx = all_idx[all_idx % k != 0]
            if len(train_idx) == 0:
                raise ValueError(
                    f"holdout_every={k} leaves no training clips "
                    f"({n_clips} total)"
                )
        else:
            hold, train_idx = None, None
        self.sampler = WindowSampler(
            self.dataset, self.spec.u_len, cfg.train.batch_sz,
            cfg.train.seed, clip_indices=train_idx,
        )
        self.eval_sampler = None
        if hold is not None:
            try:
                self.eval_sampler = WindowSampler(
                    self.dataset, self.spec.u_len, cfg.train.batch_sz,
                    cfg.train.seed, clip_indices=hold,
                )
            except ValueError as e:
                # a holdout with only too-short clips must not block training
                sys.stderr.write(
                    f"warning: holdout split unusable ({e}); evaluate() will "
                    f"fall back to the training distribution\n"
                )
        self.optimizer = make_optimizer(cfg)
        base_key = jax.random.PRNGKey(cfg.train.seed)
        self.k_steps = max(1, cfg.train.steps_per_call)
        self.step_fn = make_train_step(
            cfg, self.spec, self.optimizer, base_key, mesh,
            self.model.loss_fn, n_steps_per_call=self.k_steps,
        )
        self.step = 0
        self._saver = None
        # best-holdout tracking for checkpoint retention: the most recent
        # holdout recon CE not yet attributed to a save, and the (step, ce)
        # of the best checkpoint so far (protected from pruning, recorded in
        # the BEST sidecar)
        self._unattributed_eval_ce: float | None = None
        self.best_ckpt: tuple[int, float] | None = None
        init_key = jax.random.PRNGKey(cfg.train.seed + 1)
        self.params, self.bn_state = self.model.init(init_key, cfg)
        self.opt_state = self.optimizer.init(self.params)
        if mesh is not None:
            self.params = mesh_mod.put_replicated(self.params, mesh)
            self.bn_state = mesh_mod.put_replicated(self.bn_state, mesh)
            self.opt_state = mesh_mod.put_replicated(self.opt_state, mesh)

    # ------------------------------------------------------------ persist
    def save(self, blocking: bool = True) -> str:
        """blocking=False (the in-loop periodic saves): hand the arrays to
        Orbax's AsyncCheckpointer and keep stepping while background threads
        serialize + write; the train loop only ever pays the device->host
        snapshot.  External callers keep the blocking contract (the save is
        durable when this returns)."""
        tree = {
            "params": self.params,
            "opt_state": self.opt_state,
            "bn_state": self.bn_state,
        }
        if self._saver is None:
            self._saver = ckpt_mod.Saver()
        # attribute the most recent holdout eval (if any happened since the
        # last save) to THIS checkpoint: the best checkpoint is the save
        # immediately following the best holdout eval (attribution staleness
        # is bounded by ckpt_every - eval_every steps)
        ce = self._unattributed_eval_ce
        self._unattributed_eval_ce = None
        if ce is not None and (self.best_ckpt is None or ce < self.best_ckpt[1]):
            self.best_ckpt = (self.step, ce)
        return self._saver.save(self.ckpt_dir, self.step, tree, self.cfg,
                                blocking=blocking,
                                keep_last=self.cfg.train.ckpt_keep,
                                best=self.best_ckpt)

    def wait_for_saves(self) -> None:
        if self._saver is not None:
            self._saver.wait()

    def close(self) -> None:
        """Drain pending saves and release the AsyncCheckpointer's
        background threads.  Safe to call repeatedly; scripts that build
        several Chassis objects in one process (diag twins, test suites)
        should call it when done with each."""
        if self._saver is not None:
            self._saver.close()
            self._saver = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def resume(self, step: int | None = None) -> int:
        step, tree, _cfg = ckpt_mod.load(self.ckpt_dir, step)
        # restore array types/shardings by matching the initialized pytrees
        put = (
            (lambda x: mesh_mod.put_replicated(x, self.mesh))
            if self.mesh is not None
            else jax.device_put
        )
        # guarded positional rebuild, shared by all restore paths
        # (training/checkpoint.merge_into)
        merge = lambda ref, new, what: ckpt_mod.merge_into(ref, new, what, put)
        self.params = merge(self.params, tree["params"], "params")
        self.opt_state = merge(self.opt_state, tree["opt_state"], "opt_state")
        self.bn_state = merge(self.bn_state, tree["bn_state"], "bn_state")
        self.step = step
        # continue best-holdout tracking across the resume (otherwise the
        # first post-resume save could prune the pre-resume best checkpoint)
        self.best_ckpt = ckpt_mod.best_info(self.ckpt_dir)
        return step

    # --------------------------------------------------------------- eval
    def evaluate(self, n_batches: int = 8, stream_offset: int = 1 << 30) -> dict:
        """Eval-mode metrics (no jitter, deterministic bottleneck) averaged
        over ``n_batches``.

        Data: with ``train.holdout_every`` set, batches come from the
        HELD-OUT clip split (true generalization metric).  Otherwise they
        come from the training clips at unseen window offsets — a
        training-distribution loss, NOT a held-out one."""
        if not hasattr(self, "_eval_fn"):
            base_key = jax.random.PRNGKey(self.cfg.train.seed + 2)
            cfg, spec, model = self.cfg, self.spec, self.model

            def eval_fn(params, bn_state, wav, spk, step, axis_name=None):
                rng = jax.random.fold_in(base_key, step)
                _, (_, metrics) = model.loss_fn(
                    params, bn_state, cfg, spec, wav, spk, rng, step,
                    train=False, axis_name=axis_name,
                )
                if axis_name is not None:
                    metrics = jax.tree.map(
                        lambda v: jax.lax.pmean(v, axis_name), dict(metrics))
                return metrics

            # mesh-aware, mirroring make_train_step: under --distributed the
            # params are GLOBAL (multi-process) arrays, so the eval batch
            # must be placed against the same mesh sharding and the step
            # jitted over it — a plain jit of process-local arrays would mix
            # local and global arrays in one program and fail on every host.
            if self.mesh is None:
                self._eval_fn = jax.jit(eval_fn)
            else:
                dp_impl = self.cfg.train.dp_impl
                if self.cfg.wavenet.use_pallas_stack:
                    dp_impl = "shard_map"  # pallas_call can't auto-partition
                repl = mesh_mod.replicated(self.mesh)
                data = mesh_mod.batch_sharding(self.mesh)
                if dp_impl == "shard_map":
                    from jax.sharding import PartitionSpec as P

                    sm = jax.shard_map(
                        functools.partial(eval_fn, axis_name="data"),
                        mesh=self.mesh,
                        in_specs=(P(), P(), P("data"), P("data"), P()),
                        out_specs=P(),
                        check_vma=False,
                    )
                    self._eval_fn = jax.jit(sm)
                else:
                    self._eval_fn = jax.jit(
                        eval_fn,
                        in_shardings=(repl, repl, data, data, repl),
                        out_shardings=repl,
                    )
        put = (
            (lambda x: mesh_mod.put_sharded(np.asarray(x),
                                            mesh_mod.batch_sharding(self.mesh)))
            if self.mesh is not None
            else jnp.asarray
        )
        totals: dict = {}
        sampler = self.eval_sampler if self.eval_sampler is not None else self.sampler
        for i in range(n_batches):
            wav, spk = sampler.batch_at(stream_offset + self.step + i)
            m = self._eval_fn(self.params, self.bn_state, put(wav), put(spk),
                              jnp.int32(self.step))
            # ONE D2H transfer for the whole dict: per-item float(v) costs a
            # synchronous device roundtrip PER METRIC (~1 RTT each — dominant
            # on high-latency links; measured 2026-08-17, BASELINE.md e2e)
            for k, v in jax.device_get(m).items():
                totals[k] = totals.get(k, 0.0) + float(v) / n_batches
        totals["split"] = "holdout" if self.eval_sampler is not None else "train"
        return totals

    # -------------------------------------------------------------- train
    def train(self, n_steps: int | None = None,
              eval_every: int = 0) -> list[dict]:
        t_cfg = self.cfg.train
        n_steps = t_cfg.n_steps if n_steps is None else n_steps
        self.preempted = False
        kk = self.k_steps
        if n_steps % kk:
            raise ValueError(
                f"n_steps={n_steps} must be a multiple of "
                f"steps_per_call={kk} (static block shapes)")
        if self.mesh is None:
            sharding = None
        elif kk == 1:
            sharding = mesh_mod.batch_sharding(self.mesh)
        else:
            sharding = mesh_mod.block_sharding(self.mesh)

        def crossed(every: int, lo: int, hi: int) -> bool:
            # a multiple of `every` lies in (lo, hi] — the K-step-safe
            # generalization of `(s + 1) % every == 0`
            return every > 0 and (hi // every) > (lo // every)
        history: list[dict] = []
        start = self.step
        t0 = time.time()
        samples_done = 0

        # preemption-aware checkpointing (SURVEY.md §5 failure detection):
        # on SIGTERM/SIGINT finish the in-flight step, save, and return.
        stop = {"flag": False}
        old_handlers = {}
        if self.ckpt_dir and threading.current_thread() is threading.main_thread():
            def _handler(signum, frame):
                stop["flag"] = True
            for sig in (signal.SIGTERM, signal.SIGINT):
                old_handlers[sig] = signal.signal(sig, _handler)

        multi = self.mesh is not None and jax.process_count() > 1

        # multi-host stop checks run on their own small fixed cadence,
        # NOT log_every: with a large log_every the SIGTERM-to-save latency
        # could exceed the preemption grace window
        stop_check_every = min(t_cfg.log_every, 50)

        def stop_requested(lo: int, hi: int) -> bool:
            # single-process: act on the local flag immediately.  Multi-host:
            # checkpoint.save is a collective, so acting on a host-local flag
            # would have hosts saving at DIFFERENT steps (barrier deadlock —
            # the signal lands at a different loop iteration on each host).
            # Instead every host joins an allgather of the flags at a fixed
            # small cadence (deterministic, identical on all hosts) and they
            # stop together iff any host was signalled.
            if not multi:
                return stop["flag"]
            if not crossed(stop_check_every, lo, hi):
                return False
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.asarray([stop["flag"]]))
            return bool(np.asarray(flags).any())

        # Perfetto trace of the first profile_steps steps (utils/profiling)
        prof_stack = contextlib.ExitStack()
        profiling = False
        if self.profile_steps > 0:
            prof_stack.enter_context(prof_mod.trace(self.profile_dir))
            profiling = True
        try:
            for s, (wav, spk) in device_batches(
                self.sampler, self.step, n_steps, sharding, block=kk
            ):
                self.params, self.opt_state, self.bn_state, metrics = self.step_fn(
                    self.params, self.opt_state, self.bn_state, wav, spk, jnp.int32(s)
                )
                self.step = s + kk
                samples_done += kk * t_cfg.batch_sz * self.spec.n_win
                if profiling and self.step - start >= self.profile_steps:
                    jax.block_until_ready(metrics)
                    prof_stack.close()
                    profiling = False
                    self.logger.log(self.step, {"profile_trace": self.profile_dir})
                if crossed(t_cfg.log_every, s, self.step) \
                        or self.step == start + n_steps:
                    # one transfer for all metrics (see evaluate(): per-item
                    # float() pays one sync roundtrip per metric)
                    fetched = {k: float(v)
                               for k, v in jax.device_get(metrics).items()}
                    if self.nan_checks:
                        if not all(np.isfinite(v) for v in fetched.values()):
                            raise FloatingPointError(
                                f"non-finite metrics at step {self.step}: {fetched}"
                            )
                        debug_mod.assert_all_finite(self.params, "params")
                    dt = time.time() - t0
                    rec = {
                        "step": self.step,
                        "samples_per_sec": samples_done / max(dt, 1e-9),
                        **fetched,
                    }
                    history.append(rec)
                    self.logger.log(self.step, {k: v for k, v in rec.items()
                                                if k != "step"})
                    t0 = time.time()
                    samples_done = 0
                if eval_every and crossed(eval_every, s, self.step):
                    ev = {f"eval_{k}": v for k, v in self.evaluate().items()}
                    self.logger.log(self.step, ev)
                    if "eval_recon_ce" in ev:
                        self._unattributed_eval_ce = float(ev["eval_recon_ce"])
                if self.ckpt_dir and crossed(t_cfg.ckpt_every, s, self.step):
                    self.save(blocking=False)
                if stop_requested(s, self.step):
                    self.preempted = True
                    path = self.save()
                    self.logger.log(self.step,
                                    {"preempted_at": self.step, "saved": path})
                    break
        finally:
            prof_stack.close()
            # async saves issued in-loop must be durable before train()
            # returns (callers resume/read checkpoints right after)
            self.wait_for_saves()
            # restore on every exit path (a raised loader/eval exception must
            # not leave the process un-interruptible)
            for sig, h in old_handlers.items():
                signal.signal(sig, h)
        return history

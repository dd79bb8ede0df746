"""Training loop: jitted SPMD train step over a data-parallel mesh.

Reference hot loop (SURVEY.md §4.1): Python epoch loop with eager forward /
backward per batch, DataParallel scatter-gather per step.  TPU-native: ONE
jitted step function (clip scan + loss + grad + Adam update fused into a
single XLA program), donated train state, batch sharded over the 'data' mesh
axis so the gradient all-reduce rides ICI; the Python loop only feeds numpy
batches and reads back scalar metrics every log interval.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import optax

from bin_tpu.config import Config
from bin_tpu.parallel.mesh import MeshPlan, make_mesh
from bin_tpu.registry import Model, build_model
from bin_tpu.training.state import TrainState, create_train_state, make_optimizer
from bin_tpu.utils.logging import MetricLogger

__all__ = ["make_train_step", "train_loop", "train"]


def make_train_step(model: Model, cfg: Config,
                    plan: MeshPlan | None = None) -> Callable:
    """Build the jitted train step: (TrainState, batch) → (TrainState, aux).

    batch = {"blurry": (B,K,H,W,3), "sharp": (B,2K-1,H,W,3)} — already
    device-put with the plan's batch sharding when a mesh is used.
    """
    from bin_tpu.losses import build_perceptual_fn

    optimizer = make_optimizer(cfg.optim)
    perceptual_fn = build_perceptual_fn(cfg.loss)

    def step(state: TrainState, batch: dict[str, jax.Array]):
        # uint8 batches (data.transfer_u8) are normalized ON DEVICE: the
        # host ships 4x fewer bytes per step through the PJRT tunnel.
        batch = {k: (v.astype(jnp.float32) / 255.0
                     if v.dtype == jnp.uint8 else v)
                 for k, v in batch.items()}

        def loss_fn(params, blurry, sharp):
            return model.loss_clip(params, blurry, sharp,
                                   cfg.loss, perceptual_fn=perceptual_fn)

        accum = max(1, cfg.optim.grad_accum_steps)
        if accum == 1:
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch["blurry"],
                                       batch["sharp"])
        else:
            # Gradient accumulation: scan over microbatches INSIDE the one
            # jitted step — peak activation memory drops to 1/accum while
            # the update stays bit-equivalent to the unsplit step (the loss
            # is a batch mean, so the mean of equal-size microbatch grads
            # IS the full-batch grad).  One optimizer update per step, so
            # lr schedule / EMA / clipping semantics are unchanged.
            b = batch["blurry"].shape[0]
            if b % accum:
                raise ValueError(f"batch {b} not divisible by "
                                 f"grad_accum_steps={accum}")
            micro = {k: v.reshape(accum, b // accum, *v.shape[1:])
                     for k, v in batch.items()}

            def one(params, mb):
                return jax.value_and_grad(loss_fn, has_aux=True)(
                    params, mb["blurry"], mb["sharp"])

            def body(carry, mb):
                (l, a), g = one(state.params, mb)
                loss_sum, aux_sum, grad_sum = carry
                return (loss_sum + l,
                        jax.tree.map(jnp.add, aux_sum, a),
                        jax.tree.map(jnp.add, grad_sum, g)), None

            (l0, a0), g0 = one(state.params,
                               jax.tree.map(lambda v: v[0], micro))
            rest = jax.tree.map(lambda v: v[1:], micro)
            (loss_s, aux_s, grad_s), _ = jax.lax.scan(
                body, (l0, a0, g0), rest)
            scale = 1.0 / accum
            loss = loss_s * scale
            aux = jax.tree.map(lambda v: v * scale, aux_s)
            grads = jax.tree.map(lambda v: v * scale, grad_s)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        aux["grad_norm"] = optax.global_norm(grads)
        d = cfg.optim.ema_decay
        ema = (jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                            state.ema_params, params)
               if d > 0 and state.ema_params is not None else state.ema_params)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, ema_params=ema), aux

    # With a mesh, jit infers the SPMD partitioning from input shardings:
    # state arrives replicated, the batch arrives sharded over 'data', so
    # XLA emits the gradient all-reduce over ICI by itself (SURVEY.md §6.8).
    return jax.jit(step, donate_argnums=0)


def device_prefetch(batches: Iterator[dict[str, Any]], size: int = 2,
                    plan: MeshPlan | None = None) -> Iterator[dict[str, Any]]:
    """Overlap host→device transfer with compute.

    jax.device_put is asynchronous: keeping ``size`` batches in flight hides
    the transfer latency behind the previous step's device time — essential
    here, where the device sits behind a high-latency PJRT tunnel and a
    synchronous upload would serialize ~0.5 s per step.
    """
    import collections
    queue: collections.deque = collections.deque()

    def put_next():
        batch = next(batches)
        if plan is not None:
            from bin_tpu.parallel.mesh import shard_batch
            queue.append(shard_batch(plan, batch))
        else:
            queue.append(jax.device_put(batch))

    try:
        for _ in range(size):
            put_next()
        while queue:
            yield queue.popleft()
            try:
                put_next()
            except StopIteration:
                pass
    except StopIteration:
        while queue:
            yield queue.popleft()


class StallWatchdog:
    """Abort the process if the training loop stops making progress.

    Failure-detection subsystem (SURVEY.md §6.3).  The device sits behind a
    PJRT tunnel that can wedge indefinitely (observed live: a remote compile
    that never returned after 55 min of zero CPU activity, while cold
    compiles of the same program family finish in <10 min).  A wedged run
    holds the chip and its queue slot until an outer timeout kills it hours
    later; exiting promptly with a distinct code (91) lets wrapper scripts
    retry, and resume is exact (checkpoint + grain loader state replay).

    The main loop calls ``beat()`` whenever the device demonstrably made
    progress (a jitted step returned from trace/compile, or a metrics
    device_get completed).  A daemon thread fires ``os._exit(EXIT_CODE)``
    when no beat arrives for ``timeout_s`` — os._exit, not an exception,
    because the main thread is stuck in a C-level blocking call that no
    Python exception can interrupt.
    """

    EXIT_CODE = 91

    def __init__(self, timeout_s: float):
        import threading
        self.timeout_s = timeout_s
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._watch, daemon=True,
                                        name="stall-watchdog")
        self._thread.start()

    def beat(self) -> None:
        self._last = time.monotonic()

    def stop(self) -> None:
        self._stop.set()

    def _watch(self) -> None:
        import sys
        while not self._stop.wait(min(30.0, self.timeout_s / 4)):
            idle = time.monotonic() - self._last
            if idle > self.timeout_s:
                print(f"[stall-watchdog] no train-loop progress for "
                      f"{idle:.0f}s (> {self.timeout_s:.0f}s): the device "
                      "tunnel is wedged; exiting 91 so the wrapper can "
                      "retry (resume is exact)", file=sys.stderr, flush=True)
                sys.stderr.flush()
                os._exit(self.EXIT_CODE)


def train_loop(cfg: Config, model: Model, state: TrainState,
               batches: Iterator[dict[str, Any]], num_steps: int,
               logger: MetricLogger, plan: MeshPlan | None = None,
               checkpoint_cb: Callable[[int, TrainState], None] | None = None,
               start_step: int = 0) -> TrainState:
    """Run ``num_steps`` steps; ``start_step`` is the restored global step so
    logging/checkpoint indices continue instead of restarting at 1."""
    step_fn = make_train_step(model, cfg, plan)
    log_every = max(1, cfg.log.log_interval_steps)
    t_last = time.monotonic()
    frames_since = 0
    profiler_active = False
    watchdog = (StallWatchdog(cfg.log.stall_timeout_s)
                if cfg.log.stall_timeout_s > 0 else None)
    device_batches = device_prefetch(batches, size=max(2, cfg.data.prefetch),
                                     plan=plan)
    for i in range(num_steps):
        # Tracing/profiling subsystem (SURVEY.md §6.1): capture a short
        # jax.profiler trace once steady state is reached (steps 10..14).
        if cfg.log.profile_dir and i == 10 and not profiler_active:
            jax.profiler.start_trace(cfg.log.profile_dir)
            profiler_active = True
        if profiler_active and i == 15:
            jax.profiler.stop_trace()
            profiler_active = False
        batch = next(device_batches)
        frames_since += batch["blurry"].shape[0] * batch["blurry"].shape[1]
        state, aux = step_fn(state, batch)
        if watchdog is not None:
            watchdog.beat()  # step i dispatched (first call: compile done)
        step_num = start_step + i + 1
        if step_num % log_every == 0 or i + 1 == num_steps:
            aux = jax.device_get(aux)  # sync point, only at log interval
            if watchdog is not None:
                watchdog.beat()  # device executed through step i
            now = time.monotonic()
            fps = frames_since / max(now - t_last, 1e-9)
            t_last, frames_since = now, 0
            logger.log(step_num, input_fps=fps,
                       **{k: float(v) for k, v in aux.items()})
        if checkpoint_cb is not None:
            checkpoint_cb(step_num, state)
    if profiler_active:  # num_steps < 15: don't leak an active profiler
        jax.profiler.stop_trace()
    if watchdog is not None:
        watchdog.stop()
    return state


def train(cfg: Config, workdir: str = "runs/latest",
          num_steps: int | None = None,
          init_params_from: str = "") -> TrainState:
    """End-to-end entry: data, model, mesh, checkpoints, loop (CLI target).

    ``init_params_from``: warm-start parameters from another run's
    checkpoint directory (fresh optimizer state) — the reference factory's
    load-pretrained path (SURVEY.md §3.2), also the escape hatch when the
    optimizer-state schema changed between runs.
    """
    from bin_tpu.data.pipeline import SyntheticSource, train_iterator
    from bin_tpu.training import checkpoint as ckpt

    from bin_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    # Multi-host: join the jax.distributed job BEFORE any backend touch.
    # No-op in single-process runs (bin_tpu/parallel/distributed.py).
    from bin_tpu.parallel.distributed import maybe_initialize
    maybe_initialize()

    num_steps = num_steps or cfg.optim.num_steps
    if cfg.log.debug_nans:
        jax.config.update("jax_debug_nans", True)
    os.makedirs(workdir, exist_ok=True)
    # one writer: every process trains, process 0 logs (shared workdir)
    logger = (MetricLogger(os.path.join(workdir, cfg.log.jsonl_path))
              if jax.process_index() == 0
              else MetricLogger(None, stream=None))

    model = build_model(cfg)
    rng = jax.random.key(cfg.seed)
    state = create_train_state(cfg, model, rng)
    if init_params_from:
        from bin_tpu.training.checkpoint import restore_params
        import jax.numpy as jnp
        restored = restore_params(init_params_from)
        # Re-seat the EMA shadow AT the restored params too (same contract
        # as create_train_state: "EMA initialized AT the params").  Leaving
        # it at the random init poisons every EMA eval of a warm-started
        # fine-tune: after 2k steps at decay 0.999 the shadow still holds
        # e^-2 ~ 13.5% random weights — measured 26.31 dB vs the 28.5 raw
        # (runs/r4_qat128b, round 4).  jnp.copy for the same donation-
        # aliasing reason as in create_train_state.
        state = state.replace(
            params=restored,
            ema_params=(jax.tree.map(jnp.copy, restored)
                        if state.ema_params is not None else None))

    plan = None
    if cfg.parallel.data_axis_size != 1 or cfg.parallel.spatial_axis_size != 1:
        plan = make_mesh(cfg.parallel)
        from bin_tpu.parallel.mesh import replicated
        state = replicated(plan, state)

    # Multi-host input contract: cfg.data.batch_size is the GLOBAL batch;
    # each process loads only its process_batch_slice rows and shard_batch
    # assembles the global array (bin_tpu/parallel/mesh.py).
    local_batch, batch_offset = cfg.data.batch_size, 0
    multihost = jax.process_count() > 1
    if multihost:
        if plan is None:
            raise ValueError(
                "multi-process training needs a device mesh — set "
                "parallel.data_axis_size (e.g. -1) so the batch shards")
        from bin_tpu.parallel.distributed import process_batch_slice
        local_batch, batch_offset = process_batch_slice(cfg.data.batch_size)

    manager = ckpt.make_manager(os.path.join(workdir, cfg.checkpoint.directory),
                                cfg.checkpoint)
    state = ckpt.restore_if_available(manager, state)
    start_step = int(jax.device_get(state.step))

    source = _make_source(cfg)
    use_grain = cfg.data.loader == "grain" or cfg.data.num_workers > 0
    loader_state_at = None
    if use_grain:
        # Grain loader: deterministic + checkpointable.  Loader state is
        # saved per checkpoint so a resumed run replays the EXACT batch
        # sequence of an uninterrupted one (SURVEY.md §6.2/§6.4).  Because
        # device_prefetch pulls ahead, the state snapshot taken after
        # producing batch i is indexed by CONSUMED step, not produce time.
        from bin_tpu.data.grain_pipeline import grain_train_iterator
        loader_dir = os.path.join(workdir, cfg.checkpoint.directory + "_loader")
        os.makedirs(loader_dir, exist_ok=True)
        grain_it = grain_train_iterator(
            source, local_batch, cfg.data.crop_size, seed=cfg.seed,
            random_flip=cfg.data.random_flip, num_workers=cfg.data.num_workers,
            keep_u8=cfg.data.transfer_u8, shard_by_process=multihost)

        def state_name(step: int) -> str:
            # per-process files: each host checkpoints/replays its own shard
            return (f"{step}.p{jax.process_index()}.bin" if multihost
                    else f"{step}.bin")

        if start_step > 0:
            path = os.path.join(loader_dir, state_name(start_step))
            if os.path.exists(path):
                with open(path, "rb") as f:
                    grain_it.set_state(f.read())
            else:
                # Without the saved state the stream restarts at batch 0 and
                # the exact-replay guarantee is broken — never fail silently.
                import warnings
                warnings.warn(
                    f"resuming from step {start_step} but no loader state at "
                    f"{path}; the batch stream restarts from the beginning "
                    "and early batches will be re-trained on "
                    "(exact replay broken)", stacklevel=2)

        produced: dict[int, bytes] = {}

        def batches_gen():
            i = 0
            while True:
                b = next(grain_it)
                i += 1
                produced[i] = grain_it.get_state()
                yield b

        def loader_state_at(step: int) -> bytes:
            idx = step - start_step
            st = produced[idx]
            for k in [k for k in produced if k < idx]:
                del produced[k]  # bound memory on long runs
            return st

        batches = batches_gen()
    else:
        batches = train_iterator(source, cfg.data.batch_size,
                                 cfg.data.crop_size, seed=cfg.seed,
                                 random_flip=cfg.data.random_flip,
                                 prefetch=cfg.data.prefetch,
                                 keep_u8=cfg.data.transfer_u8)
        if multihost:
            # The threaded iterator is seeded by cfg.seed, so every process
            # produces the IDENTICAL global batch stream; each keeps only
            # its slice (the grain loader shards at the source instead —
            # prefer data.loader=grain for real multi-host input).
            def _slice(gen):
                for b in gen:
                    yield {k: v[batch_offset:batch_offset + local_batch]
                           for k, v in b.items()}
            batches = _slice(batches)

    def save_now(step: int, s: TrainState):
        ckpt.save(manager, step, s)
        if loader_state_at is not None:
            with open(os.path.join(loader_dir, state_name(step)), "wb") as f:
                f.write(loader_state_at(step))
            mine = sorted(
                (p for p in os.listdir(loader_dir)
                 if p.endswith(".bin")
                 and p == state_name(int(p.split(".")[0]))),
                key=lambda p: int(p.split(".")[0]))  # numeric, not lexical
            for old in mine[:-cfg.checkpoint.keep_last_n]:
                os.remove(os.path.join(loader_dir, old))

    # In-training validation + best-weights tracking (the reference's
    # per-epoch val + torch.save best, SURVEY.md §4.1): every
    # log.eval_interval_steps, run a bounded eval pass (log.eval_clips
    # clips under the preset's eval protocol), log eval_* metrics, and
    # keep the best-PSNR weights at <workdir>/best.npz.
    eval_cb = None
    if cfg.log.eval_interval_steps > 0 and multihost:
        # Rank 0 running a minutes-long eval while every other rank sits at
        # the collective Orbax save barrier stalls all hosts per interval
        # (and risks the barrier timeout on the first eval compile) —
        # validate offline with bin-tpu-eval on multi-host runs instead.
        import warnings
        warnings.warn("log.eval_interval_steps is disabled under multi-host "
                      "training (collective-save barrier would stall on "
                      "rank 0's eval); run bin-tpu-eval offline", stacklevel=2)
    elif cfg.log.eval_interval_steps > 0:
        import itertools

        from bin_tpu.data.pipeline import eval_clips
        from bin_tpu.evaluation.evaluator import evaluate
        from bin_tpu.weights import export_weights

        eh, ew = cfg.data.eval_size
        n_eval = max(1, cfg.log.eval_clips)
        ekeys = max(cfg.data.eval_num_keys or 0, cfg.model.window_size + 2)
        if cfg.data.dataset == "synthetic" or not cfg.data.root:
            eval_source = SyntheticSource(
                num_samples=n_eval, num_keys=ekeys, height=eh, width=ew,
                taps=cfg.data.blur_taps, stride=cfg.data.blur_stride,
                seed=cfg.data.eval_seed, style=cfg.data.synthetic_style)
        else:
            from bin_tpu.data.frames import FrameFolderSource
            eval_source = FrameFolderSource(
                cfg.data.root, num_keys=ekeys, resize_to=(eh, ew),
                clip_list=cfg.data.eval_list)
        best = {"psnr": float("-inf")}
        best_path = os.path.join(workdir, "best.npz")
        if os.path.exists(best_path):
            # resume: seed the threshold from the existing card so a worse
            # post-resume eval can't overwrite the real best weights
            from bin_tpu.weights import read_card
            try:
                best["psnr"] = float(
                    read_card(best_path)["metadata"]["psnr_overall"])
            except Exception:  # unreadable card: keep -inf, overwrite
                pass
        use_ema = cfg.optim.ema_decay > 0
        _fn_cache: dict = {}  # persists across intervals: no per-eval rejit

        def eval_cb(step: int, s: TrainState):
            params = s.ema_params if (use_ema and s.ema_params is not None) \
                else s.params
            results = evaluate(
                model, params,
                itertools.islice(  # bound folder datasets to n_eval clips
                    eval_clips(eval_source, batch_size=1), n_eval),
                verbose=False, fn_cache=_fn_cache)
            logger.log(step, **{f"eval_{k}": v for k, v in results.items()})
            p = results.get("psnr_overall", float("-inf"))
            if p > best["psnr"]:
                best["psnr"] = p
                export_weights(
                    best_path, jax.device_get(params), cfg.model,
                    {"step": int(step), "psnr_overall": float(p),
                     "preset": cfg.preset, "ema": bool(use_ema),
                     "eval_clips": n_eval, "eval_size": [eh, ew]})

    def save_cb(step: int, s: TrainState):
        if eval_cb is not None and step % cfg.log.eval_interval_steps == 0:
            eval_cb(step, s)
        if step % cfg.checkpoint.save_interval_steps == 0:
            save_now(step, s)

    # ``num_steps`` is the TOTAL step target: a resumed run trains only the
    # remainder (the reference's --resume semantics, SURVEY.md §6.4).
    remaining = max(0, num_steps - start_step)
    state = train_loop(cfg, model, state, batches, remaining, logger, plan,
                       checkpoint_cb=save_cb, start_step=start_step)
    final_step = start_step + remaining
    if remaining and final_step % cfg.checkpoint.save_interval_steps != 0:
        # Always leave a checkpoint at the last step (the reference saves at
        # every epoch boundary; short runs must still be evaluable/resumable).
        save_now(final_step, state)
    manager.wait_until_finished()
    logger.close()
    return state


def _make_source(cfg: Config):
    from bin_tpu.data.pipeline import SyntheticSource
    if cfg.data.dataset == "synthetic":
        ch, cw = cfg.data.crop_size
        return SyntheticSource(num_samples=256, num_keys=cfg.data.seq_len,
                               height=ch + 16, width=cw + 16,  # room to crop
                               taps=cfg.data.blur_taps,
                               stride=cfg.data.blur_stride, seed=cfg.seed,
                               cache=True, as_u8=True,
                               style=cfg.data.synthetic_style)
    from bin_tpu.data.frames import FrameFolderSource
    # raw_u8: keep frames uint8 so the pipeline takes the fused native
    # crop+normalize path (training only; eval needs resizable floats)
    return FrameFolderSource(cfg.data.root, num_keys=cfg.data.seq_len,
                             raw_u8=True, clip_list=cfg.data.train_list)

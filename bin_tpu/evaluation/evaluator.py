"""Full-clip evaluation: sliding-window inference + PSNR/SSIM tables.

Reference flow (SURVEY.md §4.2): per video, reset ConvLSTM states, slide the
window, accumulate PSNR/SSIM on CPU after device→host copies.  TPU-native:
the whole clip scan AND the metrics run in one jitted program per clip shape
— only three scalars per clip cross back to the host.  Tables split
deblurred key frames (even output timestamps) from interpolated midpoints
(odd timestamps), as the papers report them [P].
"""

from __future__ import annotations

import functools
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from bin_tpu.config import Config
from bin_tpu.metrics import psnr, ssim
from bin_tpu.models import recurrent
from bin_tpu.registry import Model, build_model

__all__ = ["evaluate", "evaluate_cli", "clip_metrics_fn"]


def clip_metrics_fn(model: Model, num_keys: int, return_video: bool = False,
                    self_ensemble: bool = False):
    """Jitted (params, blurry, sharp) → per-category (psnr, ssim) means.

    Compiled once per (num_keys, H, W) clip shape; fp32 internally (the
    0.05 dB parity budget — SURVEY.md §8 parity trap #2).  With
    ``return_video`` the assembled clip is returned too, so frame-dump runs
    don't re-run the clip scan in a second program.

    ``self_ensemble``: test-time augmentation over the 4 spatial flips
    (none / H / W / both): infer each flipped clip, unflip, average in
    fp32.  4x eval compute for a pure quality gain — an eval-mode option
    the reference does not have (standard restoration TTA, e.g. EDSR's
    geometric self-ensemble).  Temporal reversal is deliberately excluded:
    the ConvLSTM recurrence is causal, so time-flip is not a symmetry of
    the model.  Results are NOT protocol-comparable with plain evals —
    callers must record the flag (quality_eval writes it into the
    protocol dict).
    """
    plan = recurrent.assembly_plan(num_keys, model.cfg.window_size,
                                   model.num_levels_total)
    times = np.asarray(sorted(plan))
    interp_mask = jnp.asarray(times % 2 == 1)

    def infer(params, blurry):
        if not self_ensemble:
            return model.infer_clip(params, blurry)[0]
        acc = None
        for flip_h in (False, True):
            for flip_w in (False, True):
                x = blurry
                if flip_h:
                    x = x[:, :, ::-1]
                if flip_w:
                    x = x[:, :, :, ::-1]
                v = model.infer_clip(params, x)[0].astype(jnp.float32)
                if flip_h:
                    v = v[:, :, ::-1]
                if flip_w:
                    v = v[:, :, :, ::-1]
                acc = v if acc is None else acc + v
        return acc / 4.0

    @jax.jit
    def fn(params, blurry, sharp):
        video = infer(params, blurry)
        gt = sharp[:, jnp.asarray(times)]
        video = jnp.clip(video.astype(jnp.float32), 0.0, 1.0)
        p = psnr(video, gt)            # (B, T)
        s = ssim(video, gt)
        def split(x):
            interp = jnp.sum(x * interp_mask, axis=1) / jnp.sum(interp_mask)
            n_deblur = x.shape[1] - jnp.sum(interp_mask)
            deblur = jnp.where(
                n_deblur > 0,
                jnp.sum(x * (1 - interp_mask), axis=1) / jnp.maximum(n_deblur, 1),
                jnp.nan)
            return {"interp": interp, "deblur": deblur, "overall": jnp.mean(x, axis=1)}
        metrics_out = {"psnr": split(p), "ssim": split(s)}
        return (metrics_out, video) if return_video else metrics_out

    return fn, times


def save_clip_frames(video: np.ndarray, times: np.ndarray, out_dir: str,
                     clip_name: str) -> None:
    """Write assembled output frames as PNGs (reference demo behavior,
    SURVEY.md §4.2): <out_dir>/<clip>/t<t>.png on the 2x output grid."""
    import os
    from PIL import Image
    d = os.path.join(out_dir, clip_name)
    os.makedirs(d, exist_ok=True)
    for frame, t in zip(video, times):
        arr = (np.clip(frame, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"t{int(t):06d}.png"))


def evaluate(model: Model, params: Any, clips: Iterable[dict[str, np.ndarray]],
             verbose: bool = True, save_dir: str = "",
             plan=None, fn_cache: dict | None = None,
             self_ensemble: bool = False) -> dict[str, float]:
    """Aggregate PSNR/SSIM over eval clips.

    clips yield {"blurry": (B,K,H,W,3), "sharp": (B,2K-1,H,W,3),
    "valid": (B,) optional padding mask}.  With ``save_dir``, assembled
    output videos are also written as PNG frame folders.

    ``plan`` (MeshPlan): shard eval over a device mesh — the clip batch
    over 'data' (size the batch to plan.num_data) and, with spatial > 1,
    frame height over 'spatial'; params replicated.  Same SPMD rules as
    training (SURVEY.md §6.8).

    ``fn_cache``: pass a persistent dict when calling evaluate()
    repeatedly (the in-training validation hook does) so the jitted
    clip-metrics program is built once per clip shape, not once per call.
    """
    if plan is not None:
        params = jax.device_put(params, plan.replicated())

    def _put(x: np.ndarray) -> jnp.ndarray:
        if plan is None:
            return jnp.asarray(x)
        # device_put the HOST array with its final sharding directly — an
        # intermediate jnp.asarray would stage on device 0 and reshard
        # device-to-device (two tunnel round trips instead of one)
        return jax.device_put(x, plan.activation(x))

    fn_cache = {} if fn_cache is None else fn_cache
    sums: dict[str, float] = {}
    count = 0
    for ci, clip in enumerate(clips):
        # cache key includes the program-shaping flags — a persistent
        # fn_cache may be reused across calls with different options
        key = (clip["blurry"].shape[1:4], bool(save_dir), self_ensemble)
        if key not in fn_cache:
            fn_cache[key] = clip_metrics_fn(model, clip["blurry"].shape[1],
                                            return_video=bool(save_dir),
                                            self_ensemble=self_ensemble)
        fn, times = fn_cache[key]
        out = fn(params, _put(clip["blurry"]), _put(clip["sharp"]))
        valid = clip.get("valid", np.ones(clip["blurry"].shape[0], bool))
        names = clip.get("names") or [f"clip{ci:04d}_{bi}"
                                      for bi in range(clip["blurry"].shape[0])]
        names = [str(n).replace("/", "_") for n in names]
        if save_dir:
            out, video = out
            for bi in np.nonzero(valid)[0]:
                save_clip_frames(np.asarray(video[bi]), times,
                                 save_dir, names[bi])
        out = jax.device_get(out)
        for metric, cats in out.items():
            for cat, vals in cats.items():
                vals = np.asarray(vals)[valid]
                vals = vals[np.isfinite(vals)]  # NaN = category absent (e.g.
                if vals.size:                   # no deblur outputs at 1 level)
                    sums[f"{metric}_{cat}"] = (
                        sums.get(f"{metric}_{cat}", 0.0) + vals.sum())
        count += int(valid.sum())
        if verbose:
            # per-video rows, as the reference's eval table prints them
            for bi in np.nonzero(valid)[0]:
                row = {f"{m}_{c}": float(np.asarray(v)[bi])
                       for m, cs in out.items() for c, v in cs.items()}
                print(f"  {names[bi]}: " + "  ".join(
                    f"{k}={v:.3f}" for k, v in row.items()
                    if np.isfinite(v)))
    results = {k: v / max(count, 1) for k, v in sums.items()}
    if verbose and results:
        print("== mean over {} clips ==".format(count))
        for k in sorted(results):
            print(f"  {k}: {results[k]:.4f}")
    return results


def evaluate_cli(cfg: Config, checkpoint: str = "", num_clips: int | None = None,
                 save_dir: str = "", ema: bool = False,
                 self_ensemble: bool = False) -> dict:
    """Evaluate under the config's PINNED protocol: eval_num_clips clips of
    eval_num_keys keys at eval_size from the held-out eval_seed stream —
    numbers are comparable across rounds for the same preset."""
    from bin_tpu.data.pipeline import SyntheticSource, eval_clips
    from bin_tpu.training.checkpoint import restore_params
    from bin_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    model = build_model(cfg)
    if checkpoint:
        params = restore_params(checkpoint, ema=ema)
    else:
        print("WARNING: no checkpoint given — evaluating RANDOM INIT weights")
        h, w = cfg.data.eval_size
        params = model.init(jax.random.key(cfg.seed), height=h, width=w)

    h, w = cfg.data.eval_size
    num_clips = num_clips if num_clips is not None else cfg.data.eval_num_clips
    if num_clips <= 0:
        raise ValueError(f"num_clips must be positive, got {num_clips}")
    # eval_num_keys == 0 → whole clips (the GoPro full-sequence protocol
    # [P]); only folder datasets have a natural clip length, so the
    # synthetic stream keeps its pinned finite length.
    whole_clips = (cfg.data.eval_num_keys == 0
                   and cfg.data.dataset != "synthetic" and bool(cfg.data.root))
    if cfg.data.eval_num_keys == 0 and not whole_clips:
        raise ValueError(
            "data.eval_num_keys=0 (whole clips) needs a folder dataset: "
            "set data.root (and data.dataset != 'synthetic')")
    num_keys = None if whole_clips else max(
        cfg.data.eval_num_keys, cfg.model.window_size + 2)
    # Self-documenting protocol line (VERDICT r2 weak #5: the headline eval
    # once ran off-protocol with nothing in the output recording it).
    from bin_tpu.config import PRESETS
    off = []
    if num_clips != cfg.data.eval_num_clips:
        off.append("num_clips")
    if cfg.preset in PRESETS and (h, w) != PRESETS[cfg.preset]().data.eval_size:
        off.append("eval_size")
    print(f"eval protocol: preset={cfg.preset} size={h}x{w} "
          f"clips={num_clips} keys={'whole' if whole_clips else num_keys} "
          f"seed={cfg.data.eval_seed} dtype={cfg.model.dtype}"
          + (" self_ensemble=x4" if self_ensemble else "")
          + (f" [OFF-PROTOCOL: {','.join(off)}]" if off else ""))
    if cfg.data.dataset == "synthetic" or not cfg.data.root:
        source = SyntheticSource(num_samples=num_clips, num_keys=num_keys,
                                 height=h, width=w, taps=cfg.data.blur_taps,
                                 stride=cfg.data.blur_stride,
                                 seed=cfg.data.eval_seed,
                                 style=cfg.data.synthetic_style)
    else:
        from bin_tpu.data.frames import FrameFolderSource
        # honor the dataset's eval protocol (e.g. Adobe240 at 640x352 half
        # resolution [P]); a no-op when frames are already that size
        source = FrameFolderSource(cfg.data.root, num_keys=num_keys,
                                   resize_to=(h, w),
                                   clip_list=cfg.data.eval_list)
    plan, batch = None, 1
    if cfg.parallel.data_axis_size != 1 or cfg.parallel.spatial_axis_size != 1:
        from bin_tpu.parallel.mesh import make_mesh
        plan = make_mesh(cfg.parallel)
        batch = plan.num_data  # clips shard over 'data'; padding masked
        if plan.num_spatial > 1 and h % plan.num_spatial:
            raise ValueError(
                f"eval height {h} must divide over the spatial mesh axis "
                f"({plan.num_spatial}) — pick eval_size or spatial_axis_size "
                "accordingly")
    return evaluate(model, params, eval_clips(source, batch_size=batch),
                    save_dir=save_dir, plan=plan,
                    self_ensemble=self_ensemble)

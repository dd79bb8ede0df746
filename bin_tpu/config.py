"""Typed configuration system with named presets.

The reference (laomao0/BIN) drives experiments through argparse flags +
per-experiment config files + shell scripts (SURVEY.md §2 L6, provenance [R]).
Here the equivalent is a frozen dataclass tree with named presets; the five
presets mirror the driver's config ladder (BASELINE.json:6-12):

  1. config1_backbone_128   single pyramid-level backbone, 4-frame clip,
                            128x128 crop, fp32 (CPU-friendly smoke scale)
  2. config2_pyramid        full 2-level pyramid (no recurrence), 640x352 eval
  3. config3_prf            + inter-pyramid ConvLSTM over 11-frame sequences
  4. config4_gopro_720p     GoPro 1280x720 full-sequence joint deblur+interp
  5. config5_v5e_streaming  batched multi-clip 720p streaming inference +
                            data-parallel training on a v5e slice (bf16)

CLI override layer: any leaf may be overridden with dotted-path strings,
e.g. ``train.py --preset config3_prf --set model.base_features=32``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class ModelConfig:
    """Architecture of the pyramid / recurrent model (SURVEY.md §4.4)."""

    name: str = "prf"              # "backbone" | "pyramid" | "prf"
    num_levels: int = 2            # pyramid depth (levels beyond inputs)
    window_size: int = 4           # blurry key frames per sliding window
    base_features: int = 64        # channels at the stem resolution
    channel_mult: tuple[int, ...] = (1, 2, 4)  # per encoder scale
    stem_factor: int = 2           # space-to-depth at the stem: every conv
                                   # runs at H/f x W/f with f^2-wider input
                                   # blocks (TPU lane utilization — see
                                   # models/backbone.py; 1 = reference-style
                                   # full-resolution stem)
    num_res_blocks: int = 4        # residual blocks at the bottleneck
    lrelu_slope: float = 0.1
    convlstm_features: int = 256   # hidden channels of the inter-pyramid ConvLSTM
    use_convlstm: bool = True      # PRF recurrence on/off (off = plain BIN)
    conv_int8: bool = False        # PTQ int8 convs for inference (dynamic
                                   # per-tensor activations, per-channel
                                   # weights, int32 accum — ops/quant.py);
                                   # checkpoint-compatible A/B flag.
                                   # Feasibility gate: tools/bench_int8_conv.py
    conv_int8_min_cin: int = 0     # quantize only convs with input channels
                                   # >= this (0 = all convs when conv_int8).
                                   # Quality/speed dial: the deep wide convs
                                   # hold the FLOPs (and took int8 well in
                                   # the microbench); the high-res narrow
                                   # convs hold the fine detail.
    conv_int8_qat: bool = False    # quantization-aware TRAINING: fake-quant
                                   # (same quantizer as conv_int8, straight-
                                   # through grads) on the conv set selected
                                   # by conv_int8_min_cin.  Recipe: fine-tune
                                   # a trained checkpoint with this on, then
                                   # serve with conv_int8=true at the same
                                   # scope (ops/quant.py:fake_quant_conv).
    conv_int8_lstm: bool = False   # extend int8 PTQ to the ConvLSTM gate
                                   # conv (k3x3, Cin=Cfeat+F, Cout=4F) —
                                   # ~3.4 ms of bf16 the backbone scoping
                                   # misses (round-4 trace); gate/state
                                   # math stays fp32. Needs conv_int8.
    conv_int8_static: str = ""     # path to calibrated static activation
                                   # scales (.npz from tools/
                                   # calibrate_int8.py). Replaces the
                                   # dynamic per-activation abs-max reduce
                                   # (x read twice from HBM + a serializing
                                   # reduction per quantized conv) with a
                                   # trace-time constant scale; out-of-range
                                   # activations saturate at +-127.
                                   # Measurement-gated like every int8 knob.
    conv_int8_calibrate: bool = False  # calibration forward pass: plain
                                   # float convs, but record each would-be-
                                   # quantized conv input's abs-max into the
                                   # mutable "quant_stats" collection
                                   # (superset scope: min_cin ignored).
    fused_upsample: bool = True    # decoder upsample-conv as one phase-bank
                                   # conv (ops/fused_upsample.py); False =
                                   # unfused upsample-then-conv (identical
                                   # numerics) — A/B surface for runtime AND
                                   # compile-time attribution (the round-2
                                   # compile regression, VERDICT r2 weak #3)
    s2d_via_conv: bool = False     # pack the input window with a one-hot
                                   # strided conv instead of the reshape/
                                   # transpose form (bit-exact; targets the
                                   # ~20 GB/s layout copies the transpose
                                   # lowers to — ops/pixel_shuffle.py
                                   # space_to_depth_conv). A/B surface.
                                   # Measured round 3: LOST 3.4% (XLA adds
                                   # new layout copies around the Cin=3
                                   # conv) — kept as the recorded negative.
    d2s_via_conv: bool = True      # decoder upsample phase interleave as a
                                   # one-hot stride-2 transposed conv
                                   # instead of reshape/moveaxis (bit-exact
                                   # — ops/pixel_shuffle.depth_to_space_conv).
                                   # Targets the round-4 HLO layout thrash:
                                   # the reshape d2s was the one standard-
                                   # layout producer inside the backbone
                                   # while XLA runs every conv in its
                                   # transposed 0b1f form, so each skip/
                                   # residual add paid layout copies
                                   # (~10 ms of the 81 ms stem-2 int8
                                   # window step).  DEFAULT ON: measured
                                   # same-session 32.98 -> 41.86 fps
                                   # (+26.9%) on the bench default mode,
                                   # bit-exact outputs (tests/test_models.py
                                   # test_d2s_via_conv_model_flag_exact);
                                   # false = the reshape form (A/B).
    d2s_final_via_conv: str = "false"  # the FINAL full-clip unpack
                                   # (assemble_clip / Model.unpack) in the
                                   # same one-hot conv form: "follow" =
                                   # match d2s_via_conv, "true"/"false" =
                                   # pin independently for an A/B.
                                   # Round-5 chip A/B (runs/r5_final_unpack/
                                   # VERDICT.json): conv form 41.65 fps vs
                                   # reshape 41.82 — within noise, under the
                                   # 1% promotion gate, so the DEFAULT stays
                                   # the reshape form (which also keeps the
                                   # shipping graph free of the one-hot
                                   # helper-conv phantom MACs).  Bit-exact
                                   # both ways.
    # -- flag graveyard (VERDICT r4 task 7): measured-negative A/B surfaces
    # removed after their negatives were CONFIRMED on the shipping
    # (post-d2s-conv) graph; numbers live in BASELINE.md. The kernels stay
    # in ops/pallas/ with direct unit tests as the recorded engineering.
    #   s2d_pallas       — Mosaic cannot compile the VMEM relayout kernel on
    #                      this backend (round 4, runs/bench_r4_s2dpallas
    #                      .json.failed); kernel: ops/pallas/s2d_pack.py
    #   use_pallas_lstm  — fused Pallas ConvLSTM gate math: −38% pre-d2s,
    #                      −80% on the new graph (runs/r5_pallas_lstm/) —
    #                      it breaks XLA's conv fusion around the gates;
    #                      kernel: ops/pallas/lstm_gates.py
    #   conv_int8_mse_clip — MSE-optimal PTQ weight-scale clip search:
    #                      ~no quality change AND −6.3% fps on the new
    #                      graph (runs/r5_mseclip/VERDICT.json); the
    #                      kernel-level search stays in ops/quant.py
    #                      (quantize_symmetric(mse_clip=True)) with its
    #                      never-worse-than-absmax property test
    cycle_level: bool = True       # extra top level that re-predicts the centre
                                   # frame for the cycle-consistency loss
    clamp_intermediate: bool = True  # clip frames passed between pyramid
                                   # levels to [-0.5, 1.5]: level l consumes
                                   # level l-1's outputs, so an out-of-range
                                   # estimate feeds back multiplicatively —
                                   # observed to turn one bad step into
                                   # loss=Inf within 100 steps when disabled
    dtype: str = "float32"         # compute dtype ("float32" | "bfloat16")
    param_dtype: str = "float32"   # master weights always fp32
    remat: bool = False            # jax.checkpoint each window step inside
                                   # the training scan: activations of a
                                   # window are recomputed in backward, so
                                   # train memory is O(1) in clip length
                                   # (SURVEY.md §8 'trade FLOPs for memory')


@dataclass(frozen=True)
class LossConfig:
    """Multi-frame Charbonnier + cycle(+perceptual) schedule (SURVEY.md §3.2)."""

    charbonnier_eps: float = 1e-6
    level_weights: tuple[float, ...] = (1.0, 1.0, 1.0)  # per pyramid level
    cycle_weight: float = 0.1
    perceptual_weight: float = 0.0  # weight of the perceptual term
    perceptual_mode: str = "gradient"  # "gradient" (weight-free surrogate) |
                                    # "vgg" (VGG-16 features; bin_tpu/perceptual.py)
    vgg_weights: str = ""           # torchvision .pth / .npz path; empty with
                                    # mode="vgg" -> fixed-seed random VGG
                                    # filters (documented offline fallback)
    vgg_layers: tuple[str, ...] = ("relu1_2", "relu2_2", "relu3_3")


@dataclass(frozen=True)
class DataConfig:
    """Adobe240/GoPro-style frame-folder pipeline (SURVEY.md §3.2, §4.3)."""

    dataset: str = "synthetic"     # "synthetic" | "adobe240" | "gopro"
    synthetic_style: str = "textured"  # "textured" (hard: occlusion, sharp
                                   # edges, large motion — the quality
                                   # benchmark) | "smooth" (easy blobs)
    root: str = ""                 # frame-folder tree root (blurry/ + sharp/)
    train_list: str = ""           # sequence list file restricting train
                                   # clips (the reference's standard-split
                                   # mechanism, SURVEY.md §3.2); "" = all
    eval_list: str = ""            # same for eval clips
    crop_size: tuple[int, int] = (128, 128)   # train crop (H, W)
    eval_size: tuple[int, int] = (352, 640)   # eval resolution (H, W)
    # Pinned eval protocol (fixed clip count/length per preset so quality
    # numbers are comparable across rounds/runs — VERDICT r1 item 10):
    eval_num_clips: int = 16       # clips per eval pass
    eval_num_keys: int = 12        # blurry keys per eval clip; 0 = whole
                                   # clips (folder datasets only — the
                                   # GoPro full-sequence protocol [P])
    eval_seed: int = 9999          # synthetic eval stream seed (held out
                                   # from training seeds)
    seq_len: int = 4               # key frames per training sample
    batch_size: int = 8
    blur_taps: int = 11            # sharp frames averaged into one blurry frame
    blur_stride: int = 8           # stride between blurry frames (240fps->30fps)
    random_flip: bool = True
    transfer_u8: bool = True       # ship uint8 crops to the device and
                                   # normalize there (4x less host→device
                                   # traffic; also bounds the axon tunnel's
                                   # per-transfer host-buffer leak, see
                                   # docs/DESIGN.md §4c). Only applies when
                                   # the source yields uint8 samples.
    loader: str = "thread"         # "thread" (lean in-process prefetch) |
                                   # "grain" (deterministic, checkpointable,
                                   # worker processes — SURVEY.md §6.2)
    num_workers: int = 0           # grain worker processes (>0 implies
                                   # loader="grain"; 0 = in-process, right
                                   # for this 1-CPU-core host)
    prefetch: int = 2


@dataclass(frozen=True)
class OptimConfig:
    """Adam + step decay, matching the reference recipe (SURVEY.md §4.1)."""

    learning_rate: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    weight_decay: float = 0.0
    lr_warmup_steps: int = 0       # linear 0→lr warmup before the decay
                                   # schedule (Adam moment estimates settle
                                   # before full-size steps)
    lr_decay_steps: int = 50_000
    lr_decay_rate: float = 0.5
    grad_clip_norm: float = 1.0
    skip_nonfinite: bool = True    # optax.apply_if_finite: skip steps whose
                                   # gradients contain NaN/Inf instead of
                                   # poisoning the parameters
    ema_decay: float = 0.0         # >0 tracks an EMA of the params in the
                                   # train state (eval/export via --ema);
                                   # 0 disables (reference recipe has none)
    grad_accum_steps: int = 1      # >1: split the batch into this many
                                   # microbatches inside the jitted step
                                   # (lax.scan), average grads, ONE optimizer
                                   # update — reference-scale effective
                                   # batches at 1/N activation memory;
                                   # bit-equivalent to the unsplit step
                                   # (tests/test_training.py)
    num_steps: int = 200_000


@dataclass(frozen=True)
class ParallelConfig:
    """Sharding over a TPU mesh (SURVEY.md §6.8).

    The reference's only distribution story is single-process
    ``nn.DataParallel``; the TPU-native upgrade is an SPMD mesh:
    batch sharded over ``data``, params replicated, gradient all-reduce
    riding ICI.  ``spatial`` optionally shards activation height for
    720p+ convs (XLA inserts halo exchanges).
    """

    data_axis_size: int = 1        # -1 = all available devices
    spatial_axis_size: int = 1
    axis_names: tuple[str, str] = ("data", "spatial")


@dataclass(frozen=True)
class CheckpointConfig:
    """Orbax checkpointing (reference: torch.save per epoch, SURVEY.md §6.4)."""

    directory: str = "checkpoints"
    save_interval_steps: int = 1000
    keep_last_n: int = 3
    async_save: bool = True


@dataclass(frozen=True)
class LogConfig:
    jsonl_path: str = "metrics.jsonl"
    log_interval_steps: int = 50
    eval_interval_steps: int = 0   # >0: run a bounded validation pass every
                                   # N steps during training (the reference's
                                   # per-epoch val, SURVEY.md §4.1), log
                                   # eval_* metrics, and keep the BEST
                                   # weights at <workdir>/best.npz (the
                                   # reference's torch.save best).  0 = off
                                   # (an eval pass costs chip time).
    eval_clips: int = 4            # clips per in-training validation pass
                                   # (the full pinned protocol stays the
                                   # post-training evaluate_cli's job)
    profile_dir: str = ""          # non-empty => jax.profiler traces
    debug_nans: bool = False       # jax_debug_nans: fail fast on NaN/Inf
                                   # (SURVEY.md §6.2 — the sanitizer analog;
                                   # JAX purity removes data races by design)
    stall_timeout_s: float = 3600.0  # failure detection (SURVEY.md §6.3):
                                   # abort (exit 91) if NO train step completes
                                   # for this long.  The PJRT tunnel can wedge
                                   # indefinitely (observed: a remote compile
                                   # that never returned after 55 min; cold
                                   # compiles finish in <10 min) — a hung run
                                   # holds the chip forever, while exit+resume
                                   # is exact (checkpoint + grain loader
                                   # state).  0 disables.


@dataclass(frozen=True)
class Config:
    preset: str = "custom"
    seed: int = 0
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    checkpoint: CheckpointConfig = field(default_factory=CheckpointConfig)
    log: LogConfig = field(default_factory=LogConfig)


def _override(cfg: Any, path: str, value: Any) -> Any:
    """Return a copy of ``cfg`` with the dotted-path leaf replaced."""
    head, _, rest = path.partition(".")
    if not hasattr(cfg, head):
        raise KeyError(f"config has no field {head!r} (path {path!r})")
    if rest:
        child = _override(getattr(cfg, head), rest, value)
        return dataclasses.replace(cfg, **{head: child})
    current = getattr(cfg, head)
    if current is not None and not isinstance(value, type(current)):
        if isinstance(current, bool):
            value = str(value).lower() in ("1", "true", "yes")
        elif isinstance(current, (int, float)):
            value = type(current)(value)
        elif isinstance(current, tuple):
            sep = [v for v in str(value).replace("(", "").replace(")", "").split(",") if v]
            elem = type(current[0]) if current else int
            value = tuple(elem(v) for v in sep)
    return dataclasses.replace(cfg, **{head: value})


def apply_overrides(cfg: Config, overrides: dict[str, Any] | list[str]) -> Config:
    """Apply ``{"model.base_features": 32}`` or ``["model.base_features=32"]``."""
    if isinstance(overrides, list):
        bad = [s for s in overrides if "=" not in s]
        if bad:
            raise ValueError(f"overrides must be KEY=VALUE, got {bad}")
        overrides = dict(s.split("=", 1) for s in overrides)
    for path, value in overrides.items():
        cfg = _override(cfg, path, value)
    return cfg


def apply_model_overrides(model_cfg: ModelConfig,
                          overrides: list[str]) -> ModelConfig:
    """Apply ``--set`` strings to a bare :class:`ModelConfig`.

    Serving entry points load a released card's stored model config
    (``bin_tpu.weights.load_weights``), which records the TRAINING-time
    configuration — deployment knobs like ``model.conv_int8`` or
    ``model.dtype`` must be layered on top, not baked into the card.
    Accepts both ``model.conv_int8=true`` (the spelling every other CLI
    uses) and bare ``conv_int8=true``.
    """
    for s in overrides:
        if "=" not in s:
            raise ValueError(f"overrides must be KEY=VALUE, got {s!r}")
        path, value = s.split("=", 1)
        if path.startswith("model."):
            path = path[len("model."):]
        model_cfg = _override(model_cfg, path, value)
    return model_cfg


# ---------------------------------------------------------------------------
# Named presets — the driver's five-config ladder (BASELINE.json:6-12).
# ---------------------------------------------------------------------------

def config1_backbone_128() -> Config:
    return Config(
        preset="config1_backbone_128",
        model=ModelConfig(name="backbone", num_levels=1, use_convlstm=False,
                          cycle_level=False, base_features=64, stem_factor=1),
        data=DataConfig(crop_size=(128, 128), seq_len=4, batch_size=4),
        loss=LossConfig(level_weights=(1.0,), cycle_weight=0.0),
    )


def config2_pyramid() -> Config:
    return Config(
        preset="config2_pyramid",
        model=ModelConfig(name="pyramid", num_levels=2, use_convlstm=False,
                          cycle_level=True, base_features=128),
        data=DataConfig(crop_size=(128, 128), eval_size=(352, 640),
                        seq_len=4, batch_size=8),
        loss=LossConfig(level_weights=(1.0, 1.0, 1.0), cycle_weight=0.1),
    )


def config3_prf() -> Config:
    return Config(
        preset="config3_prf",
        model=ModelConfig(name="prf", num_levels=2, use_convlstm=True,
                          cycle_level=True, base_features=128),
        # 11 sharp GT timestamps <=> 6 blurry key frames <=> 2 window steps
        data=DataConfig(crop_size=(128, 128), eval_size=(352, 640),
                        seq_len=6, batch_size=4),
        loss=LossConfig(level_weights=(1.0, 1.0, 1.0), cycle_weight=0.1),
    )


def config3_prf_extended() -> Config:
    """config3 + perceptual term + parameter EMA — the reference's "extended
    config" analog (SURVEY.md §3.2 Loss module [P]: the PRF extension trains
    with a VGG perceptual loss).  Mode/weight are the measured winner of the
    round-3 offline A/B (BASELINE.md): the gradient surrogate (best SSIM,
    -0.08 dB PSNR vs pixel-only); set loss.perceptual_mode=vgg when real
    VGG-16 weights are available to import.  EMA (decay 0.999) measured
    +0.19 dB over raw params on the 20k textured run (eval with --ema)."""
    cfg = config3_prf()
    import dataclasses
    return dataclasses.replace(
        cfg, preset="config3_prf_extended",
        loss=dataclasses.replace(cfg.loss, perceptual_weight=0.5,
                                 perceptual_mode="gradient"),
        optim=dataclasses.replace(cfg.optim, ema_decay=0.999))


def config4_gopro_720p() -> Config:
    return Config(
        preset="config4_gopro_720p",
        model=ModelConfig(name="prf", num_levels=2, use_convlstm=True,
                          cycle_level=True, base_features=128),
        data=DataConfig(dataset="gopro", crop_size=(128, 128),
                        eval_size=(720, 1280), seq_len=6, batch_size=4),
        loss=LossConfig(level_weights=(1.0, 1.0, 1.0), cycle_weight=0.1),
    )


def config5_v5e_streaming() -> Config:
    return Config(
        preset="config5_v5e_streaming",
        # Throughput preset: stem 4 keeps every conv at >=C256 (measured
        # 39.4 vs 33.6 output fps at stem 2 — BASELINE.md) at an equal
        # FLOP budget, but scores ~0.8 dB below stem 2 when trained (round
        # 3); the flagship-of-record is config3's stem-2 architecture and
        # this preset is the speed-over-quality option.
        model=ModelConfig(name="prf", num_levels=2, use_convlstm=True,
                          cycle_level=True, base_features=256, stem_factor=4,
                          dtype="bfloat16"),
        data=DataConfig(dataset="gopro", crop_size=(128, 128),
                        eval_size=(720, 1280), seq_len=6, batch_size=8),
        loss=LossConfig(level_weights=(1.0, 1.0, 1.0), cycle_weight=0.1),
        parallel=ParallelConfig(data_axis_size=-1),
    )


PRESETS = {
    fn.__name__: fn
    for fn in (config1_backbone_128, config2_pyramid, config3_prf,
               config3_prf_extended, config4_gopro_720p,
               config5_v5e_streaming)
}


def get_config(preset: str, overrides: list[str] | None = None) -> Config:
    if preset not in PRESETS:
        raise KeyError(f"unknown preset {preset!r}; available: {sorted(PRESETS)}")
    cfg = PRESETS[preset]()
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg

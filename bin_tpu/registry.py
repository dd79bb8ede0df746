"""Model factory: config → constructed model handle.

Reference equivalent (SURVEY.md §3.2 'Model factory' [R]): a networks/
factory selecting BIN scale variants / PRF by name.  Here every variant is
the same BINPyramid module under different flags; the registry validates the
name, normalizes flags, and returns a ``Model`` handle bundling the module
with init / apply / clip-level helpers so callers never touch Flax binding
details.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from bin_tpu.config import Config, LossConfig, ModelConfig
from bin_tpu.models.pyramid import BINPyramid, initial_state, total_levels
from bin_tpu.models import recurrent

__all__ = ["Model", "build_model", "MODEL_NAMES"]

MODEL_NAMES = ("backbone", "pyramid", "prf")


def _normalize(cfg: ModelConfig) -> ModelConfig:
    """Make the model name authoritative over the sub-flags."""
    if cfg.name == "backbone":
        return dataclasses.replace(cfg, num_levels=1, use_convlstm=False,
                                   cycle_level=False)
    if cfg.name == "pyramid":
        return dataclasses.replace(cfg, use_convlstm=False)
    if cfg.name == "prf":
        return dataclasses.replace(cfg, use_convlstm=True)
    raise KeyError(f"unknown model {cfg.name!r}; available: {MODEL_NAMES}")


@dataclasses.dataclass(frozen=True)
class Model:
    """Bound handle over the pyramid module for one model config."""

    cfg: ModelConfig
    module: BINPyramid

    # -- parameter / state management ------------------------------------
    def init(self, rng: jax.Array, batch: int = 1, height: int = 64,
             width: int = 64) -> Any:
        window = jnp.zeros((batch, self.cfg.window_size, height, width, 3),
                           jnp.float32)
        states = self.initial_state(batch, height, width)
        return self.module.init(rng, window, states)["params"]

    def initial_state(self, batch: int, height: int, width: int):
        return initial_state(self.cfg, batch, height, width)

    @property
    def num_levels_total(self) -> int:
        return total_levels(self.cfg)

    # -- forward ----------------------------------------------------------
    def apply_window(self, params: Any, window: jax.Array, states: list,
                     producer_clamp: bool = False):
        """One pyramid forward.  window: (B,K,H,W,3) unpacked or packed
        (B,K,H/f,W/f,3f^2); outputs are PACKED per-level frames — see
        BINPyramid.__call__ and Model.unpack.  ``producer_clamp``: fuse the
        stability clamp into the producing tail (inference-only fast path;
        see BINPyramid.__call__)."""
        return self.module.apply({"params": params}, window, states,
                                 producer_clamp=producer_clamp)

    def unpack(self, frames: jax.Array) -> jax.Array:
        """Packed (…, h, w, 3f^2) model outputs → fp32 (…, H, W, 3)."""
        from bin_tpu.ops.pixel_shuffle import (depth_to_space,
                                               depth_to_space_conv,
                                               final_unpack_via_conv)
        if final_unpack_via_conv(self.cfg):
            # conv in the native dtype, convert after: the permutation
            # commutes bit-exactly with the pointwise cast and the layout
            # move touches half the bytes (see assemble_clip)
            return depth_to_space_conv(
                frames, self.cfg.stem_factor).astype(jnp.float32)
        return depth_to_space(frames.astype(jnp.float32), self.cfg.stem_factor)

    def _apply_fn(self, params, window, states):
        return self.module.apply({"params": params}, window, states)

    def _infer_apply_fn(self, params, window, states):
        """Inference forward: producer-side fused clamp (same final video —
        eval/emission clips to [0,1]; ~10% faster at 720p)."""
        return self.module.apply({"params": params}, window, states,
                                 producer_clamp=True)

    def forward_clip(self, params: Any, blurry: jax.Array):
        """Scan a whole clip (inference): (B,Kt,H,W,3) → (stacked PACKED
        per-level outputs, final ConvLSTM states)."""
        b, _, h, w, _ = blurry.shape
        states = self.initial_state(b, h, w)
        from bin_tpu.ops.pixel_shuffle import input_pack_fn
        return recurrent.scan_windows(self._infer_apply_fn, params, blurry,
                                      states, self.cfg.window_size,
                                      self.cfg.stem_factor,
                                      compute_dtype=jnp.dtype(self.cfg.dtype),
                                      pack_fn=input_pack_fn(self.cfg))

    def infer_clip(self, params: Any, blurry: jax.Array):
        """Full joint deblur + 2x interpolation of a clip.

        Returns (video, times): (B, T_cov, H, W, 3) fp32 assembled sharp
        output and the global 2x-grid timestamps covered (numpy, static).
        """
        from bin_tpu.ops.pixel_shuffle import final_unpack_via_conv
        outputs, _ = self.forward_clip(params, blurry)
        return recurrent.assemble_clip(outputs, blurry.shape[1],
                                       self.cfg.window_size,
                                       self.cfg.stem_factor,
                                       via_conv=final_unpack_via_conv(self.cfg))

    def loss_clip(self, params: Any, blurry: jax.Array, sharp: jax.Array,
                  loss_cfg: LossConfig, perceptual_fn: Any = None):
        b, _, h, w, _ = blurry.shape
        states = self.initial_state(b, h, w)
        return recurrent.clip_loss(self._apply_fn, params, blurry, sharp,
                                   states, self.cfg, loss_cfg,
                                   perceptual_fn=perceptual_fn)


def build_model(cfg: Config | ModelConfig) -> Model:
    mcfg = cfg.model if isinstance(cfg, Config) else cfg
    mcfg = _normalize(mcfg)
    return Model(cfg=mcfg, module=BINPyramid(cfg=mcfg))

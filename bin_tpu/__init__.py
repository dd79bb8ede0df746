"""bin_tpu — a TPU-native joint video deblurring + frame interpolation framework.

A from-scratch JAX/Flax/XLA/Pallas rebuild of the capabilities of laomao0/BIN
("Blurry Video Frame Interpolation", CVPR 2020) and its TIP 2020 extension PRF
("Video Frame Interpolation and Enhancement via Pyramid Recurrent Framework").

The reference mount (/root/reference) was empty at survey and build time; the
architecture implemented here is pinned by the published papers and the
driver-recorded task description (see SURVEY.md §0 for provenance).

Layer map (SURVEY.md §2):
  L0  JAX + XLA on TPU, Pallas for fused kernels        bin_tpu.ops
  L1  Flax module library (+ our ConvLSTM cell)         bin_tpu.models.layers / convlstm
  L2  Model zoo: backbone, pyramid, recurrent PRF       bin_tpu.models, bin_tpu.registry
  L3  Data pipeline (frame folders, blur synthesis)     bin_tpu.data
  L4  Train/eval loops, optax, Orbax checkpoints        bin_tpu.training / evaluation
  L5  Data-parallel sharding over a TPU mesh            bin_tpu.parallel
  L6  Typed dataclass configs + named presets           bin_tpu.config
"""

from bin_tpu.version import __version__

__all__ = ["__version__"]

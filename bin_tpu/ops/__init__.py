"""Compute-path ops: XLA-lowered resize helpers and Pallas TPU kernels."""

from bin_tpu.ops.resize import resize_bilinear, upsample2x, downsample2x

__all__ = ["resize_bilinear", "upsample2x", "downsample2x"]

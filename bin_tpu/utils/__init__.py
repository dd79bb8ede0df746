"""Utilities: structured logging, profiling helpers."""

from bin_tpu.utils.logging import MetricLogger

__all__ = ["MetricLogger"]

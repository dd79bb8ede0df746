"""Pallas TPU kernels for the hot pointwise paths.

The reference has NO native/custom kernels (SURVEY.md §3.1) — its perf
surface is cuDNN convs + eager fusion.  On TPU, XLA already fuses most
elementwise chains into the convs; these kernels target the spots where a
single VMEM pass still beats the XLA schedule (long pointwise chains with
several intermediates): the ConvLSTM gate update and the Charbonnier
reduction.  Each kernel has a jnp reference implementation it is tested
against bit-for-bit in interpret mode, and is opt-in via model/bench flags.
"""

"""Shared utilities: timing/tracing and misc helpers."""

from aaltoasr_tpu.utils.profiling import StageTimer, device_trace

__all__ = ["StageTimer", "device_trace"]

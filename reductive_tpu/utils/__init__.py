"""Utilities: profiling, timing, and benchmark helpers."""

from .callbacks import host_callbacks_supported
from .profiling import benchmark, device_sync, trace

__all__ = ["trace", "device_sync", "benchmark", "host_callbacks_supported"]

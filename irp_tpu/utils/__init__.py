"""Utilities: device monitoring, profiling, visualization."""

from irp_tpu.utils.monitor import device_memory_stats, print_device_memory  # noqa: F401

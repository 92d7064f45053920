"""Device memory / profiling helpers.

TPU-native upgrade of the reference's ``print_gpu_memory`` (reference
functions/utility.py:5-14, called around epochs at train.py:133,155 etc.):
reports per-device HBM from JAX memory stats, plus jax.profiler trace
helpers (the reference has no profiler at all, SURVEY §5).
"""

from __future__ import annotations

import contextlib
from typing import Dict


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device memory stats in GB (empty dict per device when the
    backend doesn't expose them)."""
    import jax

    out = {}
    for dev in jax.local_devices():
        stats = {}
        try:
            raw = dev.memory_stats() or {}
            for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
                if key in raw:
                    stats[key.replace("bytes", "gb")] = raw[key] / 1024 ** 3
        except Exception:  # noqa: BLE001 — backend-dependent availability
            pass
        out[str(dev)] = stats
    return out


def print_device_memory() -> None:
    for dev, stats in device_memory_stats().items():
        if stats:
            parts = ", ".join(f"{k}: {v:.2f} GB" for k, v in stats.items())
            print(f"{dev}: {parts}")
        else:
            print(f"{dev}: memory stats unavailable")


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax_trace",
                  enabled: bool = True):
    """jax.profiler trace context (view with xprof/tensorboard)."""
    import jax

    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

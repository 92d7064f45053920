"""Shared error classification helpers."""

from __future__ import annotations


def is_oom_error(exc: BaseException) -> bool:
    """True when ``exc`` is a device out-of-memory failure (JAX surfaces
    XLA's RESOURCE_EXHAUSTED as a RuntimeError/XlaRuntimeError whose
    message carries the status code)."""
    s = str(exc)
    return "RESOURCE_EXHAUSTED" in s or "out of memory" in s.lower()

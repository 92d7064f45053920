"""Persistent XLA compilation cache setup for CLIs and examples.

A fresh ResNet50 scanned-epoch program takes minutes to compile (the TPU
compile service on this class of host is slow and the CPU fallback is a
1-core build); JAX's persistent compilation cache makes every rerun of an
identical program a disk hit.  The test suite and bench tools already
enable it — this helper gives the CLIs/examples the same behavior.

Call ``enable_persistent_cache()`` BEFORE the first jit (ideally right
after parsing args).  Opt out with ``IRP_JAX_CACHE_DIR=""``.
"""

from __future__ import annotations

import os
import sys


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float | None = None
                            ) -> str | None:
    """Point JAX at a persistent compilation cache directory.

    Resolution order: explicit arg > $IRP_JAX_CACHE_DIR (empty string
    disables) > ~/.cache/irp_tpu/jax.  The minimum compile time worth
    caching defaults to 5s, overridable via $IRP_JAX_CACHE_MIN_SECS (the
    test suite pins 1.0 so its small CPU compiles persist).  Returns the
    directory used, or None when disabled/unavailable.
    """
    if min_compile_secs is None:
        min_compile_secs = float(
            os.environ.get("IRP_JAX_CACHE_MIN_SECS", "5.0"))
    if cache_dir is None:
        env = os.environ.get("IRP_JAX_CACHE_DIR")
        if env is not None:
            if not env:
                return None
            cache_dir = env
        else:
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "irp_tpu", "jax")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        # stderr: bench.py's stdout is a one-JSON-line contract
        print(f"persistent compile cache disabled: {e}", file=sys.stderr)
        return None
    return cache_dir

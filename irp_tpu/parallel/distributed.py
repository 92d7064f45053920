"""Multi-host / multi-process coordination helpers.

The reference has no distributed story (SURVEY §2: no torch.distributed
anywhere).  On TPU pods, JAX processes coordinate through
``jax.distributed.initialize``; this module wraps it and provides the
per-host input-sharding helpers so the same fit()/hyperopt code runs
unchanged on a multi-host slice:

- each host decodes/caches only its own shard subset (``host_shards``);
- HBMDataset already shards sample-wise over the global 'data' axis, and
  GSPMD handles the cross-host collectives over ICI/DCN.
"""

from __future__ import annotations

from typing import List, Optional, Sequence


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               auto: bool = False) -> None:
    """jax.distributed.initialize passthrough.

    With no arguments this is a no-op (single-process environments, the
    common case here).  ``auto=True`` requests JAX's zero-argument
    auto-detection (TPU pod metadata / cluster env vars) — the standard
    call on multi-host slices, which a bare no-arg wrapper call would
    otherwise silently skip."""
    import jax

    if not auto and num_processes is None and coordinator_address is None:
        # single-process (this environment) — nothing to do
        return
    try:
        if auto and num_processes is None and coordinator_address is None:
            if process_id is not None:
                jax.distributed.initialize(process_id=process_id)
            else:
                jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise


def host_shards(shard_paths: Sequence[str],
                process_index: Optional[int] = None,
                process_count: Optional[int] = None) -> List[str]:
    """Round-robin shard assignment for this host's input pipeline
    (multi-host equivalent of per-worker WebDataset shard splitting)."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [p for i, p in enumerate(sorted(shard_paths)) if i % pc == pi]


def global_batch_for(per_device_batch: int) -> int:
    """Global batch size for a given per-device batch on this topology."""
    import jax

    return per_device_batch * jax.device_count()

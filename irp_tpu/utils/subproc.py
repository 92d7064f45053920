"""Sanitized environments for CPU-bound child interpreters.

Every fresh python interpreter on the bench host runs the axon TPU-tunnel
handshake from ``/root/.axon_site/sitecustomize.py`` — triggered purely by
``PALLAS_AXON_POOL_IPS`` being present in the environment.  A child process
whose only job is CPU work (the multichip dryrun, spawn-mode test workers,
CLI subprocess tests) must NOT inherit that variable: when the tunnel is
slow the handshake costs minutes, and when it is wedged the child blocks
forever in ``tcp_recvmsg`` before ``import jax`` even returns
(MULTICHIP_r02.json rc=124 root cause).

``cpu_child_env()`` builds a child environment that (a) skips the tunnel
handshake entirely — a fresh interpreter without the pool var reaches 8
virtual CPU devices in ~2.4 s — and (b) pins ``JAX_PLATFORMS=cpu`` so JAX
never tries the axon platform that the sitecustomize-pinned default would
otherwise request.

Use this for ANY subprocess/spawn child that should run on CPU; children
that genuinely need the real TPU chip must inherit the parent env instead.
"""

from __future__ import annotations

import os
import re

# The sitecustomize trigger (see /root/.axon_site/sitecustomize.py): when
# present, every interpreter start runs the tunnel register() handshake.
_AXON_TRIGGER = "PALLAS_AXON_POOL_IPS"


def with_device_count(flags: str, n_devices: int) -> str:
    """XLA_FLAGS string with --xla_force_host_platform_device_count=n set."""
    opt = f"--xla_force_host_platform_device_count={n_devices}"
    if "xla_force_host_platform_device_count" in flags:
        return re.sub(r"--xla_force_host_platform_device_count=\d+", opt,
                      flags)
    return (flags + " " + opt).strip()


def cpu_child_env(n_devices: int | None = None,
                  base: dict | None = None) -> dict:
    """Environment for a CPU-only child interpreter.

    - drops the axon-tunnel trigger var so sitecustomize skips the TPU
      handshake (the child never touches the network);
    - pins ``JAX_PLATFORMS=cpu`` so backend init can't pick 'axon';
    - optionally forces ``n_devices`` virtual CPU devices via XLA_FLAGS.

    ``base`` defaults to a copy of ``os.environ``.
    """
    env = dict(os.environ if base is None else base)
    env.pop(_AXON_TRIGGER, None)
    env["JAX_PLATFORMS"] = "cpu"
    if n_devices is not None:
        env["XLA_FLAGS"] = with_device_count(env.get("XLA_FLAGS", ""),
                                             int(n_devices))
    return env

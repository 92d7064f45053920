"""Driver-entry checks: dryrun_multichip must self-provision its mesh
WITHOUT touching the axon TPU tunnel.

Round-1 failure (MULTICHIP_r01.json rc=1): the driver runs
``python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"``
on a host with ONE real TPU chip and no forced virtual devices; the entry
point must create the virtual 8-device CPU mesh itself.

Round-2 failure (MULTICHIP_r02.json rc=124): the parent counted devices via
``jax.devices()`` (initializing the axon backend through the network tunnel)
and the re-exec'd child inherited ``PALLAS_AXON_POOL_IPS`` (so sitecustomize
ran the tunnel handshake in a CPU-only child) — both block forever when the
tunnel is wedged.  The parent must now short-circuit straight to a
sanitized re-exec whenever the trigger var is present, and every CPU-bound
child env must drop it (irp_tpu.utils.subproc.cpu_child_env).
"""

import os
import re
import subprocess
import sys
from unittest import mock

from irp_tpu.utils.subproc import cpu_child_env, with_device_count

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sanitized_driver_env():
    """Driver-like env that cannot hang on the tunnel: forcing flag
    stripped (the entry must self-provision) and the axon trigger removed
    (the suite must stay green with the tunnel unreachable)."""
    env = cpu_child_env()  # drops PALLAS_AXON_POOL_IPS, pins cpu
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", "")).strip()
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


def test_cpu_child_env_sanitizes():
    base = {"PALLAS_AXON_POOL_IPS": "127.0.0.1", "JAX_PLATFORMS": "axon",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=3",
            "PYTHONPATH": "/root/.axon_site"}
    env = cpu_child_env(8, base=base)
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    # sitecustomize path stays (harmless without the trigger var)
    assert env["PYTHONPATH"] == "/root/.axon_site"
    # the caller's base mapping is not mutated
    assert base["PALLAS_AXON_POOL_IPS"] == "127.0.0.1"


def test_with_device_count_replaces_existing():
    assert with_device_count("", 8) == \
        "--xla_force_host_platform_device_count=8"
    assert with_device_count(
        "--foo --xla_force_host_platform_device_count=2", 8) == \
        "--foo --xla_force_host_platform_device_count=8"


def test_parent_short_circuits_on_axon_host(monkeypatch):
    """With the tunnel trigger var set, the parent must go straight to the
    sanitized re-exec — no jax backend init, no trigger var in the child."""
    import __graft_entry__ as g

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.delenv("IRP_DRYRUN_REEXEC", raising=False)
    monkeypatch.delenv("IRP_DRYRUN_REAL", raising=False)

    calls = {}

    def fake_run(cmd, cwd=None, env=None, **kw):
        calls["cmd"], calls["env"] = cmd, env
        return mock.Mock(returncode=0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    # Any jax backend query in the parent path is the r2 bug resurfacing.
    import jax

    def boom(*a, **kw):  # pragma: no cover - only fires on regression
        raise AssertionError("parent called jax.devices() on an axon host")

    monkeypatch.setattr(jax, "devices", boom)
    g.dryrun_multichip(8)
    assert "PALLAS_AXON_POOL_IPS" not in calls["env"]
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"
    assert calls["env"]["IRP_DRYRUN_REEXEC"] == "1"
    assert "--xla_force_host_platform_device_count=8" in \
        calls["env"]["XLA_FLAGS"]
    assert "dryrun_multichip(8)" in calls["cmd"][-1]


def test_dryrun_multichip_self_provisions():
    code = "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          env=_sanitized_driver_env(), capture_output=True,
                          text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8):" in proc.stdout and "OK" in proc.stdout


def test_dryrun_multichip_reexec_after_backend_init():
    # JAX already initialized on a too-small backend -> re-exec fallback.
    code = ("import jax; jax.devices(); "
            "from __graft_entry__ import dryrun_multichip; "
            "dryrun_multichip(4)")
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          env=_sanitized_driver_env(), capture_output=True,
                          text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(4):" in proc.stdout and "OK" in proc.stdout

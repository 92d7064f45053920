"""Driver-entry checks: dryrun_multichip must self-provision its mesh.

Round-1 failure mode (MULTICHIP_r01.json): the driver runs
``python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"``
on a host with ONE real TPU chip and no forced virtual devices; the entry
point must create the virtual 8-device CPU mesh itself.  These tests invoke
it exactly that way, in a subprocess with the forcing flag stripped.
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   flags).strip()
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


def test_dryrun_multichip_self_provisions():
    code = "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          env=_driver_env(), capture_output=True, text=True,
                          timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8):" in proc.stdout and "OK" in proc.stdout


def test_dryrun_multichip_reexec_after_backend_init():
    # JAX already initialized on a too-small backend -> re-exec fallback.
    code = ("import jax; jax.devices(); "
            "from __graft_entry__ import dryrun_multichip; "
            "dryrun_multichip(4)")
    env = _driver_env()
    # Pin the outer interpreter to a single CPU device so the fallback is
    # actually exercised regardless of host platform.
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(4):" in proc.stdout and "OK" in proc.stdout

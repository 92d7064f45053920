"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars BEFORE jax is imported anywhere (SURVEY §4: multi-device
tests simulate the v5e-8 slice with xla_force_host_platform_device_count).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Sanitize the inherited environment for EVERY child of this process
# (spawn-mode workers, subprocess CLI tests, the dryrun re-exec): the axon
# sitecustomize runs a TPU-tunnel handshake in any fresh interpreter that
# sees PALLAS_AXON_POOL_IPS — minutes when the tunnel is slow, a hang when
# it is wedged (the round-2 suite sat blocked in tcp_recvmsg at 43%).  No
# test uses the real chip; the whole suite runs on the virtual CPU mesh.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Force CPU: the axon sitecustomize preloads jax and pins
# jax_platforms='axon,cpu' (the real TPU tunnel), so the env var is read
# too early — override the config directly.  Tests run on the virtual
# 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA CPU compiles of ResNet graphs dominate
# suite time on the 1-core host; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/irp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# CLI mains call enable_persistent_cache(); pin its target to the suite's
# cache dir so in-process CLI tests don't repoint the cache elsewhere.
os.environ.setdefault("IRP_JAX_CACHE_DIR", "/tmp/irp_tpu_jax_cache")
os.environ.setdefault("IRP_JAX_CACHE_MIN_SECS", "1.0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _pin_compile_cache_config():
    """Any test (CLI mains, the compile_cache unit test) may retarget the
    jax compilation cache; restore the suite-wide setting afterwards so
    one test — even a FAILING one — can't degrade caching for the rest
    of the session."""
    yield
    jax.config.update("jax_compilation_cache_dir", "/tmp/irp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_shards(tmp_path_factory):
    """A small synthetic Animals-10-like shard set (2 classes x N images)."""
    from tests.synth import make_synthetic_shards

    root = tmp_path_factory.mktemp("shards")
    return make_synthetic_shards(str(root), num_classes=4, per_class=30,
                                 samples_per_shard=25, seed=0)

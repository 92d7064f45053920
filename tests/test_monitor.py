"""Device monitor / profiler helper smoke tests."""

import os


def test_device_memory_stats_shape():
    from irp_tpu.utils.monitor import device_memory_stats, print_device_memory

    stats = device_memory_stats()
    assert len(stats) >= 1  # one entry per local device
    print_device_memory()  # must not raise regardless of backend support


def test_profile_trace_writes_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    from irp_tpu.utils.monitor import profile_trace

    with profile_trace(str(tmp_path), enabled=True):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    # a plugins/profile/<ts>/ tree should exist with at least one file
    found = []
    for base, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found, "no trace files written"


def test_profile_trace_disabled_noop(tmp_path):
    from irp_tpu.utils.monitor import profile_trace

    with profile_trace(str(tmp_path), enabled=False):
        pass
    assert not os.listdir(tmp_path)


def test_enable_persistent_cache(tmp_path, monkeypatch):
    from irp_tpu.utils.compile_cache import enable_persistent_cache

    target = str(tmp_path / "jaxcache")
    assert enable_persistent_cache(target) == target
    import jax

    assert jax.config.jax_compilation_cache_dir == target
    # env opt-out
    monkeypatch.setenv("IRP_JAX_CACHE_DIR", "")
    assert enable_persistent_cache() is None
    # env override
    other = str(tmp_path / "other")
    monkeypatch.setenv("IRP_JAX_CACHE_DIR", other)
    assert enable_persistent_cache() == other

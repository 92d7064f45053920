"""Parallel trial scheduling across the 8-device CPU mesh + prefetch."""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irp_tpu.hyperopt import RandomSampler, create_study
from irp_tpu.hyperopt.parallel import run_parallel_trials


def test_parallel_trials_across_devices(tmp_path):
    """8 virtual devices, 4 workers x 1 device: all trials complete, values
    recorded, devices actually distinct."""
    study = create_study("par", str(tmp_path / "p.db"),
                         sampler=RandomSampler(0))
    seen_devices = set()
    lock = threading.Lock()

    def objective(trial, mesh):
        x = trial.suggest_float("x", -5, 5)
        dev = mesh.devices.ravel()[0]
        with lock:
            seen_devices.add(str(dev))
        # tiny real device computation on the assigned sub-mesh
        val = jax.device_put(jnp.float32(x), dev)
        return float(-(val - 1.0) ** 2)

    run_parallel_trials(study, objective, n_trials=12, devices_per_trial=1,
                        max_workers=4)
    trials = study.get_trials()
    assert len(trials) == 12
    assert all(t.state == "COMPLETE" for t in trials)
    assert len(seen_devices) >= 2  # work actually spread over devices
    assert study.best_value <= 0.0


def test_parallel_trials_handle_failures(tmp_path):
    study = create_study("parf", str(tmp_path / "pf.db"),
                         sampler=RandomSampler(0))

    def objective(trial, mesh):
        trial.suggest_float("x", 0, 1)
        if trial.number % 2 == 0:
            raise RuntimeError("boom")
        return 1.0

    run_parallel_trials(study, objective, n_trials=6, max_workers=2)
    states = sorted(t.state for t in study.get_trials())
    assert states.count("FAILED") == 3
    assert states.count("COMPLETE") == 3


def test_prefetch_to_device():
    from irp_tpu.config import MeshConfig
    from irp_tpu.data.pipeline import prefetch_to_device
    from irp_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(MeshConfig(data=8, model=1))
    batches = [(np.ones((16, 4), np.float32) * i,
                np.full((16,), i, np.int32)) for i in range(5)]
    out = list(prefetch_to_device(iter(batches), mesh=mesh))
    assert len(out) == 5
    for i, (x, y) in enumerate(out):
        assert float(x[0, 0]) == i
        assert x.sharding.spec[0] == "data"

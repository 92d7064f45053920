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


@pytest.mark.slow
def test_parallel_kfold_runner(tmp_path):
    """run_kfold_optimization(parallel_workers=2): real k-fold trials on
    per-worker single-device sub-meshes."""
    from irp_tpu.config import HyperoptConfig, ModelConfig
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    from irp_tpu.hyperopt import HyperoptContext
    from irp_tpu.hyperopt.runner import run_kfold_optimization
    from irp_tpu import tracking
    from tests.synth import make_synthetic_shards
    from tests.test_hyperopt_e2e import tiny_space

    meta = make_synthetic_shards(str(tmp_path / "s"), num_classes=2,
                                 per_class=24, samples_per_shard=24,
                                 seed=6, size=64)
    info = analyze_webdataset(meta["shards"])
    cached = build_cache(meta["shards"], info.class_names, size=64)
    tracking.set_tracking_uri(str(tmp_path / "mlruns"))
    tracking.set_experiment("par_kfold")
    hcfg = HyperoptConfig(n_trials=2, k_folds=2, first_fold_min_acc=0.0,
                          median_startup_trials=50,
                          storage=str(tmp_path / "s.db"),
                          study_name="par_kfold", seed=0)
    ctx = HyperoptContext(
        cached=cached, info=info, hcfg=hcfg,
        model_base=ModelConfig(depth=18, num_classes=2, image_size=56,
                               compute_dtype="float32"),
        train_samples_per_epoch=48, eval_samples=24, space_fn=tiny_space)
    study = run_kfold_optimization(ctx, n_trials=2, verbose=False,
                                   parallel_workers=2)
    trials = study.get_trials()
    assert len(trials) == 2
    assert all(t.state == "COMPLETE" for t in trials)
    # the runner must surface the per-worker HBM pool stats on the
    # CALLER's ctx (the per-mesh replicas are internal) with the pools
    # themselves released
    assert ctx._hbm_pool is None
    assert ctx.hbm_pool_stats is not None
    assert ctx.hbm_pool_stats["upload_bytes"] > 0
    assert ctx.hbm_pool_stats["n_worker_pools"] >= 1


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

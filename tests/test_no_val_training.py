"""Regression: training WITHOUT a validation set must keep the LAST
epoch's weights (a constant stub val-accuracy used to make train_model
snapshot epoch-0 weights and silently restore them — code-review finding)."""

import numpy as np
import pytest

import jax

from irp_tpu.config import MeshConfig, ModelConfig, TrainConfig
from irp_tpu.data.analyze import analyze_webdataset
from irp_tpu.data.pipeline import build_cache
from irp_tpu.parallel.mesh import make_mesh
from irp_tpu.train import fit


def test_no_val_fit_keeps_last_epoch_weights(tmp_path):
    from tests.synth import make_synthetic_shards

    meta = make_synthetic_shards(str(tmp_path), num_classes=2, per_class=16,
                                 samples_per_shard=16, seed=5, size=64)
    info = analyze_webdataset(meta["shards"])
    data = build_cache(meta["shards"], info.class_names, size=64)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    mcfg = ModelConfig(depth=18, num_classes=2, image_size=56,
                       compute_dtype="float32")

    def run(epochs):
        tcfg = TrainConfig(learning_rate=3e-3, batch_size=8,
                           max_epochs=epochs, patience=99,
                           aug_intensity="low",
                           train_samples_per_epoch=32, eval_samples=None,
                           seed=0)
        return fit(data, None, info, mcfg, tcfg, mesh=mesh, mode="hbm")

    r1 = run(1)
    r3 = run(3)
    # val history is NaN (no val set), never a fake 0.0
    assert np.isnan(r3.history["val_acc"]).all()
    # weights after 3 epochs must differ from after 1 epoch — i.e. epochs
    # 2..3 were NOT discarded by a stale epoch-0 snapshot restore
    a = np.asarray(r1.state.params["head_dense2"]["kernel"])
    b = np.asarray(r3.state.params["head_dense2"]["kernel"])
    assert np.abs(a - b).max() > 1e-6
    # and the returned state matches the step count of the full run
    assert int(r3.state.step) == 3 * r3.steps_per_epoch

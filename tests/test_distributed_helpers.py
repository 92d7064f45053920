"""Distributed helpers + per-epoch checkpoint hook."""

import glob
import os

import numpy as np

from irp_tpu.parallel.distributed import (global_batch_for, host_shards,
                                          initialize)


def test_initialize_noop_single_process():
    initialize()  # must not raise in single-process mode


def test_host_shards_round_robin():
    shards = [f"s{i:02d}.tar" for i in range(10)]
    a = host_shards(shards, process_index=0, process_count=4)
    b = host_shards(shards, process_index=1, process_count=4)
    all_assigned = sorted(
        sum((host_shards(shards, i, 4) for i in range(4)), []))
    assert all_assigned == sorted(shards)
    assert set(a).isdisjoint(b)
    assert a == ["s00.tar", "s04.tar", "s08.tar"]


def test_global_batch():
    import jax

    assert global_batch_for(4) == 4 * jax.device_count()


def test_final_per_epoch_checkpoints(tmp_path):
    """on_epoch_end(state=...) hook writes per-epoch npz checkpoints."""
    import jax

    from irp_tpu.config import MeshConfig, ModelConfig, TrainConfig
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    from irp_tpu.parallel.mesh import make_mesh
    from irp_tpu.train import fit
    from irp_tpu.train.checkpoint import save_weights_npz
    from tests.synth import make_synthetic_shards

    meta = make_synthetic_shards(str(tmp_path / "s"), num_classes=2,
                                 per_class=16, samples_per_shard=16,
                                 seed=4, size=64)
    info = analyze_webdataset(meta["shards"])
    data = build_cache(meta["shards"], info.class_names, size=64)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    mcfg = ModelConfig(depth=18, num_classes=2, image_size=56,
                       compute_dtype="float32")
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=8, max_epochs=2,
                       patience=5, aug_intensity="low",
                       train_samples_per_epoch=32, eval_samples=16, seed=0)
    ckpt_dir = str(tmp_path / "ckpts")
    os.makedirs(ckpt_dir)

    def on_epoch_end(epoch, val_acc, state=None):
        assert state is not None
        save_weights_npz(os.path.join(ckpt_dir, f"ep{epoch}.npz"),
                         state.params, state.batch_stats)
        return False

    fit(data, data, info, mcfg, tcfg, mesh=mesh, mode="hbm",
        on_epoch_end=on_epoch_end)
    assert len(glob.glob(os.path.join(ckpt_dir, "ep*.npz"))) == 2

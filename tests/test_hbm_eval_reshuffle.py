"""Per-epoch HBM reshuffle + HBM-resident eval (round-2 VERDICT items 2/6).

- ``HBMDataset.local_reshuffle`` must re-permute every device's local shard
  on device, preserving each device's sample multiset (no cross-device
  movement, no re-upload).
- ``fit(mode='hbm')`` must invoke it every epoch > 0 so batch composition
  differs across epochs of ONE fit.
- ``HBMEvalSet`` + ``evaluate_hbm`` must reproduce the streaming
  ``evaluate`` path exactly (same logits/acc/loss) including wrap padding
  and the max_samples cap.
"""

import numpy as np
import pytest

import jax

from irp_tpu.config import MeshConfig, ModelConfig, TrainConfig
from irp_tpu.data.analyze import analyze_webdataset
from irp_tpu.data.pipeline import (CachedDataset, HBMDataset, HBMEvalSet,
                                   build_cache)
from irp_tpu.models import init_classifier
from irp_tpu.parallel.mesh import make_mesh, shard_variables
from irp_tpu.train import fit
from irp_tpu.train.loop import evaluate, evaluate_hbm
from irp_tpu.train.state import create_train_state
from irp_tpu.train.step import make_eval_step, make_hbm_eval_epoch

SIZE = 64
MODEL_CFG = ModelConfig(depth=18, num_classes=4, image_size=56,
                        dropout_rate=0.1, compute_dtype="float32")


@pytest.fixture(scope="module")
def cached(tmp_path_factory):
    from tests.synth import make_synthetic_shards

    root = tmp_path_factory.mktemp("hbm_shards")
    meta = make_synthetic_shards(str(root), num_classes=4, per_class=20,
                                 samples_per_shard=40, seed=3, size=SIZE)
    info = analyze_webdataset(meta["shards"])
    data = build_cache(meta["shards"], info.class_names, size=SIZE)
    return info, data


def test_local_reshuffle_permutes_within_devices(cached):
    _, data = cached
    mesh = make_mesh(MeshConfig(data=8, model=1))
    hbm = HBMDataset(data, mesh, shuffle_seed=0)
    imgs_before = np.asarray(hbm.images)
    labs_before = np.asarray(hbm.labels)
    hbm.local_reshuffle(seed=7)
    imgs_after = np.asarray(hbm.images)
    labs_after = np.asarray(hbm.labels)
    assert (labs_before != labs_after).any() or (
        imgs_before != imgs_after).any()
    # per-device multiset preserved: no cross-device sample movement
    for d in range(8):
        np.testing.assert_array_equal(np.sort(labs_before[d]),
                                      np.sort(labs_after[d]))
        np.testing.assert_array_equal(
            np.sort(imgs_before[d].reshape(len(labs_before[d]), -1), axis=0),
            np.sort(imgs_after[d].reshape(len(labs_after[d]), -1), axis=0))
    # images follow their labels (rows moved together)
    key_b = imgs_before.sum(axis=(2, 3, 4))
    key_a = imgs_after.sum(axis=(2, 3, 4))
    for d in range(8):
        order = {k: l for k, l in zip(key_b[d].tolist(),
                                      labs_before[d].tolist())}
        for k, l in zip(key_a[d].tolist(), labs_after[d].tolist()):
            assert order[k] == l


def test_fit_reshuffles_every_epoch(cached, monkeypatch):
    info, data = cached
    calls = []
    orig = HBMDataset.local_reshuffle
    monkeypatch.setattr(
        HBMDataset, "local_reshuffle",
        lambda self, seed: (calls.append(seed), orig(self, seed))[1])
    mesh = make_mesh(MeshConfig(data=8, model=1))
    tcfg = TrainConfig(learning_rate=1e-3, weight_decay=0.0, batch_size=16,
                       max_epochs=3, patience=5, aug_intensity="low",
                       train_samples_per_epoch=32, eval_samples=32, seed=0)
    fit(data, data, info, MODEL_CFG, tcfg, mesh=mesh, mode="hbm")
    assert len(calls) == 2  # epochs 1 and 2 (epoch 0 uses build-time shuffle)
    assert len(set(calls)) == 2  # distinct seeds -> distinct permutations


def _make_state(mesh):
    model, variables = init_classifier(MODEL_CFG, jax.random.PRNGKey(0),
                                       image_size=56)
    variables = shard_variables(mesh, variables)
    tcfg = TrainConfig(batch_size=16)
    return create_train_state(model, variables, tcfg, MODEL_CFG,
                              steps_per_epoch=2)


@pytest.mark.parametrize("max_samples", [None, 40])
def test_hbm_eval_matches_streaming(cached, max_samples):
    info, data = cached
    mesh = make_mesh(MeshConfig(data=8, model=1))
    state = _make_state(mesh)
    cw = np.asarray(info.class_weights, np.float32)

    stream = evaluate(state, make_eval_step(out_size=56,
                                            compute_dtype=np.float32),
                      data, batch_size=16, max_samples=max_samples,
                      class_weights=cw)

    hbm_eval = HBMEvalSet(data, mesh, batch_size=16, max_samples=max_samples)
    eval_epoch = make_hbm_eval_epoch(hbm_eval.per_device, out_size=56,
                                     compute_dtype=np.float32)
    hbm = evaluate_hbm(state, eval_epoch, hbm_eval, class_weights=cw)

    np.testing.assert_array_equal(stream.labels, hbm.labels)
    np.testing.assert_allclose(stream.logits, hbm.logits, atol=1e-5)
    np.testing.assert_array_equal(stream.preds, hbm.preds)
    assert abs(stream.accuracy - hbm.accuracy) < 1e-9
    assert abs(stream.loss - hbm.loss) < 1e-6


def test_hbm_eval_set_layout(cached):
    _, data = cached
    mesh = make_mesh(MeshConfig(data=8, model=1))
    ev = HBMEvalSet(data, mesh, batch_size=16, max_samples=50)
    assert ev.n == 50
    assert ev.per_device == 2
    assert ev.steps == -(-50 // 16)
    assert ev.images.shape == (8, ev.steps * 2, SIZE, SIZE, 3)
    # scatter inverts the layout exactly: feed padded positions as "logits"
    fake = np.arange(ev.steps * 16, dtype=np.float32).reshape(
        ev.steps, 16, 1)
    # padded position for (s, d, i) is d*(steps*bl) + s*bl + i
    out = ev.scatter_logits(fake)
    assert out.shape == (50, 1)
    # recompute expected: value at flat (s, d*bl+i) lands at orig order idx
    steps, bl = ev.steps, ev.per_device
    vals = fake.reshape(steps, 8, bl)
    padded = np.empty((8 * steps * bl,), np.float32)
    for s in range(steps):
        for d in range(8):
            for i in range(bl):
                padded[d * steps * bl + s * bl + i] = vals[s, d, i]
    expect_out = np.empty((50,), np.float32)
    expect_out[ev.order] = padded
    np.testing.assert_array_equal(out[:, 0], expect_out)

"""Mid-run checkpoint/resume (net-new over the reference, which saves
per-epoch state_dicts but has no restore path — SURVEY §5).

The strong claim under test: `fit` for k epochs + checkpoint + resumed
fit to n epochs reproduces an uninterrupted n-epoch run bit-for-bit —
the full TrainState round-trips (params, batch stats, Adam moments,
schedule step) and the per-epoch shuffle/augmentation streams are
derived from the epoch index, not loop order (fit.py replays skipped
local_reshuffle permutations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irp_tpu.config import DatasetInfo, ModelConfig, TrainConfig
from irp_tpu.data.pipeline import CachedDataset
from irp_tpu.train import fit
from irp_tpu.train.checkpoint import (latest_checkpoint, restore_checkpoint,
                                      save_checkpoint)


def _tiny_dataset(n=48, classes=3, size=72):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (n, size, size, 3), dtype=np.uint8)
    labels = (np.arange(n) % classes).astype(np.int32)
    names = tuple(f"c{i}" for i in range(classes))
    cached = CachedDataset(images=images, labels=labels,
                           keys=[str(i) for i in range(n)],
                           class_names=names)
    info = DatasetInfo(num_classes=classes, class_names=names,
                       class_weights=tuple([1.0] * classes),
                       class_counts=tuple([n // classes] * classes),
                       total_samples=n)
    return cached, info


CFGS = dict(
    model=ModelConfig(depth=18, num_classes=3, image_size=64,
                      compute_dtype="float32"),
    train=TrainConfig(learning_rate=1e-3, weight_decay=1e-4, batch_size=16,
                      max_epochs=4, patience=99, aug_intensity="low",
                      train_samples_per_epoch=None, eval_samples=None,
                      seed=7),
)


@pytest.mark.slow
def test_resume_is_bit_exact(tmp_path):
    cached, info = _tiny_dataset()

    # uninterrupted 4-epoch run
    full = fit(cached, None, info, CFGS["model"], CFGS["train"], mode="hbm")

    # "crash" after epoch 2 of the same 4-epoch run (the schedule length
    # is part of the optimizer: an interrupted run keeps its target epoch
    # count, it does not re-plan a shorter OneCycle), then resume to 4
    ckpt_dir = str(tmp_path / "ckpt")

    def crash_after_two(epoch, val_acc, state=None):
        save_checkpoint(ckpt_dir, state, step=epoch)
        return epoch >= 1

    fit(cached, None, info, CFGS["model"], CFGS["train"], mode="hbm",
        on_epoch_end=crash_after_two)
    path, start = latest_checkpoint(ckpt_dir)
    assert start == 2
    resumed = fit(cached, None, info, CFGS["model"], CFGS["train"],
                  mode="hbm", restore_from=path, start_epoch=start)

    # identical final parameters (f32 determinism on one host)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(full.state.params),
            jax.tree_util.tree_leaves_with_path(resumed.state.params)):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))
    assert int(full.state.step) == int(resumed.state.step)
    # resumed history covers only the continued epochs
    assert len(resumed.history["train_loss"]) == 2
    np.testing.assert_allclose(resumed.history["train_loss"],
                               full.history["train_loss"][2:], rtol=1e-6)


def test_checkpoint_roundtrip_includes_opt_state(tmp_path):
    cached, info = _tiny_dataset(n=16)
    import dataclasses
    one = dataclasses.replace(CFGS["train"], max_epochs=1)
    res = fit(cached, None, info, CFGS["model"], one, mode="hbm")
    ckpt_dir = str(tmp_path / "ck")
    save_checkpoint(ckpt_dir, res.state, step=0)

    # restore into a FRESH state: everything must round-trip
    fresh = fit(cached, None, info, CFGS["model"],
                dataclasses.replace(one, max_epochs=0), mode="hbm")
    restored = restore_checkpoint(latest_checkpoint(ckpt_dir)[0],
                                  fresh.state)
    assert int(restored.step) == int(res.state.step)
    for a, b in zip(jax.tree_util.tree_leaves(res.state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_sgd_opt_state(tmp_path):
    """A non-default optimizer family's opt_state structure (SGD's
    momentum TraceState instead of Adam's two moment trees) must
    round-trip through Orbax the same way — resume is config-driven, so
    restoring into a fresh state built from the SAME TrainConfig must be
    exact."""
    cached, info = _tiny_dataset(n=16)
    import dataclasses
    one = dataclasses.replace(CFGS["train"], max_epochs=1,
                              optimizer="sgd", schedule="cosine")
    res = fit(cached, None, info, CFGS["model"], one, mode="hbm")
    ckpt_dir = str(tmp_path / "ck_sgd")
    save_checkpoint(ckpt_dir, res.state, step=0)
    fresh = fit(cached, None, info, CFGS["model"],
                dataclasses.replace(one, max_epochs=0), mode="hbm")
    restored = restore_checkpoint(latest_checkpoint(ckpt_dir)[0],
                                  fresh.state)
    for a, b in zip(jax.tree_util.tree_leaves(res.state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint_empty(tmp_path):
    assert latest_checkpoint(str(tmp_path)) == (None, 0)
    assert latest_checkpoint(str(tmp_path / "missing")) == (None, 0)


def test_final_resume_requires_checkpoint_dir():
    """resume=True without checkpoint_dir must raise, not silently
    retrain from scratch (round-2 review finding)."""
    from irp_tpu.train.final import train_final_model

    class _FakeTrial:
        params = {"max_epochs": 4, "learning_rate": 1e-3,
                  "weight_decay": 1e-4, "batch_size": 8,
                  "dropout_rate": 0.1, "augmentation_intensity": "low",
                  "patience": 3}
        user_attrs = {}

    class _FakeStudy:
        best_trial = _FakeTrial()

        def get_trials(self):
            return [self.best_trial]

    cached, info = _tiny_dataset(n=8)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        train_final_model(_FakeStudy(), cached, cached, info,
                          model_base=CFGS["model"], resume=True,
                          verbose=False)

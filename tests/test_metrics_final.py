"""Metrics vs sklearn + final-trainer reporting pieces + checkpoints."""

import os

import numpy as np
import pytest

from irp_tpu.ops.metrics import (classification_report, confusion_matrix,
                                 precision_recall_f1)


def test_confusion_matrix_matches_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 5, 200)
    preds = rng.integers(0, 5, 200)
    ours = confusion_matrix(labels, preds, 5)
    theirs = sk.confusion_matrix(labels, preds, labels=range(5))
    np.testing.assert_array_equal(ours, theirs)


def test_classification_report_matches_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 4, 300)
    preds = np.where(rng.uniform(size=300) < 0.7, labels,
                     rng.integers(0, 4, 300))
    names = ["a", "b", "c", "d"]
    ours = classification_report(labels, preds, names)
    theirs = sk.classification_report(labels, preds, target_names=names,
                                      output_dict=True)
    for name in names + ["macro avg", "weighted avg"]:
        for key in ("precision", "recall", "f1-score"):
            np.testing.assert_allclose(ours[name][key], theirs[name][key],
                                       atol=1e-9)
    np.testing.assert_allclose(ours["accuracy"], theirs["accuracy"])


def test_visualize_classifications(tmp_path):
    from irp_tpu.train.final import visualize_classifications

    rng = np.random.default_rng(2)
    n = 40
    labels = rng.integers(0, 3, n)
    preds = np.where(rng.uniform(size=n) < 0.5, labels,
                     rng.integers(0, 3, n))
    images = rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8)
    paths = visualize_classifications(preds, labels, images,
                                      ["x", "y", "z"], str(tmp_path))
    assert any(p.endswith("correct_classifications.png") for p in paths)
    for p in paths:
        assert os.path.getsize(p) > 0


def test_weights_npz_roundtrip(tmp_path):
    import jax

    from irp_tpu.config import ModelConfig
    from irp_tpu.models import init_classifier
    from irp_tpu.train.checkpoint import load_weights_npz, save_weights_npz

    cfg = ModelConfig(depth=18, num_classes=3, image_size=32,
                      compute_dtype="float32")
    _, variables = init_classifier(cfg, jax.random.PRNGKey(0), 32)
    path = save_weights_npz(str(tmp_path / "w.npz"), variables["params"],
                            variables["batch_stats"])
    params, stats = load_weights_npz(path)
    for coll, tree in (("params", params), ("batch_stats", stats)):
        flat = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        for kp, leaf in flat:
            node = tree
            for p in kp:
                node = node[p.key]
            np.testing.assert_array_equal(np.asarray(leaf), node)


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from irp_tpu.config import ModelConfig, TrainConfig
    from irp_tpu.models import init_classifier
    from irp_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from irp_tpu.train.state import create_train_state

    cfg = ModelConfig(depth=18, num_classes=3, image_size=32,
                      compute_dtype="float32")
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0), 32)
    state = create_train_state(model, variables, TrainConfig(batch_size=4),
                               cfg, steps_per_epoch=10)
    path = save_checkpoint(str(tmp_path / "ckpt"), state)
    # perturb then restore
    perturbed = state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params))
    restored = restore_checkpoint(path, perturbed)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

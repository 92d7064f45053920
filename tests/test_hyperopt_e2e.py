"""Hyperopt end-to-end: k-fold objective + runner + analysis on tiny data.

Exercises the full sweep machinery with a restricted space and a tiny
ResNet-18 on the 8-device CPU mesh: trial lifecycle, tracking runs with
per-epoch metrics, recommended_epochs handoff, tier-2 pruning, analysis
plots, and the final trainer handoff.
"""

import os

import numpy as np
import pytest

from irp_tpu import tracking
from irp_tpu.config import HyperoptConfig, MeshConfig, ModelConfig
from irp_tpu.data.analyze import analyze_webdataset
from irp_tpu.data.pipeline import build_cache
from irp_tpu.hyperopt import (HyperoptContext, enhanced_optuna_analysis,
                              run_kfold_optimization, study_statistics,
                              visualize_best_trial_metrics)
from irp_tpu.parallel.mesh import make_mesh

SIZE = 64


def tiny_space(trial):
    """Restricted space so CPU trials stay small (2 epochs, bs 16)."""
    return {
        "learning_rate": trial.suggest_float("learning_rate", 1e-3, 5e-3,
                                             log=True),
        "batch_size": trial.suggest_categorical("batch_size", [16]),
        "weight_decay": trial.suggest_float("weight_decay", 1e-6, 1e-4,
                                            log=True),
        "dropout_rate": trial.suggest_float("dropout_rate", 0.0, 0.2),
        "augmentation_intensity": trial.suggest_categorical(
            "augmentation_intensity", ["low"]),
        "patience": trial.suggest_int("patience", 3, 3),
        "max_epochs": trial.suggest_int("max_epochs", 2, 2),
    }


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    from tests.synth import make_synthetic_shards

    root = tmp_path_factory.mktemp("hpo")
    meta = make_synthetic_shards(str(root), num_classes=3, per_class=32,
                                 samples_per_shard=24, seed=2, size=SIZE)
    info = analyze_webdataset(meta["shards"])
    cached = build_cache(meta["shards"], info.class_names,
                         cache_dir=str(root / "cache"), size=SIZE)
    tracking.set_tracking_uri(str(root / "mlruns"))
    tracking.set_experiment("animals10_test")
    hcfg = HyperoptConfig(
        n_trials=2, k_folds=2, first_fold_min_acc=0.0,
        median_startup_trials=50, storage=str(root / "study.db"),
        study_name="tiny", seed=0)
    model_base = ModelConfig(depth=18, num_classes=info.num_classes,
                             image_size=56, compute_dtype="float32")
    mesh = make_mesh(MeshConfig(data=8, model=1))
    return HyperoptContext(
        cached=cached, info=info, hcfg=hcfg, model_base=model_base,
        mesh=mesh, train_samples_per_epoch=128, eval_samples=64,
        space_fn=tiny_space), root


@pytest.mark.slow
def test_kfold_sweep_end_to_end(ctx):
    context, root = ctx
    # tolerate pre-existing trials: the handoff test self-populates the
    # same module-scoped storage when it runs first (test reordering)
    before = len(run_kfold_optimization(context, n_trials=0,
                                        verbose=False).get_trials())
    study = run_kfold_optimization(context, n_trials=2, verbose=False)
    stats = study_statistics(study)
    assert stats["n_trials"] == before + 2
    assert stats["n_complete"] >= 1

    best = study.best_trial
    assert "tracking_run_id" in best.user_attrs
    client = tracking.TrackingClient()
    run_id = best.user_attrs["tracking_run_id"]
    run = client.get_run(run_id)
    assert "recommended_epochs" in run["params"]
    hist = client.get_metric_history(run_id, "epoch_avg_val_acc")
    assert len(hist) >= 1  # epochs seen by both folds

    # analysis artifacts
    out = enhanced_optuna_analysis(study, str(root / "analysis"),
                                   verbose=False)
    for p in out["plots"].values():
        assert os.path.getsize(p) > 0
    curves = visualize_best_trial_metrics(study, str(root / "curves"))
    assert curves and os.path.getsize(curves[0]) > 0

    # resume: rerunning with same storage adds trials
    study2 = run_kfold_optimization(context, n_trials=1, verbose=False)
    assert len(study2.get_trials()) == before + 3


@pytest.mark.slow
def test_first_fold_floor_prunes(ctx):
    context, root = ctx
    import dataclasses

    strict = dataclasses.replace(
        context.hcfg, first_fold_min_acc=101.0,
        storage=str(root / "study_floor.db"), study_name="floor")
    strict_ctx = HyperoptContext(
        cached=context.cached, info=context.info, hcfg=strict,
        model_base=context.model_base, mesh=context.mesh,
        train_samples_per_epoch=64, eval_samples=32,
        space_fn=tiny_space)
    study = run_kfold_optimization(strict_ctx, n_trials=1, verbose=False)
    trials = study.get_trials()
    assert trials[0].state == "PRUNED"


@pytest.mark.slow
def test_final_trainer_handoff(ctx):
    context, root = ctx
    from irp_tpu.hyperopt.study import create_study
    from irp_tpu.train.final import train_final_model

    study = create_study("tiny", str(root / "study.db"),
                         load_if_exists=True)
    if not any(t.state == "COMPLETE" for t in study.get_trials()):
        # self-sufficient when run alone (-k/--last-failed): populate the
        # study instead of depending on the sweep test's side effects
        study = run_kfold_optimization(context, n_trials=2, verbose=False)
    result = train_final_model(
        study, context.cached, context.cached, context.info,
        model_base=context.model_base, mesh=context.mesh,
        experiment="animals10_test", verbose=False)
    assert result is not None
    assert np.isfinite(result.test_loss)
    assert result.test_acc > 30.0  # separable synthetic data
    client = tracking.TrackingClient()
    arts = client.list_artifacts(result.run_id)
    assert any("confusion_matrix" in a for a in arts)
    assert any(a.endswith("final_model.npz") for a in arts)
    assert "accuracy" in result.report

    from irp_tpu.train.final import display_model_visualizations
    pngs = display_model_visualizations("animals10_test")
    assert any("confusion_matrix" in p for p in pngs)

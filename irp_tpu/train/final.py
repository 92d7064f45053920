"""Final-model training + full test evaluation + reporting.

Behavioral rebuild of the reference ``train_final_model`` and its
visualizers (reference functions/final.py:158-412, :27-152, :415-537):

- pulls best params from the study; reads ``recommended_epochs`` from the
  best trial's tracking run (joined via the run-id user attr,
  hyperopt.py:376 / final.py:174-189), falling back to 0.8*max_epochs;
- retrains on ALL train data, uncapped batches, per-EPOCH schedule step
  (the reference's final.py:330 quirk, kept as scheduler_step='epoch');
- per-epoch checkpoints + final weights artifact (final.py:339-354);
- full test eval, per-class precision/recall/F1 metrics, confusion-matrix
  heatmap, correct/incorrect prediction galleries (final.py:358-400);
- ``display_model_visualizations`` finds those artifacts back from the
  tracking store (final.py:415-537).
"""

from __future__ import annotations

import dataclasses
import os
import tempfile
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from irp_tpu import tracking
from irp_tpu.config import DatasetInfo, ModelConfig, TrainConfig
from irp_tpu.data.pipeline import CachedDataset
from irp_tpu.ops.metrics import classification_report, confusion_matrix
from irp_tpu.train.checkpoint import (export_torch_pth, latest_checkpoint,
                                      save_checkpoint, save_weights_npz)
from irp_tpu.train.fit import fit
from irp_tpu.train.loop import evaluate_full
from irp_tpu.utils.viz import plot_confusion_matrix, plot_image_grid


@dataclass
class FinalResult:
    state: object
    test_acc: float
    test_loss: float
    report: dict
    run_id: str
    history: dict


def recommended_epochs_from_study(study, fallback_factor: float = 0.8,
                                  client: Optional[object] = None) -> int:
    """recommended_epochs from the best trial's tracking run; fallback to
    0.8 * max_epochs (reference final.py:174-189)."""
    best = study.best_trial
    run_id = best.user_attrs.get("tracking_run_id")
    if run_id:
        try:
            client = client or tracking.TrackingClient()
            run = client.get_run(run_id)
            return int(run["params"]["recommended_epochs"])
        except Exception as e:  # noqa: BLE001 — mirror reference fallback
            print(f"Could not retrieve early stopping info: {e}")
    max_epochs = best.params.get("max_epochs")
    if max_epochs is None:
        print("best trial has no max_epochs param; defaulting to 10 epochs")
        return 10
    return int(max_epochs * fallback_factor)


def visualize_classifications(preds: np.ndarray, labels: np.ndarray,
                              images_u8: np.ndarray,
                              class_names: Sequence[str],
                              save_dir: str,
                              max_incorrect: int = 10):
    """Correct/incorrect prediction galleries (reference final.py:27-152):
    one correct sample per class + up to ``max_incorrect`` errors.
    Works from the uint8 cache directly (no denormalization needed)."""
    os.makedirs(save_dir, exist_ok=True)
    paths = []

    correct_imgs, correct_titles = [], []
    for c, name in enumerate(class_names):
        hits = np.nonzero((labels == c) & (preds == c))[0]
        if len(hits):
            correct_imgs.append(images_u8[hits[0]])
            correct_titles.append(f"true/pred: {name}")
    if correct_imgs:
        paths.append(plot_image_grid(
            correct_imgs, correct_titles,
            os.path.join(save_dir, "correct_classifications.png"),
            suptitle="Correct classifications (1 per class)"))

    wrong = np.nonzero(preds != labels)[0][:max_incorrect]
    if len(wrong):
        imgs = [images_u8[i] for i in wrong]
        titles = [f"true: {class_names[labels[i]]}\npred: "
                  f"{class_names[preds[i]]}" for i in wrong]
        paths.append(plot_image_grid(
            imgs, titles,
            os.path.join(save_dir, "incorrect_classifications.png"),
            suptitle="Incorrect classifications"))
    return paths


def train_final_model(study, train_cached: CachedDataset,
                      test_cached: CachedDataset, info: DatasetInfo,
                      model_base: ModelConfig = ModelConfig(),
                      train_base: TrainConfig = TrainConfig(),
                      mesh=None, mode: str = "hbm",
                      epochs_factor: float = 1.2,
                      checkpoint_dir: Optional[str] = None,
                      experiment: str = "animals10",
                      verbose: bool = True,
                      resume: bool = False) -> Optional[FinalResult]:
    """Retrain with the best hyperparameters on all data + full test eval.

    ``epochs_factor`` is accepted for parity with the reference signature
    (final.py:158) — the reference accepts it but trains exactly
    ``recommended_epochs``; we do the same.

    ``train_base`` seeds every TrainConfig field the study does not
    search (mixup/cutmix alphas, label_smoothing, hbm_reshuffle, ...);
    the best trial's hyperparameters are replaced on top of it.

    ``resume=True`` (requires ``checkpoint_dir``) continues a killed run
    from its latest per-epoch Orbax checkpoint — full TrainState, so Adam
    moments and the schedule position carry over.  Net-new over the
    reference (per-epoch torch.save only, no restore path,
    final.py:339-340).
    """
    if study is None or not study.get_trials():
        print("No valid study available. Cannot train final model.")
        return None

    best = study.best_trial
    bp = best.params
    if verbose:
        print("Training final model with best hyperparameters:")
        for k, v in bp.items():
            print(f"  {k}: {v}")

    final_epochs = recommended_epochs_from_study(study)
    if verbose:
        print(f"Training for {final_epochs} epochs")

    # dataclasses.replace keeps every model_base field (incl. any added
    # later, e.g. fused_frozen_blocks) instead of a lossy field-by-field
    # reconstruction.
    model_cfg = dataclasses.replace(
        model_base, num_classes=info.num_classes,
        dropout_rate=bp.get("dropout_rate", model_base.dropout_rate))
    # Same pattern over train_base: recipe fields the study doesn't
    # search (mixup/cutmix alphas, label_smoothing, ...) carry through.
    train_cfg = dataclasses.replace(
        train_base,
        learning_rate=bp["learning_rate"],
        weight_decay=bp["weight_decay"],
        batch_size=bp["batch_size"],
        max_epochs=final_epochs,
        patience=final_epochs + 1,  # no early stop in the final run
        aug_intensity=bp.get("augmentation_intensity", "medium"),
        train_samples_per_epoch=None,  # uncapped (final.py:282-320)
        eval_samples=None,
        scheduler_step="epoch",  # final.py:330 quirk kept as spec
        seed=42)
    # Extra searched dimensions that name TrainConfig fields (the
    # hyperopt extra-key overlay, e.g. --search-optimizer) must carry
    # into the final run too — the best trial won WITH that knob.
    # Fields the final stage pins above (epoch budget, scheduler mode,
    # seed, ...) stay pinned.
    _final_pinned = {"learning_rate", "weight_decay", "batch_size",
                     "max_epochs", "patience", "aug_intensity",
                     "train_samples_per_epoch", "eval_samples",
                     "scheduler_step", "seed"}
    _train_fields = {f.name for f in dataclasses.fields(type(train_cfg))}
    extra = {k: v for k, v in bp.items()
             if k in _train_fields and k not in _final_pinned}
    if extra:
        train_cfg = dataclasses.replace(train_cfg, **extra)

    tracking.set_experiment(experiment)
    with tracking.start_run(run_name="final_model_full_training") as run:
        # bn_stats_mode changes frozen-stage BN numerics ('all' = torch
        # .train() parity, 'trainable_only' = faster inference-form BN);
        # log it so any accuracy number is attributable to its mode.
        recipe = {k: v for k, v in
                  (("mixup_alpha", train_cfg.mixup_alpha),
                   ("cutmix_alpha", train_cfg.cutmix_alpha),
                   ("label_smoothing", train_cfg.label_smoothing),
                   ("ema_decay", train_cfg.ema_decay))
                  if v}  # off-by-default knobs: log only when set
        if train_cfg.grad_accum_steps > 1:
            recipe["grad_accum_steps"] = train_cfg.grad_accum_steps
        if train_cfg.optimizer != "adam":
            recipe["optimizer"] = train_cfg.optimizer
        if train_cfg.schedule != "onecycle":
            recipe["schedule"] = train_cfg.schedule
        run.log_params({**bp, **recipe, "final_epochs": final_epochs,
                        "mode": mode,
                        "bn_stats_mode": model_cfg.bn_stats_mode})

        # image_size rides in every npz artifact so the serving path
        # preprocesses with the training-time eval geometry
        # (infer.py::load_predictor)
        npz_meta = {"image_size": model_cfg.image_size}
        on_epoch_end = None
        restore_from, start_epoch = None, 0
        if resume and not checkpoint_dir:
            raise ValueError("resume=True requires checkpoint_dir (there "
                             "is nowhere to restore from)")
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            if resume:
                restore_from, start_epoch = latest_checkpoint(checkpoint_dir)
                if verbose and restore_from:
                    print(f"Resuming from {restore_from} "
                          f"(epoch {start_epoch})")

            # Per-epoch checkpoints (reference final.py:339-340 saves a
            # state_dict every epoch; ours also keeps the full TrainState
            # for exact resume).
            def on_epoch_end(epoch, val_acc, state=None):
                if state is not None:
                    save_weights_npz(
                        os.path.join(checkpoint_dir,
                                     f"checkpoint_epoch_{epoch:03d}.npz"),
                        state.params, state.batch_stats, meta=npz_meta)
                    save_checkpoint(checkpoint_dir, state, step=epoch)
                return False

        result = fit(train_cached, None, info, model_cfg, train_cfg,
                     mesh=mesh, logger=run, mode=mode, verbose=verbose,
                     on_epoch_end=on_epoch_end,
                     restore_from=restore_from, start_epoch=start_epoch)
        state = result.state

        artifact_dir = tempfile.mkdtemp(prefix="irp_final_")
        weights_path = save_weights_npz(
            os.path.join(artifact_dir, "final_model.npz"),
            state.params, state.batch_stats, meta=npz_meta)
        run.log_artifact(weights_path)
        try:
            pth = export_torch_pth(
                os.path.join(artifact_dir, "final_model.pth"),
                state.params, state.batch_stats, depth=model_cfg.depth)
            run.log_artifact(pth)
        except Exception as e:  # torch optional at this point
            print(f"torch export skipped: {e}")
        if checkpoint_dir:
            save_weights_npz(os.path.join(checkpoint_dir,
                                          "final_model.npz"),
                             state.params, state.batch_stats,
                             meta=npz_meta)

        if verbose:
            print("\nEvaluating final model on test set...")
        test = evaluate_full(state, result.eval_step, test_cached,
                             batch_size=train_cfg.batch_size,
                             class_weights=np.asarray(info.class_weights))
        run.log_metrics({"test_acc": test.accuracy,
                         "test_loss": test.loss})
        if verbose:
            print(f"\nFinal Test Results:\n  Loss: {test.loss:.4f}\n"
                  f"  Accuracy: {test.accuracy:.2f}%")

        report = classification_report(test.labels, test.preds,
                                       info.class_names)
        for name in info.class_names:
            run.log_metrics({
                f"test_f1_{name}": report[name]["f1-score"],
                f"test_precision_{name}": report[name]["precision"],
                f"test_recall_{name}": report[name]["recall"],
            })

        cm = confusion_matrix(test.labels, test.preds, info.num_classes)
        cm_path = plot_confusion_matrix(
            cm, info.class_names,
            os.path.join(artifact_dir, "confusion_matrix.png"),
            title="Final Model Confusion Matrix (Test Set)")
        run.log_artifact(cm_path)

        viz_paths = visualize_classifications(
            test.preds, test.labels, np.asarray(test_cached.images),
            info.class_names, artifact_dir)
        for p in viz_paths:
            run.log_artifact(p)

        return FinalResult(state=state, test_acc=test.accuracy,
                           test_loss=test.loss, report=report,
                           run_id=run.info.run_id,
                           history=result.history)


def display_model_visualizations(experiment: str = "animals10",
                                 run_name: str = "final_model_full_training",
                                 out_dir: Optional[str] = None):
    """Find the final run's PNG artifacts in the tracking store and return
    (optionally copy) their paths (reference final.py:415-537)."""
    import shutil

    client = tracking.TrackingClient()
    runs = client.search_runs(experiment, run_name=run_name)
    if not runs:
        print(f"No runs named {run_name!r} in experiment {experiment!r}")
        return []
    # latest by start_time (directory order is random uuid order)
    latest = max(runs, key=lambda r: int(r["info"].get("start_time", 0)))
    run_id = latest["info"].get("run_id") or latest["info"].get("run_uuid")
    artifacts = [a for a in client.list_artifacts(run_id)
                 if a.endswith(".png")]
    paths = [client.artifact_path(run_id, a) for a in artifacts]
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        copied = []
        for p in paths:
            dst = os.path.join(out_dir, os.path.basename(p))
            shutil.copy2(p, dst)
            copied.append(dst)
        return copied
    return paths

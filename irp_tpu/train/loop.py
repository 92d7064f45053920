"""Epoch loops: train_epoch / evaluate / train_model / evaluate_full.

Behavioral contract from the reference (functions/train.py):
- train_epoch caps work at ``train_samples_per_epoch`` (1024) samples
  (train.py:19: max_batches = 1024/batch_size) — "subsampled epochs";
- evaluate caps at 512 samples (train.py:73) and reports loss/acc plus
  preds/labels;
- train_model runs up to max_epochs with early stopping on best val
  accuracy (patience), snapshots/restores the best weights
  (train.py:172-187), and logs train_loss/train_acc/val_loss/val_acc per
  epoch (train.py:164-169; accuracies in percent);
- evaluate_full is the uncapped variant (train.py:192-238).

TPU-native differences: the step is one compiled program (no per-batch
Python work beyond feeding indices), metric scalars stay on device until
the end of the epoch (no forced syncs in the hot loop), and eval loss/acc
are reduced host-side from returned logits so padded tail batches are
masked exactly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from irp_tpu.data.pipeline import CachedDataset, iter_host_batches


def _host_weighted_ce(logits: np.ndarray, labels: np.ndarray,
                      class_weights=None) -> float:
    """Exact torch CrossEntropyLoss(weight=w) reduction on host."""
    logits = logits.astype(np.float64)
    m = logits.max(axis=1, keepdims=True)
    logp = logits - m - np.log(np.exp(logits - m).sum(axis=1, keepdims=True))
    ce = -logp[np.arange(len(labels)), labels]
    if class_weights is None:
        return float(ce.mean()) if len(ce) else 0.0
    w = np.asarray(class_weights, np.float64)[labels]
    return float((w * ce).sum() / max(w.sum(), 1e-12))


@dataclass
class EvalResult:
    loss: float
    accuracy: float  # percent, like the reference (train.py:100-105)
    preds: np.ndarray
    labels: np.ndarray
    logits: np.ndarray


def train_epoch(state, run_step: Callable, batches: Iterator, key,
                max_steps: Optional[int] = None) -> Tuple[object, float, float]:
    """One training epoch.  ``run_step(state, batch, key) -> (state, metrics)``.

    Metrics stay as device scalars until the epoch ends (single sync).
    """
    losses: List[jax.Array] = []
    accs: List[jax.Array] = []
    for i, batch in enumerate(batches):
        if max_steps is not None and i >= max_steps:
            break
        state, metrics = run_step(state, batch, jax.random.fold_in(key, i))
        losses.append(metrics["loss"])
        accs.append(metrics["accuracy"])
    if not losses:
        return state, 0.0, 0.0
    loss = float(jnp.mean(jnp.stack(losses)))
    acc = float(jnp.mean(jnp.stack(accs))) * 100.0
    return state, loss, acc


def evaluate(state, eval_step: Callable, cached: CachedDataset,
             batch_size: int = 64, max_samples: Optional[int] = 512,
             class_weights=None) -> EvalResult:
    """Capped evaluation (reference train.py:64-108; cap train.py:73)."""
    all_logits, all_labels = [], []
    seen = 0
    for images, labels, n_valid in iter_host_batches(
            cached, batch_size, shuffle=False, pad_final=True):
        logits = np.asarray(eval_step(state, images), np.float32)[:n_valid]
        if max_samples is not None and seen + n_valid > max_samples:
            n_keep = max_samples - seen
            logits, labels = logits[:n_keep], labels[:n_keep]
            n_valid = n_keep
        all_logits.append(logits)
        all_labels.append(labels[:n_valid])
        seen += n_valid
        if max_samples is not None and seen >= max_samples:
            break
    logits = np.concatenate(all_logits) if all_logits else np.zeros((0, 1))
    labels = np.concatenate(all_labels) if all_labels else np.zeros((0,), int)
    preds = logits.argmax(axis=1)
    acc = 100.0 * float((preds == labels).mean()) if len(labels) else 0.0
    loss = _host_weighted_ce(logits, labels, class_weights)
    return EvalResult(loss=loss, accuracy=acc, preds=preds, labels=labels,
                      logits=logits)


def evaluate_hbm(state, eval_epoch: Callable, hbm_eval,
                 class_weights=None) -> EvalResult:
    """Evaluate against an HBM-resident eval set (see pipeline.HBMEvalSet).

    One scanned dispatch for the whole (capped) eval set; no per-epoch
    host->device re-upload.  Same reductions as ``evaluate`` — loss/acc on
    host from f32 logits with wrap padding undone exactly."""
    logits_steps = np.asarray(
        eval_epoch(state, hbm_eval.images, jnp.asarray(hbm_eval.offsets)),
        np.float32)
    logits = hbm_eval.scatter_logits(logits_steps)
    labels = hbm_eval.labels
    preds = logits.argmax(axis=1)
    acc = 100.0 * float((preds == labels).mean()) if len(labels) else 0.0
    loss = _host_weighted_ce(logits, labels, class_weights)
    return EvalResult(loss=loss, accuracy=acc, preds=preds, labels=labels,
                      logits=logits)


def evaluate_full(state, eval_step: Callable, cached: CachedDataset,
                  batch_size: int = 64, class_weights=None) -> EvalResult:
    """Uncapped test evaluation (reference train.py:192-238)."""
    return evaluate(state, eval_step, cached, batch_size,
                    max_samples=None, class_weights=class_weights)


def snapshot_weights(state):
    """Device-side copy of (params, batch_stats) safe against donation."""
    return jax.tree_util.tree_map(jnp.copy,
                                  (state.params, state.batch_stats))


def restore_weights(state, snapshot):
    params, batch_stats = snapshot
    return state.replace(params=params, batch_stats=batch_stats)


def _accepts_state(cb) -> bool:
    """Does the on_epoch_end callback take a ``state`` parameter?"""
    import inspect

    try:
        params = inspect.signature(cb).parameters
    except (TypeError, ValueError):
        return False
    return "state" in params or any(
        p.kind == inspect.Parameter.VAR_KEYWORD for p in params.values())


def train_model(state, run_epoch: Callable, eval_fn: Callable,
                max_epochs: int, patience: int = 4,
                logger=None, on_epoch_end: Optional[Callable] = None,
                verbose: bool = False, start_epoch: int = 0,
                snapshot_fn: Callable = snapshot_weights):
    """Early-stopped multi-epoch fit (reference train.py:111-189).

    ``run_epoch(state, epoch) -> (state, train_loss, train_acc_pct)``
    ``eval_fn(state) -> EvalResult | None`` — None means "no validation
    set" (the final full-training run, reference final.py:282-330 trains
    without a val split): no early stopping and no best-weight restore —
    the LAST epoch's weights are returned, never a stale snapshot.
    ``on_epoch_end(epoch, val_acc) -> True to stop`` (pruning hook for the
    hyperopt tiers, reference hyperopt.py:214-247).
    ``start_epoch``: resume point — the loop runs epochs
    [start_epoch, max_epochs); pass a state restored from a checkpoint
    (net-new over the reference, which has no mid-run resume, SURVEY §5).
    ``snapshot_fn(state) -> (params, batch_stats)`` overrides which
    weights the best-epoch snapshot captures (fit() passes the EMA tree
    when TrainConfig.ema_decay > 0); must stay ``restore_weights``-shaped.
    Returns (state_with_best_weights, history, best_val_acc).
    """
    history = {"train_loss": [], "train_acc": [], "val_loss": [],
               "val_acc": []}
    best_val_acc = -math.inf
    best_snapshot = None
    no_improve = 0

    for epoch in range(start_epoch, max_epochs):
        state, train_loss, train_acc = run_epoch(state, epoch)
        val = eval_fn(state)

        history["train_loss"].append(train_loss)
        history["train_acc"].append(train_acc)
        history["val_loss"].append(val.loss if val else math.nan)
        history["val_acc"].append(val.accuracy if val else math.nan)

        if verbose:
            val_str = (f"val {val.loss:.4f}/{val.accuracy:.2f}%"
                       if val else "no val")
            print(f"Epoch {epoch + 1}/{max_epochs}  "
                  f"train {train_loss:.4f}/{train_acc:.2f}%  {val_str}")
        if logger is not None:
            metrics = {"train_loss": train_loss, "train_acc": train_acc}
            if val is not None:
                metrics.update({"val_loss": val.loss,
                                "val_acc": val.accuracy})
            logger.log_metrics(metrics, step=epoch)

        if val is not None:
            if val.accuracy > best_val_acc:
                best_val_acc = val.accuracy
                best_snapshot = snapshot_fn(state)
                no_improve = 0
            else:
                no_improve += 1

        if on_epoch_end is not None:
            val_acc = val.accuracy if val is not None else math.nan
            # choose the call form by signature, not by try/except
            # TypeError — the except would swallow TypeErrors raised
            # INSIDE the callback (e.g. a failing checkpoint save) and
            # silently retry without state, disabling checkpointing
            if _accepts_state(on_epoch_end):
                stop = on_epoch_end(epoch, val_acc, state=state)
            else:
                stop = on_epoch_end(epoch, val_acc)
            if stop:
                break
        if val is not None and no_improve >= patience:
            if verbose:
                print(f"Early stopping after {epoch + 1} epochs")
            break

    if best_snapshot is not None:
        state = restore_weights(state, best_snapshot)
    return state, history, best_val_acc

"""K-fold hyperopt objective with the three-tier pruning ladder.

Behavioral rebuild of the reference ``objective_kfold`` (reference
functions/hyperopt.py:27-380):

- 7-dim search space: lr 1e-5..1e-2 log, batch {8,16,32}, wd 1e-6..1e-3
  log, dropout 0..0.5, augmentation {low,medium,high}, patience 3..6,
  max_epochs 10..20 (hyperopt.py:45-51)
- tier-1: per-epoch MedianPruner reports on fold 0 (hyperopt.py:214-221)
- tier-2: fold-0 best accuracy below ``first_fold_min_acc`` -> pruned
  (hyperopt.py:236-247)
- tier-3: running average below 85% of the median of >=20 completed trials
  -> pruned (hyperopt.py:285-307)
- objective: best per-epoch cross-fold mean accuracy (epochs seen by all k
  folds), returned as the 80% t-distribution lower confidence bound
  (hyperopt.py:323-378); recommended_epochs + run id recorded for the final
  trainer handoff (hyperopt.py:367-376)
- device OOM -> -inf (hyperopt.py:313-319; RESOURCE_EXHAUSTED here)

TPU-native differences: folds are served from the single decoded cache
(no per-trial shard re-reads, cf. dataload.py:78-93), every fold's training
runs as fused on-device epochs, and batch sizes {8,16,32} are distinct
static shapes (one compile each, cached across trials).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np
from scipy import stats

from irp_tpu import tracking
from irp_tpu.config import (DatasetInfo, HyperoptConfig, ModelConfig,
                            TrainConfig)
from irp_tpu.data.kfold import create_stratified_kfolds
from irp_tpu.data.pipeline import CachedDataset
from irp_tpu.hyperopt.study import Trial, TrialPruned
from irp_tpu.train.fit import fit


@dataclass
class HyperoptContext:
    """Everything a trial needs, prepared once per sweep."""

    cached: CachedDataset  # full train cache (all shards decoded once)
    info: DatasetInfo
    hcfg: HyperoptConfig
    model_base: ModelConfig = ModelConfig()
    # Base for every trial's TrainConfig: the searched hyperparameters
    # are replaced per trial; everything else (mixup/cutmix alphas,
    # label_smoothing, hbm_reshuffle, ...) is the sweep-wide recipe.
    train_base: TrainConfig = TrainConfig()
    mesh: object = None
    mode: str = "hbm"
    # subsampled-epoch caps (reference train.py:19,73)
    train_samples_per_epoch: Optional[int] = 1024
    eval_samples: Optional[int] = 512
    verbose: bool = False
    # override the search space (tests / restricted sweeps)
    space_fn: object = None
    # One HBM-resident copy of the full train cache per sweep, with folds
    # produced by on-device regrouping (pipeline.HBMFoldPool) instead of a
    # per-fold-fit re-upload: host->device image traffic drops from
    # O(k * trials * N) to O(N).  Off: the pre-pool per-fit uploads.
    reuse_hbm_pool: bool = True

    def __post_init__(self):
        shards = list(self.cached.shard_paths or ())
        hist = {}
        for p in shards:
            ids = np.nonzero(np.isin(
                self.cached.shard_ids,
                [i for i, q in enumerate(self.cached.shard_paths)
                 if q == p]))[0]
            import collections
            hist[p] = collections.Counter(
                self.info.class_names[l] for l in self.cached.labels[ids])
        self._histograms = hist
        self._shards = shards
        self._fold_cache: Dict[int, List[List[str]]] = {}
        self._hbm_pool = None  # lazily built per-ctx (== per worker mesh)
        self.hbm_pool_stats: Optional[Dict] = None  # set on release

    def hbm_pool(self, mesh):
        """The sweep-wide HBM fold pool for this context's mesh (lazy;
        one ctx == one mesh, parallel workers each get a replaced ctx)."""
        if self._hbm_pool is None:
            from irp_tpu.data.pipeline import HBMFoldPool

            self._hbm_pool = HBMFoldPool(self.cached, mesh,
                                         seed=self.hcfg.seed)
        return self._hbm_pool

    def release_hbm_pool(self):
        """Drop the pool's device arrays (call after the sweep: the final
        full-train stage builds its own HBMDataset of the same images, and
        a still-alive pool would double device-resident pixel memory).
        Lightweight stats survive in ``hbm_pool_stats``."""
        if self._hbm_pool is not None:
            self.hbm_pool_stats = {
                "upload_bytes": self._hbm_pool.upload_bytes,
                "last_dropped": self._hbm_pool.last_dropped,
            }
        self._hbm_pool = None

    def folds(self, k: int, seed: int) -> List[List[str]]:
        key = (k, seed)
        if key not in self._fold_cache:
            self._fold_cache[key] = create_stratified_kfolds(
                self._shards, k=k, seed=seed, histograms=self._histograms)
        return self._fold_cache[key]


# The reference's 7 searched keys (hyperopt.py:45-51): consumed
# explicitly by objective_kfold; anything ELSE a space_fn suggests that
# names a TrainConfig field is overlaid onto the trial's TrainConfig.
_REFERENCE_SPACE_KEYS = frozenset((
    "learning_rate", "batch_size", "weight_decay", "dropout_rate",
    "augmentation_intensity", "patience", "max_epochs"))
_TRAIN_FIELD_NAMES = frozenset(
    f.name for f in dataclasses.fields(TrainConfig))


def suggest_space(trial: Trial) -> Dict:
    """The reference's 7-dim space (hyperopt.py:45-51)."""
    return {
        "learning_rate": trial.suggest_float("learning_rate", 1e-5, 1e-2,
                                             log=True),
        "batch_size": trial.suggest_categorical("batch_size", [8, 16, 32]),
        "weight_decay": trial.suggest_float("weight_decay", 1e-6, 1e-3,
                                            log=True),
        "dropout_rate": trial.suggest_float("dropout_rate", 0.0, 0.5),
        "augmentation_intensity": trial.suggest_categorical(
            "augmentation_intensity", ["low", "medium", "high"]),
        "patience": trial.suggest_int("patience", 3, 6),
        "max_epochs": trial.suggest_int("max_epochs", 10, 20),
    }


def quick_space(trial: Trial) -> Dict:
    """Restricted smoke-test space shared by the CLIs' --quick modes:
    2 epochs, one batch size, low augmentation."""
    return {
        "learning_rate": trial.suggest_float("learning_rate", 1e-4, 5e-3,
                                             log=True),
        "batch_size": trial.suggest_categorical("batch_size", [16]),
        "weight_decay": trial.suggest_float("weight_decay", 1e-6, 1e-4,
                                            log=True),
        "dropout_rate": trial.suggest_float("dropout_rate", 0.0, 0.3),
        "augmentation_intensity": trial.suggest_categorical(
            "augmentation_intensity", ["low"]),
        "patience": trial.suggest_int("patience", 3, 3),
        "max_epochs": trial.suggest_int("max_epochs", 2, 2),
    }


def _is_oom(exc: Exception) -> bool:
    from irp_tpu.utils.errors import is_oom_error

    return is_oom_error(exc)


def objective_kfold(trial: Trial, ctx: HyperoptContext) -> float:
    hp = (ctx.space_fn or suggest_space)(trial)
    k = ctx.hcfg.k_folds
    folds = ctx.folds(k, ctx.hcfg.seed)

    with tracking.start_run(
            run_name=f"optuna_trial_{trial.number}_kfold") as run:
        recipe = {k_: v for k_, v in
                  (("mixup_alpha", ctx.train_base.mixup_alpha),
                   ("cutmix_alpha", ctx.train_base.cutmix_alpha),
                   ("label_smoothing", ctx.train_base.label_smoothing),
                   ("ema_decay", ctx.train_base.ema_decay))
                  if v}  # off-by-default knobs: log only when set
        if ctx.train_base.grad_accum_steps > 1:
            recipe["grad_accum_steps"] = ctx.train_base.grad_accum_steps
        if ctx.train_base.optimizer != "adam":
            recipe["optimizer"] = ctx.train_base.optimizer
        if ctx.train_base.schedule != "onecycle":
            recipe["schedule"] = ctx.train_base.schedule
        # hp AFTER recipe: a searched dimension (e.g. --search-optimizer)
        # must win over the sweep-wide base value in the trial's log —
        # the extra-key overlay below applies hp to the real config too
        run.log_params({**recipe, **hp, "k_folds": k})

        fold_accuracies: List[float] = []
        epoch_accuracies: Dict[int, List[float]] = {}

        use_pool = ctx.mode == "hbm" and ctx.reuse_hbm_pool
        if use_pool:
            from irp_tpu.parallel.mesh import make_mesh

            mesh = ctx.mesh or make_mesh()
        else:
            mesh = ctx.mesh

        for fold_idx in range(k):
            val_shards = folds[fold_idx]
            train_shards = [s for i in range(k) if i != fold_idx
                            for s in folds[i]]
            hbm_view = None
            if use_pool:
                # pixels come from the sweep-wide device-resident pool
                # (one upload per sweep); the host subset is metadata-only
                try:
                    hbm_view = ctx.hbm_pool(mesh).select_fold(train_shards)
                except ValueError as e:
                    # tiny/imbalanced-data edge: some device holds ZERO
                    # samples of this fold (pipeline.py select_fold) —
                    # same class of edge as the local_count < bl guard
                    # below; fall back to the per-fit upload (which
                    # wrap-pads) for THIS fold, keep the pool for others.
                    # Loud: the pool stays resident while this fold also
                    # uploads per-fit, and a swallowed unrelated
                    # ValueError must stay diagnosable.
                    import warnings

                    warnings.warn(
                        f"HBM fold pool: select_fold failed for fold "
                        f"{fold_idx} ({e}); falling back to the per-fit "
                        f"upload for this fold", stacklevel=2)
                    hbm_view = None
                except Exception as e:  # noqa: BLE001
                    if not _is_oom(e):
                        raise
                    # the FULL cache doesn't fit (the legacy path uploads
                    # only the (k-1)/k fold subset, which may still fit):
                    # disable the pool for the rest of this sweep and fall
                    # back to per-fit uploads instead of failing every
                    # trial at a point outside fit()'s OOM->-inf guard
                    ctx.reuse_hbm_pool = False
                    use_pool = False
                    ctx.release_hbm_pool()
                if hbm_view is not None:
                    bl = hp["batch_size"] // hbm_view.data_axis_size
                    if hbm_view.local_count < bl:
                        # tiny-data edge: the fold's per-device prefix
                        # (min over devices, no padding) can't fit one
                        # window; legacy HBMDataset wrap-pads, so fall
                        # back to the per-fit upload — cheap at exactly
                        # the scales where this triggers
                        hbm_view = None
            if hbm_view is not None:
                train_cached = ctx.cached.subset_by_shards(
                    train_shards, with_images=False)
            else:
                train_cached = ctx.cached.subset_by_shards(train_shards)
            val_cached = ctx.cached.subset_by_shards(val_shards)

            # dataclasses.replace keeps every model_base field (incl. any
            # added later, e.g. fused_frozen_blocks) instead of a lossy
            # field-by-field reconstruction.
            model_cfg = dataclasses.replace(
                ctx.model_base,
                num_classes=ctx.info.num_classes,
                dropout_rate=hp["dropout_rate"])
            # dataclasses.replace over ctx.train_base for the same
            # reason: recipe fields outside the search space (mixing,
            # label smoothing, ...) ride through untouched.
            train_cfg = dataclasses.replace(
                ctx.train_base,
                learning_rate=hp["learning_rate"],
                weight_decay=hp["weight_decay"],
                batch_size=hp["batch_size"],
                max_epochs=hp["max_epochs"],
                patience=hp["patience"],
                aug_intensity=hp["augmentation_intensity"],
                train_samples_per_epoch=ctx.train_samples_per_epoch,
                eval_samples=ctx.eval_samples,
                seed=ctx.hcfg.seed)
            # Any EXTRA search dimension whose name is a TrainConfig
            # field (optimizer, schedule, ema_decay, mixup_alpha, ...)
            # flows straight into the trial's config — a custom space_fn
            # can search any recipe knob just by suggesting it.  The
            # reference-space keys above stay authoritative.
            extra = {k: v for k, v in hp.items()
                     if k not in _REFERENCE_SPACE_KEYS
                     and k in _TRAIN_FIELD_NAMES}
            if extra:
                train_cfg = dataclasses.replace(train_cfg, **extra)

            def on_epoch_end(epoch, val_acc, _fold=fold_idx):
                epoch_accuracies.setdefault(epoch, []).append(val_acc)
                if _fold == 0:
                    # tier-1: epoch-level median pruning on fold 0
                    trial.report(val_acc, epoch)
                    if trial.should_prune():
                        raise TrialPruned(
                            f"epoch {epoch + 1}: val_acc {val_acc:.2f}%")
                return False

            # Pre-attempt lengths so a pool-OOM retry can drop this
            # fold's partial epoch contributions (rare: OOM normally
            # fires at compile/first step, before any epoch completes).
            pre_lens = {ep: len(v) for ep, v in epoch_accuracies.items()}
            try:
                result = fit(train_cached, val_cached, ctx.info, model_cfg,
                             train_cfg, mesh=mesh, logger=run,
                             on_epoch_end=on_epoch_end, mode=ctx.mode,
                             verbose=ctx.verbose, hbm_train=hbm_view)
            except TrialPruned:
                raise
            except Exception as e:  # noqa: BLE001 — OOM -> -inf like ref
                if not _is_oom(e):
                    raise
                if not use_pool:
                    return float("-inf")
                # The sweep-wide pool (the FULL cache, device-resident) is
                # the most likely memory hog when fit() itself OOMs:
                # pool + eval set + params/moments/activations can exceed
                # HBM even though the pool alone fit at build time.
                # Scoring -inf here would repeat identically for EVERY
                # trial while the legacy path — only (k-1)/k of the
                # dataset resident — might complete them all.  Release
                # the pool sweep-wide and retry this fold once.
                import warnings

                warnings.warn(
                    f"fit() OOMed with the HBM fold pool resident ({e}); "
                    "releasing the pool for the rest of the sweep and "
                    "retrying this fold via the per-fit upload",
                    stacklevel=2)
                ctx.reuse_hbm_pool = False
                use_pool = False
                ctx.release_hbm_pool()
                hbm_view = None
                train_cached = ctx.cached.subset_by_shards(train_shards)
                for ep, v in epoch_accuracies.items():
                    del v[pre_lens.get(ep, 0):]
                try:
                    result = fit(train_cached, val_cached, ctx.info,
                                 model_cfg, train_cfg, mesh=mesh,
                                 logger=run, on_epoch_end=on_epoch_end,
                                 mode=ctx.mode, verbose=ctx.verbose,
                                 hbm_train=None)
                except TrialPruned:
                    raise
                except Exception as e2:  # noqa: BLE001
                    if _is_oom(e2):
                        return float("-inf")
                    raise
            best_val_acc = result.best_val_acc

            fold_accuracies.append(best_val_acc)
            if fold_idx == 0:
                # tier-2: first-fold accuracy floor
                if best_val_acc < ctx.hcfg.first_fold_min_acc:
                    run.log_params({"pruned_first_fold": True})
                    run.log_metrics({"first_fold_acc": best_val_acc})
                    raise TrialPruned(
                        f"first fold best {best_val_acc:.2f}% < "
                        f"{ctx.hcfg.first_fold_min_acc:.2f}%")
            else:
                avg = sum(fold_accuracies) / len(fold_accuracies)
                run.log_metrics(
                    {f"avg_acc_after_{fold_idx + 1}_folds": avg})
                completed = [t.value for t in trial.study.get_trials()
                             if t.state == "COMPLETE"
                             and t.value is not None]
                if len(completed) >= ctx.hcfg.progressive_min_trials:
                    median = float(np.median(completed))
                    # tier-3: progressive below-85%-of-median
                    if avg < median * ctx.hcfg.progressive_factor:
                        run.log_params({"pruned_progressive": True,
                                        "pruned_after_fold": fold_idx + 1})
                        run.log_metrics({"avg_acc_at_pruning": avg,
                                         "median_value_at_pruning": median})
                        raise TrialPruned(
                            f"fold {fold_idx + 1}: avg {avg:.2f}% below "
                            f"85% of median {median:.2f}%")

        # per-epoch cross-fold aggregation (epochs seen by ALL k folds)
        epoch_avg, epoch_std = {}, {}
        for epoch, accs in epoch_accuracies.items():
            if len(accs) == k:
                epoch_avg[epoch] = float(np.mean(accs))
                run.log_metrics({"epoch_avg_val_acc": epoch_avg[epoch]},
                                step=epoch)
                if k > 1:
                    epoch_std[epoch] = float(np.std(accs))
                    run.log_metrics({"epoch_std_val_acc": epoch_std[epoch]},
                                    step=epoch)

        if not epoch_avg:
            return float("-inf")

        best_epoch = max(epoch_avg, key=epoch_avg.get)
        best_avg = epoch_avg[best_epoch]
        run.log_metrics({"best_avg_epoch": best_epoch,
                         "best_avg_val_acc": best_avg})
        run.log_params({"recommended_epochs": best_epoch + 1})

        trial.set_user_attr("tracking_run_id", run.info.run_id)

        if best_epoch in epoch_std:
            t_crit = stats.t.ppf(ctx.hcfg.confidence, df=k - 1)
            lower = best_avg - t_crit * epoch_std[best_epoch] / math.sqrt(k)
            run.log_metrics({"best_std_val_acc": epoch_std[best_epoch],
                             "lower_confidence_bound": lower})
            return float(lower)
        return float(best_avg)

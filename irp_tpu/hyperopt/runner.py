"""Study runner: create/resume the study and drive the sweep.

Mirrors ``run_kfold_optuna_optimization`` (reference functions/
hyperopt.py:386-495): TPESampler(seed) + MedianPruner(20, 10, 1), SQLite
storage with load_if_exists resume + progress printout, completion
callback, and the end-of-sweep summary.
"""

from __future__ import annotations

from typing import Optional

from irp_tpu.hyperopt.objective import HyperoptContext, objective_kfold
from irp_tpu.hyperopt.pruners import (MedianPruner, NopPruner,
                                      SuccessiveHalvingPruner)
from irp_tpu.hyperopt.samplers import TPESampler
from irp_tpu.hyperopt.study import Study, TrialState, create_study


def run_kfold_optimization(ctx: HyperoptContext,
                           n_trials: Optional[int] = None,
                           verbose: bool = True,
                           parallel_workers: Optional[int] = None,
                           devices_per_trial: int = 1) -> Study:
    """Drive the sweep.  With ``parallel_workers`` set, trials are
    scheduled concurrently across per-worker TPU sub-meshes
    (irp_tpu.hyperopt.parallel) instead of the reference's sequential
    in-process loop (reference hyperopt.py:476)."""
    hcfg = ctx.hcfg
    n_trials = n_trials if n_trials is not None else hcfg.n_trials

    kind = getattr(hcfg, "pruner", "median")
    if kind == "asha":
        pruner = SuccessiveHalvingPruner(
            min_resource=hcfg.asha_min_resource,
            reduction_factor=hcfg.asha_reduction_factor)
    elif kind == "none":
        pruner = NopPruner()
    elif kind == "median":
        pruner = MedianPruner(n_startup_trials=hcfg.median_startup_trials,
                              n_warmup_steps=hcfg.median_warmup_steps,
                              interval_steps=1)
    else:
        raise ValueError(f"unknown pruner {kind!r} "
                         "(one of 'median', 'asha', 'none')")
    study = create_study(study_name=hcfg.study_name,
                         storage=f"sqlite:///{hcfg.storage}",
                         sampler=TPESampler(seed=hcfg.seed),
                         pruner=pruner,
                         direction="maximize",
                         load_if_exists=True)

    prior = study.get_trials()
    if prior and verbose:
        print(f"Loaded existing study with {len(prior)} previous trials.")
        try:
            print(f"Best value so far: {study.best_value:.2f} "
                  f"(t-dist lower bound); params:")
            for k, v in study.best_params.items():
                print(f"  {k}: {v}")
        except ValueError:
            pass

    def progress_callback(study, frozen):
        if frozen.state == TrialState.COMPLETE:
            print(f"Trial {frozen.number} completed with value: "
                  f"{frozen.value:.2f}")
        elif frozen.state == TrialState.PRUNED:
            print(f"Trial {frozen.number} pruned at step {frozen.last_step}")

    if parallel_workers and parallel_workers > 1:
        import dataclasses

        from irp_tpu.hyperopt.parallel import run_parallel_trials

        # one context per worker sub-mesh (they're created once), NOT per
        # trial: dataclasses.replace re-runs __post_init__'s per-shard
        # histogram scan and would empty the fold cache every trial
        mesh_ctxs = {}

        def objective_for_mesh(trial, mesh):
            mesh_ctx = mesh_ctxs.get(id(mesh))
            if mesh_ctx is None:
                mesh_ctx = dataclasses.replace(ctx, mesh=mesh)
                mesh_ctx._fold_cache = ctx._fold_cache  # share fold memo
                mesh_ctxs[id(mesh)] = mesh_ctx
            return objective_kfold(trial, mesh_ctx)

        try:
            run_parallel_trials(study, objective_for_mesh, n_trials,
                                devices_per_trial=devices_per_trial,
                                max_workers=parallel_workers,
                                verbose=verbose)
        finally:
            # free every worker's device-resident fold pool: the caller's
            # next stage (final full training) uploads its own HBMDataset
            # of the same images.  Aggregate the per-worker pool stats
            # onto the CALLER's ctx — that is the object reporting code
            # holds (the per-mesh replicas are internal to this runner).
            for mctx in mesh_ctxs.values():
                mctx.release_hbm_pool()
            worker_stats = [m.hbm_pool_stats for m in mesh_ctxs.values()
                            if m.hbm_pool_stats is not None]
            if worker_stats and ctx.hbm_pool_stats is None:
                ctx.hbm_pool_stats = {
                    "upload_bytes": sum(s["upload_bytes"]
                                        for s in worker_stats),
                    "last_dropped": max(s["last_dropped"]
                                        for s in worker_stats),
                    "n_worker_pools": len(worker_stats),
                }
    else:
        try:
            study.optimize(lambda t: objective_kfold(t, ctx), n_trials,
                           callbacks=([progress_callback] if verbose
                                      else None),
                           verbose=verbose)
        finally:
            ctx.release_hbm_pool()

    if verbose:
        trials = study.get_trials()
        pruned = [t for t in trials if t.state == TrialState.PRUNED]
        print("\nK-Fold Study statistics:")
        print(f"  Number of finished trials: {len(trials)}")
        print(f"  Number of pruned trials: {len(pruned)}")
        try:
            best = study.best_trial
            print("  Best trial:")
            print(f"    Value: {best.value:.2f} (t-dist lower bound)")
            for k, v in best.params.items():
                print(f"      {k}: {v}")
        except ValueError:
            print("  No completed trials yet.")
    return study

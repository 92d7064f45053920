#!/usr/bin/env python
"""Full-scale dress rehearsal on real hardware (VERDICT r2 next-round #3).

Proves the system at production scale — the closest possible stand-in for
the blocked >=95% Animals-10 run (reference README.md:131; this
environment has zero egress, so no Kaggle data / pretrained weights):
an Animals-10-SCALE synthetic corpus (default 26,000 x 256^2 — the ~5 GB
HBM-residency claim, README.md:20-22) of HARD flip-invariant plaid
classes (identical color statistics, tests/synth.py:make_hard_image) is
pushed through the complete reference workflow:

  shards -> analysis -> decode cache -> bounded k-fold TPE sweep
  (parallel scheduling on) -> final full training (recommended epochs)
  -> full-test eval

with wall-clock per stage, host->HBM upload throughput, and peak device
HBM recorded.  Writes <work-dir>/rehearsal_summary.json and prints a
stage table; exit 0 iff final full-test top-1 >= --acc-bar.

The sweep uses a from-scratch space (no pretrained weights exist here):
the reference's 7-dim space shape with batch sizes/LRs suited to
training from random init.  BN protocol: --bn-stats-mode, default
'trainable_only' is N/A from scratch (nothing frozen when
--trainable-stages all) — the backbone is fully trainable, so both
modes coincide on trained stages.

Usage:
  python examples/dress_rehearsal.py --work-dir /tmp/rehearsal      # full 26k
  python examples/dress_rehearsal.py --tiny --cpu                   # smoke
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))


def rehearsal_space(trial):
    """From-scratch variant of the reference 7-dim space
    (hyperopt.py:45-51 shape): larger batches and LRs — there are no
    pretrained weights in this environment to fine-tune gently."""
    return {
        "learning_rate": trial.suggest_float("learning_rate", 5e-4, 1e-2,
                                             log=True),
        "batch_size": trial.suggest_categorical("batch_size", [128, 256]),
        "weight_decay": trial.suggest_float("weight_decay", 1e-6, 1e-3,
                                            log=True),
        "dropout_rate": trial.suggest_float("dropout_rate", 0.0, 0.4),
        "augmentation_intensity": trial.suggest_categorical(
            "augmentation_intensity", ["low", "medium"]),
        "patience": trial.suggest_int("patience", 4, 6),
        "max_epochs": trial.suggest_int("max_epochs", 10, 20),
    }


def tiny_space(trial):
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
        "max_epochs": trial.suggest_int("max_epochs", 3, 3),
    }


def _peak_hbm_gb():
    """Max peak_bytes_in_use over devices, in GB (None if backend hides
    memory stats — the axon tunnel sometimes does)."""
    from irp_tpu.utils.monitor import device_memory_stats

    peaks = [s.get("peak_gb_in_use") for s in device_memory_stats().values()]
    peaks = [p for p in peaks if p is not None]
    return round(max(peaks), 2) if peaks else None


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--work-dir", default="./rehearsal")
    p.add_argument("--classes", type=int, default=10)
    p.add_argument("--per-class", type=int, default=2600,
                   help="images per class INCLUDING the test split "
                        "(default 2600 x 10 = 26,000 ~ Animals-10)")
    p.add_argument("--test-frac", type=float, default=0.2)
    p.add_argument("--cache-size", type=int, default=256,
                   help="decode-cache resolution (256 = the ~5 GB HBM "
                        "residency point at 26k images)")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--depth", type=int, default=18,
                   help="from-scratch rehearsal default: ResNet18 (the "
                        "proven hard-synthetic convergence config)")
    p.add_argument("--trials", type=int, default=12)
    p.add_argument("--k-folds", type=int, default=3)
    p.add_argument("--parallel-workers", type=int, default=None,
                   help="parallel trial scheduling; default = one worker "
                        "per device when >1 device is visible, else the "
                        "sequential loop (identical semantics on one "
                        "chip)")
    p.add_argument("--samples-per-shard", type=int, default=1000)
    p.add_argument("--acc-bar", type=float, default=95.0)
    p.add_argument("--bn-stats-mode", choices=("all", "trainable_only"),
                   default="trainable_only")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="smoke scale: 4 classes x 90 imgs, 64px cache, "
                        "2 trials, 56px model, no acc bar")
    p.add_argument("--resume", action="store_true",
                   help="resume the final stage from its latest "
                        "checkpoint (sweep resumes automatically via "
                        "SQLite load_if_exists)")
    args = p.parse_args(argv)

    if args.tiny:
        args.classes, args.per_class = 4, 90
        args.cache_size, args.image_size = 80, 56
        args.trials, args.k_folds = 2, 2
        args.samples_per_shard = 48  # k-fold splits are SHARD-level
        args.acc_bar = 0.0
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from irp_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    from synth import make_synthetic_shards

    from irp_tpu import tracking
    from irp_tpu.config import HyperoptConfig, ModelConfig
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    from irp_tpu.hyperopt.objective import HyperoptContext
    from irp_tpu.hyperopt.runner import run_kfold_optimization
    from irp_tpu.train.final import train_final_model

    os.makedirs(args.work_dir, exist_ok=True)
    tracking.set_tracking_uri(os.path.join(args.work_dir, "mlruns"))
    tracking.set_experiment("dress_rehearsal")
    stages = {}  # name -> seconds
    extras = {}

    def stage(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                print(f"== stage: {name} ==", flush=True)
                return self

            def __exit__(self, *exc):
                stages[name] = round(time.perf_counter() - self.t0, 1)
                print(f"== stage {name} done in {stages[name]}s ==",
                      flush=True)

        return _T()

    # ---- A. corpus ------------------------------------------------------
    shard_dir = os.path.join(args.work_dir, "shards")
    n_test_pc = max(int(args.per_class * args.test_frac), 1)
    n_train_pc = args.per_class - n_test_pc
    corpus_marker = os.path.join(shard_dir, "corpus.complete")
    # the marker records the scale the corpus was generated at: a work
    # dir reused across --tiny/full runs must regenerate, never silently
    # train the "full-scale" rehearsal on a stale tiny corpus
    corpus_spec = json.dumps({
        "classes": args.classes, "train_pc": n_train_pc,
        "test_pc": n_test_pc, "samples_per_shard": args.samples_per_shard,
        "cache_size": args.cache_size}, sort_keys=True)
    with stage("corpus"):
        # a bare train-*.tar glob is NOT proof of a complete corpus: a run
        # killed mid-generation leaves train shards but no test shards (or
        # a truncated last tar) — only trust the end-of-generation marker,
        # and wipe any partial dir before regenerating
        existing = None
        if os.path.exists(corpus_marker):
            with open(corpus_marker) as f:
                existing = f.read().strip()
        if existing == corpus_spec:
            print("corpus exists at this scale, skipping generation")
        else:
            if existing is not None:
                print(f"corpus marker mismatch (found {existing!r}), "
                      "regenerating")
            if os.path.isdir(shard_dir):
                import shutil

                shutil.rmtree(shard_dir)
            make_synthetic_shards(
                shard_dir, num_classes=args.classes, per_class=n_train_pc,
                samples_per_shard=args.samples_per_shard, seed=0,
                size=args.cache_size, prefix="train", hard=True)
            make_synthetic_shards(
                shard_dir, num_classes=args.classes, per_class=n_test_pc,
                samples_per_shard=args.samples_per_shard, seed=1,
                size=args.cache_size, prefix="test", hard=True)
            with open(corpus_marker, "w") as f:
                f.write(corpus_spec + "\n")
    train_shards = sorted(glob.glob(os.path.join(shard_dir, "train-*.tar")))
    test_shards = sorted(glob.glob(os.path.join(shard_dir, "test-*.tar")))

    # ---- B. shard analysis ---------------------------------------------
    with stage("analysis"):
        info = analyze_webdataset(train_shards, verbose=True)

    # ---- C. decode cache (native decoder when available) ---------------
    cache_dir = os.path.join(args.work_dir, "cache")
    with stage("cache_build"):
        train_cached = build_cache(train_shards, info.class_names,
                                   cache_dir=cache_dir,
                                   size=args.cache_size)
        test_cached = build_cache(test_shards, info.class_names,
                                  cache_dir=cache_dir, size=args.cache_size)
    n_imgs = len(train_cached) + len(test_cached)
    # on --resume the caches load instantly (rounds to 0.0s): the rate is
    # only meaningful when this run actually decoded the corpus
    extras["cache_imgs_per_sec_host"] = (
        round(n_imgs / stages["cache_build"], 1)
        if stages["cache_build"] > 0 else None)
    extras["dataset_gb"] = round(
        (train_cached.images.nbytes + test_cached.images.nbytes) / 1024 ** 3,
        2)

    # ---- C2. HBM upload throughput (the 5 GB residency claim) ----------
    import jax
    import jax.numpy as jnp

    from irp_tpu.data.pipeline import HBMDataset
    from irp_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    with stage("hbm_upload"):
        hbm = HBMDataset(train_cached, mesh)
        # hard sync: read one scalar back through the tunnel
        float(jnp.asarray(hbm.labels).reshape(-1)[0])
    extras["hbm_upload_gbps"] = round(
        train_cached.images.nbytes / 1024 ** 3 /
        max(stages["hbm_upload"], 1e-9), 2)
    extras["peak_hbm_gb_after_upload"] = _peak_hbm_gb()
    del hbm  # trials manage their own uploads

    # ---- D. bounded sweep (parallel scheduling on) ---------------------
    model_base = ModelConfig(
        depth=args.depth, num_classes=info.num_classes,
        image_size=args.image_size, bn_stats_mode=args.bn_stats_mode,
        trainable_stages=("layer1", "layer2", "layer3", "layer4"),
        head_only=False)
    hcfg = HyperoptConfig(
        n_trials=args.trials, k_folds=args.k_folds,
        first_fold_min_acc=0.0,  # from-scratch capped-epoch trials score
        # on relative rank; the reference's 95% tier-2 floor presumes
        # pretrained init (hyperopt.py:236-247)
        storage=os.path.join(args.work_dir, "rehearsal_study.db"))
    ctx = HyperoptContext(
        cached=train_cached, info=info, hcfg=hcfg, model_base=model_base,
        space_fn=tiny_space if args.tiny else rehearsal_space)
    workers = args.parallel_workers
    if workers is None and len(jax.devices()) > 1:
        workers = len(jax.devices())  # parallel scheduling on by default
    extras["parallel_workers"] = workers or 1
    # top up to --trials TOTAL (not +--trials more): a killed run's study
    # persists in SQLite, so a re-run only owes the remainder
    existing = len(run_kfold_optimization(ctx, n_trials=0,
                                          verbose=False).get_trials())
    remaining = max(args.trials - existing, 0)
    if existing:
        print(f"study has {existing} trials; running {remaining} more")
    with stage("sweep"):
        study = run_kfold_optimization(
            ctx, n_trials=remaining, verbose=True,
            parallel_workers=workers)
    try:
        extras["sweep_best_val_acc"] = round(study.best_value, 2)
    except ValueError:
        # every trial pruned/failed (OOM maps to -inf, which best_value
        # excludes): keep going so the summary is still written and the
        # graceful no-trials path in train_final_model reports cleanly
        extras["sweep_best_val_acc"] = None
    extras["sweep_trials"] = len(study.get_trials())
    if ctx.hbm_pool_stats is not None:
        # the sweep's entire train-pixel upload: ONE pool residency
        # (HBMFoldPool, released by the runner before the final stage)
        # instead of k*trials fold re-uploads
        extras["sweep_pool_upload_gb"] = round(
            ctx.hbm_pool_stats["upload_bytes"] / 1024 ** 3, 2)

    # ---- E. final full training ----------------------------------------
    with stage("final_train"):
        result = train_final_model(
            study, train_cached, test_cached, info, model_base=model_base,
            experiment="dress_rehearsal",
            checkpoint_dir=os.path.join(args.work_dir, "checkpoints"),
            resume=args.resume)
    if result is None:
        print("final training failed (no completed trials)")
        return 1
    extras["peak_hbm_gb_after_final"] = _peak_hbm_gb()
    extras["final_test_acc"] = round(result.test_acc, 2)
    extras["n_train"] = len(train_cached)
    extras["n_test"] = len(test_cached)
    extras["backend"] = jax.default_backend()
    extras["n_devices"] = len(jax.devices())
    extras["depth"] = args.depth
    extras["bn_stats_mode"] = args.bn_stats_mode

    # ---- summary --------------------------------------------------------
    summary = {"stages_secs": stages, **extras,
               "total_secs": round(sum(stages.values()), 1),
               "acc_bar": args.acc_bar,
               "bar_met": bool(result.test_acc >= args.acc_bar)}
    out = os.path.join(args.work_dir, "rehearsal_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print("\n==== DRESS REHEARSAL SUMMARY ====")
    for k, v in stages.items():
        print(f"  {k:>12}: {v:9.1f}s")
    for k, v in extras.items():
        print(f"  {k}: {v}")
    print(f"  full-test top-1: {result.test_acc:.2f}% "
          f"(bar {args.acc_bar}%: {'MET' if summary['bar_met'] else 'NOT MET'})")
    print(f"  summary -> {out}")
    print(json.dumps(summary))
    return 0 if summary["bar_met"] else 3


if __name__ == "__main__":
    raise SystemExit(main())

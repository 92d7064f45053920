#!/usr/bin/env python
"""Turnkey Animals-10 pipeline: curation -> sweep -> final -> accuracy.

The moment the Kaggle Animals-10 dataset and the torchvision ResNet50
IMAGENET1K_V2 checkpoint exist on disk, this script reproduces the
reference's complete workflow (reference main.ipynb per SURVEY §3.4 +
run_hyperopt.py + functions/final.py) with ZERO code changes and reports
full-test top-1 against the >=95% bar (reference README.md:131).

Asset discovery (flags beat env vars beat defaults):
  dataset  --kaggle-path | $IRP_ANIMALS10_DIR | ./assets/animals10
           (the Kaggle layout: <root>/raw-img/<italian class dirs>)
  weights  --pretrained  | $IRP_RESNET50_WEIGHTS | ./assets/resnet50*.pth
           (a torch state_dict; convert path: irp_tpu.models.convert)

Stages:
  1. ingest + analyze + clean      (golden-format reports written)
  2. optional outlier removal      (--outliers: PCA->UMAP->LOF on TPU)
  3. 224x224 WebDataset shards     (balanced test split)
  4. decode cache + shard analysis (frequency-ordered label map)
  5. k-fold TPE sweep              (SQLite-resumable; --n-trials)
  6. final full training           (recommended_epochs from the study)
  7. full test eval                (per-class P/R/F1, confusion matrix)

Accuracy-run protocol: frozen-stage BatchNorm semantics are pinned
explicitly via --bn-stats-mode (default 'all' = reference torch .train()
parity, kept until >=95% is demonstrated once; 'trainable_only' is the
~28%-faster inference-form alternative) and logged to tracking by the
final stage so every accuracy number is attributable to its BN mode.

Usage:
  python examples/train_animals10.py                # quick 20-trial sweep
  python examples/train_animals10.py --full         # reference 200x3 sweep
  python examples/train_animals10.py --from-scratch # no pretrained weights
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def find_dataset(arg):
    for cand in ([arg] if arg else []) + [
            os.environ.get("IRP_ANIMALS10_DIR"), "./assets/animals10"]:
        if cand and os.path.isdir(os.path.join(cand, "raw-img")):
            return cand
        if cand and os.path.isdir(cand) and any(
                os.path.isdir(os.path.join(cand, d))
                for d in ("cane", "dog")):
            return cand  # already-extracted class dirs
    return None


def find_weights(arg):
    cands = ([arg] if arg else []) + [os.environ.get("IRP_RESNET50_WEIGHTS")]
    cands += sorted(glob.glob("./assets/resnet50*.pth"))
    for c in cands:
        if c and os.path.isfile(c):
            return c
    return None


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--kaggle-path", default=None)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--work-dir", default="./data")
    p.add_argument("--n-trials", type=int, default=20)
    p.add_argument("--k-folds", type=int, default=3)
    p.add_argument("--full", action="store_true",
                   help="reference-scale sweep: 200 trials x 3 folds")
    p.add_argument("--from-scratch", action="store_true",
                   help="proceed without pretrained weights (the >=95% "
                        "bar is NOT expected to be reachable)")
    p.add_argument("--outliers", action="store_true",
                   help="embedding-based outlier removal before sharding")
    p.add_argument("--parallel-workers", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--depth", type=int, default=50,
                   help="ResNet depth (tests use 18 on tiny images)")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--quick", action="store_true",
                   help="tiny smoke-test search space (2-epoch trials)")
    p.add_argument("--samples-per-shard", type=int, default=1000,
                   help="shard size (k-fold splits are shard-level; keep "
                        ">> k shards)")
    p.add_argument("--bn-stats-mode", choices=("all", "trainable_only"),
                   default="all",
                   help="frozen-stage BatchNorm semantics for the sweep "
                        "and the final/accuracy run.  'all' = reference "
                        "torch .train() parity (default until >=95% is "
                        "demonstrated once); 'trainable_only' = "
                        "inference-form frozen BN, ~28%% faster "
                        "(BENCH.md) but numerically different training "
                        "trajectories")
    from irp_tpu.cli.model_args import add_train_recipe_args
    add_train_recipe_args(p)
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the trainable-stage blocks: "
                        "backward recomputes activations instead of "
                        "holding them in HBM — headroom for bigger "
                        "batches / deeper variants at ~1/3 extra "
                        "trainable-stage FLOPs (numerics unchanged)")
    args = p.parse_args(argv)

    from irp_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    dataset = find_dataset(args.kaggle_path)
    weights = find_weights(args.pretrained)
    if dataset is None:
        print("Animals-10 dataset not found.  Provide it via --kaggle-path,"
              "\n$IRP_ANIMALS10_DIR, or ./assets/animals10 (the Kaggle"
              "\n'alessiocorrado99/animals10' archive: raw-img/<class>/...)."
              "\nNothing else is needed — rerun and the full pipeline runs.",
              file=sys.stderr)
        return 2
    if weights is None and not args.from_scratch:
        print("Pretrained ResNet50 weights not found (torchvision"
              "\nIMAGENET1K_V2 state_dict as .pth).  Provide via"
              "\n--pretrained, $IRP_RESNET50_WEIGHTS, or"
              "\n./assets/resnet50*.pth — or pass --from-scratch to train"
              "\nwithout them (>=95% top-1 needs the pretrained backbone).",
              file=sys.stderr)
        return 2

    import run_curation

    wds_dir = os.path.join(args.work_dir, "webdataset")
    if not glob.glob(os.path.join(wds_dir, "train-*.tar")):
        cur_args = ["--kaggle-path", dataset, "--work-dir", args.work_dir,
                    "--target-size", str(max(args.image_size, 224)),
                    "--samples-per-shard", str(args.samples_per_shard)]
        if args.outliers:
            cur_args += ["--outliers"]
            if weights:
                cur_args += ["--pretrained", weights]
        rc = run_curation.main(cur_args)
        if rc:
            return rc
    else:
        print(f"Reusing existing shards in {wds_dir}")
        if args.outliers:
            print("WARNING: --outliers has no effect on already-built "
                  "shards; delete the webdataset/ dir (or use a fresh "
                  "--work-dir) to re-curate with outlier removal",
                  file=sys.stderr)

    from irp_tpu import tracking
    from irp_tpu.config import HyperoptConfig, ModelConfig
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    from irp_tpu.hyperopt.objective import HyperoptContext
    from irp_tpu.hyperopt.runner import run_kfold_optimization
    from irp_tpu.train.final import train_final_model

    tracking.set_experiment("animals10")
    train_shards = sorted(glob.glob(os.path.join(wds_dir, "train-*.tar")))
    test_shards = sorted(glob.glob(os.path.join(wds_dir, "test-*.tar")))
    info = analyze_webdataset(train_shards, verbose=True)
    cache_dir = os.path.join(args.work_dir, "cache")
    train_cached = build_cache(train_shards, info.class_names,
                               cache_dir=cache_dir)
    test_cached = build_cache(test_shards, info.class_names,
                              cache_dir=cache_dir)

    n_trials = 200 if args.full else args.n_trials
    hcfg = HyperoptConfig(
        n_trials=n_trials, k_folds=args.k_folds,
        # --quick drops the reference's tier-2 first-fold 95% floor
        # (hyperopt.py:236-247) so smoke runs can complete a trial
        first_fold_min_acc=0.0 if args.quick else 95.0,
        storage=os.path.join(args.work_dir, "optuna_animals10_kfold.db"))
    # Accuracy-run protocol: BN mode is pinned EXPLICITLY (never the
    # package default) and flows into sweep + final stages; final.py logs
    # it to tracking so any accuracy number is attributable to its mode.
    model_base = ModelConfig(depth=args.depth,
                             num_classes=info.num_classes,
                             image_size=args.image_size,
                             bn_stats_mode=args.bn_stats_mode,
                             remat_trainable_blocks=args.remat,
                             pretrained_path=weights)

    space_fn = None
    if args.quick:
        from irp_tpu.hyperopt.objective import quick_space
        space_fn = quick_space

    from irp_tpu.cli.model_args import build_train_base
    train_base = build_train_base(args)
    ctx = HyperoptContext(cached=train_cached, info=info, hcfg=hcfg,
                          model_base=model_base, train_base=train_base,
                          space_fn=space_fn)
    study = run_kfold_optimization(
        ctx, n_trials=n_trials, verbose=True,
        parallel_workers=args.parallel_workers)

    result = train_final_model(
        study, train_cached, test_cached, info, model_base=model_base,
        train_base=train_base,
        checkpoint_dir=os.path.join(args.work_dir, "checkpoints"))
    if result is None:
        return 1

    acc = result.test_acc
    bar = 95.0
    status = "MET" if acc >= bar else "NOT MET"
    print(f"\n==== Animals-10 full-test top-1: {acc:.2f}% "
          f"(>=95% bar: {status}) ====")
    if acc >= bar or args.from_scratch or args.quick:
        return 0  # the bar is only expected with pretrained weights
    return 3


if __name__ == "__main__":
    raise SystemExit(main())

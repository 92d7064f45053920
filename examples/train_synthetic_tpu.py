#!/usr/bin/env python
"""End-to-end smoke run on real hardware: fit a classifier on synthetic
class-separable shards and report accuracy.

This is the "minimum end-to-end slice" (SURVEY §7 milestone 5) as a
runnable example: shards -> analyze -> decode cache -> HBM-resident
training with on-device augmentation -> eval.  With real Animals-10 shards
(run_curation.py) and pretrained weights (ModelConfig.pretrained_path) the
same code is the production fine-tune.

  python examples/train_synthetic_tpu.py [--depth 18] [--epochs 3] [--cpu]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--depth", type=int, default=18)
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--per-class", type=int, default=64)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--hard", action="store_true",
                   help="hard orientation-coded classes (identical color "
                        "stats; convergence demo: train a ResNet from "
                        "scratch over many epochs to >95%% val)")
    p.add_argument("--val-per-class", type=int, default=24)
    p.add_argument("--patience", type=int, default=None,
                   help="early-stop patience (default 6; 15 for --hard: "
                        "OneCycle's lr peak lands ~30%% into the run and "
                        "a short patience anchored to a lucky warmup "
                        "epoch stops before the annealing phase where "
                        "from-scratch convergence actually happens)")
    p.add_argument("--lr", type=float, default=3e-3)
    args = p.parse_args(argv)
    if args.patience is None:
        args.patience = 15 if args.hard else 6

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from irp_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from synth import make_synthetic_shards

    from irp_tpu.config import ModelConfig, TrainConfig
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    from irp_tpu.train import fit

    work = tempfile.mkdtemp(prefix="irp_example_")
    meta = make_synthetic_shards(work, num_classes=args.classes,
                                 per_class=args.per_class,
                                 samples_per_shard=200, seed=0,
                                 hard=args.hard)
    info = analyze_webdataset(meta["shards"], verbose=True)
    cached = build_cache(meta["shards"], info.class_names)
    if args.hard:
        # disjoint validation set: real generalization, not memorization
        val_meta = make_synthetic_shards(work, num_classes=args.classes,
                                         per_class=args.val_per_class,
                                         samples_per_shard=200, seed=1,
                                         prefix="val", hard=True)
        val_cached = build_cache(val_meta["shards"], info.class_names)
    else:
        val_cached = cached

    # from-scratch runs train the WHOLE backbone (the reference's frozen
    # prefix only makes sense with pretrained weights)
    stages = ("conv1", "bn1", "layer1", "layer2", "layer3", "layer4") \
        if args.hard else ("layer4",)
    mcfg = ModelConfig(depth=args.depth, num_classes=info.num_classes,
                       image_size=args.image_size, dropout_rate=0.1,
                       trainable_stages=stages)
    tcfg = TrainConfig(learning_rate=args.lr, weight_decay=1e-5,
                       batch_size=args.batch_size, max_epochs=args.epochs,
                       patience=args.patience, aug_intensity="medium",
                       train_samples_per_epoch=None, eval_samples=None,
                       seed=0)
    result = fit(cached, val_cached, info, mcfg, tcfg, mode="hbm",
                 verbose=True)
    epochs_run = len(result.history["train_loss"])
    stopped_early = epochs_run < args.epochs
    print(f"\nBest val accuracy: {result.best_val_acc:.2f}%  "
          f"({epochs_run}/{args.epochs} epochs"
          f"{', early-stopped' if stopped_early else ''})")
    print("train loss: "
          + " ".join(f"{l:.3f}" for l in result.history["train_loss"]))
    print("val acc:    "
          + " ".join(f"{a:.1f}" for a in result.history["val_acc"]))
    bar = 95.0 if args.hard else 90.0
    assert result.best_val_acc > bar, \
        f"expected >{bar}% val accuracy, got {result.best_val_acc:.2f}%"
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

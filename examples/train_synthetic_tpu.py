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
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from synth import make_synthetic_shards

    from irp_tpu.config import ModelConfig, TrainConfig
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    from irp_tpu.train import fit

    work = tempfile.mkdtemp(prefix="irp_example_")
    meta = make_synthetic_shards(work, num_classes=args.classes,
                                 per_class=args.per_class,
                                 samples_per_shard=200, seed=0)
    info = analyze_webdataset(meta["shards"], verbose=True)
    cached = build_cache(meta["shards"], info.class_names)

    mcfg = ModelConfig(depth=args.depth, num_classes=info.num_classes,
                       image_size=args.image_size, dropout_rate=0.1)
    tcfg = TrainConfig(learning_rate=3e-3, weight_decay=1e-5,
                       batch_size=args.batch_size, max_epochs=args.epochs,
                       patience=args.epochs + 1, aug_intensity="medium",
                       train_samples_per_epoch=None, eval_samples=None,
                       seed=0)
    result = fit(cached, cached, info, mcfg, tcfg, mode="hbm", verbose=True)
    print(f"\nBest val accuracy: {result.best_val_acc:.2f}%  "
          f"(loss curve: {['%.3f' % l for l in result.history['train_loss']]})")
    assert result.best_val_acc > 90.0, "synthetic data should be learnable"
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

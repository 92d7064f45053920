#!/usr/bin/env python
"""Eval-output fidelity harness: Flax forward vs the reference's PyTorch
execution of the SAME weights on the SAME images.

The BASELINE.md bar: eval outputs matching the reference within 1e-3.
This tool decodes samples from given shards through the exact reference
eval path (PIL Resize(256,256) at cache build + CenterCrop(224) +
ImageNet normalize), runs them through (a) the Flax classifier in
float32/HIGHEST precision and (b) a torchvision-compatible PyTorch
executor (irp_tpu.models.torch_ref) loaded with identical weights, and
reports max |logit difference| and top-1 agreement.

  python run_fidelity.py --shards './data/webdataset/test-*.tar' \
      [--checkpoint final_model.pth] [--samples 64] [--depth 50] \
      [--family resnet|vit|efficientnet|convnext]

All families run at the 224px eval geometry (the reference contract,
dataload.py:51-57); beyond-reference families check against their
torchvision-layout torch references (irp_tpu.models.torch_ref).
"""

from __future__ import annotations

import argparse
import glob
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--shards", required=True)
    p.add_argument("--checkpoint", default=None,
                   help=".pth state_dict (ours or the reference's); "
                        "random init if omitted")
    p.add_argument("--samples", type=int, default=64)
    from irp_tpu.cli.model_args import add_model_family_args

    add_model_family_args(p)
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--tolerance", type=float, default=1e-3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    from irp_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax
    import jax.numpy as jnp
    import torch

    from irp_tpu.cli.model_args import model_config_for_family
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    from irp_tpu.models import (flax_variables_to_torch_state_dict,
                                init_classifier, load_torch_checkpoint,
                                merge_pretrained)
    from irp_tpu.models.torch_ref import TorchAnimalClassifier
    from irp_tpu.ops.preprocess import eval_preprocess_batch

    shards = sorted(glob.glob(args.shards))
    if not shards:
        print(f"no shards match {args.shards}", file=sys.stderr)
        return 1
    info = analyze_webdataset(shards)
    cached = build_cache(shards, info.class_names)
    n = min(args.samples, len(cached))
    images = np.asarray(cached.images[:n])

    # torch-parity entry point: pin BN to reference .train()/.eval()
    # semantics explicitly rather than inheriting the perf-oriented
    # 'trainable_only' default.  All families use the 224px eval
    # geometry (ViT's pos_embedding requires it; EfficientNet variants
    # accept any size).
    cfg = model_config_for_family(
        args.family, depth=args.depth, vit_variant=args.vit_variant,
        efficientnet_variant=args.efficientnet_variant,
        convnext_variant=args.convnext_variant,
        num_classes=args.num_classes, dropout_rate=0.0,
        compute_dtype="float32", precision="highest",
        bn_stats_mode="all", image_size=224)
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0), 224)
    if args.checkpoint:
        variables = merge_pretrained(
            variables, load_torch_checkpoint(args.checkpoint))

    # Flax eval forward (reference eval path)
    x = eval_preprocess_batch(jnp.asarray(images), dtype=jnp.float32)
    ours = np.asarray(model.apply(variables, x, train=False))

    # Torch execution of the same weights on the same preprocessed pixels
    sd = flax_variables_to_torch_state_dict(variables, depth=args.depth)
    if args.family == "vit":
        from irp_tpu.models.torch_ref import TorchViTClassifier
        from irp_tpu.models.vit import resolve_num_heads

        tmodel = TorchViTClassifier(
            num_classes=args.num_classes, hidden=cfg.hidden_dim,
            patch_size=cfg.patch_size, embed_dim=cfg.embed_dim,
            num_layers=cfg.num_layers, num_heads=resolve_num_heads(cfg),
            mlp_dim=cfg.mlp_dim, image_size=224)
    elif args.family == "efficientnet":
        from irp_tpu.models.torch_ref import TorchEfficientNetClassifier

        tmodel = TorchEfficientNetClassifier(
            num_classes=args.num_classes, hidden=cfg.hidden_dim,
            width_mult=cfg.width_mult, depth_mult=cfg.depth_mult,
            stochastic_depth_prob=cfg.stochastic_depth)
    elif args.family == "convnext":
        from irp_tpu.models.torch_ref import TorchConvNeXtClassifier

        tmodel = TorchConvNeXtClassifier(
            num_classes=args.num_classes, hidden=cfg.hidden_dim,
            dims=tuple(cfg.convnext_dims),
            depths=tuple(cfg.convnext_depths),
            stochastic_depth_prob=cfg.stochastic_depth)
    else:
        tmodel = TorchAnimalClassifier(depth=args.depth,
                                       num_classes=args.num_classes)
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False)
    bad = list(unexpected) + [k for k in missing
                              if "num_batches_tracked" not in k]
    if bad:
        print(f"state_dict mismatch loading the torch reference: {bad}",
              file=sys.stderr)
        return 2
    tmodel.eval()
    with torch.no_grad():
        theirs = tmodel(torch.tensor(np.asarray(x)).permute(0, 3, 1, 2))
        theirs = theirs.numpy()

    diff = np.abs(ours - theirs).max()
    agree = float((ours.argmax(1) == theirs.argmax(1)).mean())
    status = "PASS" if diff < args.tolerance else "FAIL"
    print(f"samples: {n}  max |logit diff|: {diff:.2e}  "
          f"top-1 agreement: {100 * agree:.1f}%  "
          f"tolerance: {args.tolerance:g}  -> {status}")
    return 0 if diff < args.tolerance else 2


if __name__ == "__main__":
    raise SystemExit(main())

"""Shared --family/--depth/--*-variant argparse wiring for the training
CLIs (run_hyperopt.py, run_final.py).

The reference hardcodes ResNet50 (reference functions/model.py:15); here
the backbone family is a flag: ``--family resnet --depth 50`` (default,
reference-parity), ``--family vit --vit-variant b_16`` (torchvision
vision_transformer sizes, models/vit.py VIT_VARIANTS), ``--family
efficientnet --efficientnet-variant b0`` (torchvision efficientnet_b*
sizes, models/efficientnet.py EFFICIENTNET_VARIANTS), or ``--family
convnext --convnext-variant tiny`` (torchvision convnext_* sizes,
models/convnext.py CONVNEXT_VARIANTS).
"""

from __future__ import annotations


def add_model_family_args(parser) -> None:
    parser.add_argument("--family",
                        choices=("resnet", "vit", "efficientnet",
                                 "convnext"),
                        default="resnet",
                        help="backbone family (default: resnet, the "
                             "reference's; 'vit' is the torchvision-"
                             "compatible Vision Transformer; "
                             "'efficientnet' the torchvision B0-B7 "
                             "ladder; 'convnext' the torchvision "
                             "Tiny-Large ladder)")
    parser.add_argument("--depth", type=int, default=50,
                        help="ResNet depth 18/34/50/101/152 "
                             "(--family resnet only)")
    parser.add_argument("--vit-variant", default="b_16",
                        help="torchvision ViT size: b_16/b_32/l_16/l_32/"
                             "h_14 (--family vit only)")
    parser.add_argument("--efficientnet-variant", default="b0",
                        help="torchvision EfficientNet size: b0..b7 "
                             "(--family efficientnet only)")
    parser.add_argument("--convnext-variant", default="tiny",
                        help="torchvision ConvNeXt size: tiny/small/base/"
                             "large (--family convnext only)")


def model_config_for_family(family: str, *, depth: int = 50,
                            vit_variant: str = "b_16",
                            efficientnet_variant: str = "b0",
                            convnext_variant: str = "tiny",
                            **overrides):
    """ModelConfig for a (family, variant) pair — the single construction
    point shared by the training CLIs and the fidelity harness, so a new
    family threads through every entry point at once."""
    from irp_tpu.config import ModelConfig

    if family == "vit":
        from irp_tpu.models.vit import vit_model_config

        return vit_model_config(vit_variant, **overrides)
    if family == "efficientnet":
        from irp_tpu.models.efficientnet import efficientnet_model_config

        return efficientnet_model_config(efficientnet_variant, **overrides)
    if family == "convnext":
        from irp_tpu.models.convnext import convnext_model_config

        return convnext_model_config(convnext_variant, **overrides)
    return ModelConfig(depth=depth, **overrides)


def build_model_base(args, num_classes: int):
    """ModelConfig from parsed family args + dataset class count."""
    return model_config_for_family(
        args.family, depth=args.depth, vit_variant=args.vit_variant,
        efficientnet_variant=args.efficientnet_variant,
        convnext_variant=getattr(args, "convnext_variant", "tiny"),
        num_classes=num_classes, image_size=args.image_size,
        pretrained_path=args.pretrained)


def add_train_recipe_args(parser) -> None:
    """Sweep-wide training-recipe knobs the hyperopt space does NOT
    search (all off by default = reference-parity behavior)."""
    parser.add_argument("--mixup-alpha", type=float, default=0.0,
                        help="Beta(a,a) mixup inside the jitted train "
                             "step (ops/mix.py); 0 = off. Standard for "
                             "the vit/efficientnet families")
    parser.add_argument("--cutmix-alpha", type=float, default=0.0,
                        help="CutMix Beta(a,a); 0 = off. With both "
                             "alphas set, a per-step fair coin picks "
                             "the transform")
    parser.add_argument("--label-smoothing", type=float, default=0.0,
                        help="cross-entropy label smoothing; 0 = off")
    parser.add_argument("--ema-decay", type=float, default=0.0,
                        help="exponential moving average of the weights "
                             "(per-step, inside the compiled train step); "
                             "val/best/returned weights use the EMA tree. "
                             "0 = off; typical 0.999-0.9999")
    parser.add_argument("--optimizer", choices=("adam", "adamw", "sgd"),
                        default="adam",
                        help="optimizer family: 'adam' = torch-Adam "
                             "parity with coupled L2 (the reference's, "
                             "model.py:57-58); 'adamw' = decoupled decay "
                             "(standard for vit/convnext); 'sgd' = "
                             "momentum 0.9. Composes with --schedule; "
                             "lr/wd come from the search")
    parser.add_argument("--schedule",
                        choices=("onecycle", "cosine", "constant"),
                        default="onecycle",
                        help="lr curve: 'onecycle' = the reference's "
                             "OneCycleLR(cos) with warmup leg; 'cosine' "
                             "= plain CosineAnnealingLR decay; "
                             "'constant' = fixed lr")
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="gradient accumulation: run each optimizer "
                             "step as N sequential micro-batches inside "
                             "the compiled step (activation memory scales "
                             "with batch_size/N; the update stays the "
                             "exact full-batch gradient). batch_size must "
                             "be divisible by data_shards*N. 1 = off")


def build_train_base(args):
    """TrainConfig recipe base from parsed args — the searched/best
    hyperparameters are dataclasses.replace'd on top of it downstream
    (hyperopt objective / train_final_model)."""
    from irp_tpu.config import TrainConfig

    return TrainConfig(mixup_alpha=args.mixup_alpha,
                       cutmix_alpha=args.cutmix_alpha,
                       label_smoothing=args.label_smoothing,
                       ema_decay=args.ema_decay,
                       grad_accum_steps=args.grad_accum,
                       optimizer=args.optimizer,
                       schedule=args.schedule)

"""Immutable configuration for the pipeline.

Replaces the reference's mutable module-global config (reference
config.py:8-20, mutated at startup by run_hyperopt.py:16,25-26,37-39) with
frozen dataclasses that are constructed once and threaded explicitly.
``DatasetInfo`` carries what the reference stored in ``config.NUM_CLASSES /
CLASS_NAMES / CLASS_WEIGHTS``.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

# ImageNet normalization constants (reference functions/dataload.py:13-16).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

IMAGE_SIZE = 224  # training/eval resolution (reference dataload.py:23 etc.)
EVAL_RESIZE = 256  # eval path Resize(256,256) (reference dataload.py:52-56)


@dataclasses.dataclass(frozen=True)
class DatasetInfo:
    """Class inventory derived from shards.

    ``class_names`` are ordered by descending frequency — this ordering IS
    the label<->index mapping (reference functions/utility.py:96-106) and
    must be reproduced exactly for output fidelity.  ``class_weights`` are
    inverse-frequency ``n / (k * freq)`` (reference utility.py:107-116).
    """

    num_classes: int
    class_names: tuple
    class_weights: tuple  # float per class, aligned with class_names
    class_counts: tuple  # int per class
    total_samples: int

    @property
    def name_to_index(self) -> Mapping[str, int]:
        return {n: i for i, n in enumerate(self.class_names)}


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Shard paths + input pipeline settings."""

    train_shards: tuple = ()
    test_shards: tuple = ()
    image_size: int = IMAGE_SIZE
    eval_resize: int = EVAL_RESIZE
    shuffle_buffer: int = 1000  # reference hyperopt.py:128 .shuffle(1000)
    samples_per_shard: int = 1000  # reference data_curation.py:973-976
    mean: tuple = IMAGENET_MEAN
    std: tuple = IMAGENET_STD
    # 'hbm' keeps the decoded dataset resident in device memory (TPU-native
    # fast path for datasets that fit); 'stream' double-buffers host->device.
    placement: str = "hbm"
    cache_dir: str | None = None  # decoded uint8 cache (memmap) location


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Flax ResNet + MLP-head classifier.

    Mirrors the reference AnimalClassifier (reference functions/model.py:9-41):
    ResNet50 backbone frozen except ``layer4`` (model.py:17-23), fc replaced
    by a Dropout->Linear(2048,512)->ReLU->Dropout->Linear(512,num_classes)
    head (model.py:30-36).
    """

    # Backbone family: 'resnet' (the reference's family, model.py:15),
    # 'vit' (torchvision-compatible Vision Transformer — beyond-reference
    # breadth; pure-matmul forward, the most MXU-friendly family on TPU),
    # 'efficientnet' (torchvision-compatible EfficientNet B0-B7 —
    # MBConv + squeeze-excitation; named variants in
    # models/efficientnet.py EFFICIENTNET_VARIANTS), or 'convnext'
    # (torchvision-compatible ConvNeXt Tiny-Large — NHWC CNBlocks whose
    # LayerNorm/Dense pairs need none of torchvision's permutes; named
    # variants in models/convnext.py CONVNEXT_VARIANTS).
    family: str = "resnet"
    depth: int = 50  # resnet only: 18/34/50/101/152
    num_classes: int = 10
    image_size: int = 224  # model input resolution (crop target)
    hidden_dim: int = 512
    # ViT family (torchvision vision_transformer parameterization; the
    # defaults are vit_b_16; named variants in models/vit.py VIT_VARIANTS).
    # num_heads=0 means embed_dim // 64 (head_dim 64 — true of vit_b/vit_l)
    # so those architectures stay recoverable from weight trees alone
    # (irp_tpu.infer.infer_model_config); vit_h_14 needs num_heads=16
    # explicitly (head_dim 80 — heads leave no trace in parameter shapes).
    patch_size: int = 16
    embed_dim: int = 768
    num_layers: int = 12
    mlp_dim: int = 3072
    num_heads: int = 0
    # ResNeXt / Wide-ResNet variants (torchvision's parameterization —
    # same state_dict layout, so .pth interchange keeps working):
    # resnext50_32x4d = groups=32, width_per_group=4;
    # wide_resnet50_2 = width_per_group=128.  Bottleneck depths only;
    # the defaults are the plain ResNet.
    groups: int = 1
    width_per_group: int = 64
    # EfficientNet family (torchvision's (width_mult, depth_mult)
    # scaling — b0 = (1.0, 1.0) ... b7 = (2.0, 3.1); use
    # models/efficientnet.py::efficientnet_model_config for named sizes).
    # stochastic_depth is the max per-block drop prob (scaled linearly
    # over block index, torchvision default 0.2); train-time only.
    width_mult: float = 1.0
    depth_mult: float = 1.0
    stochastic_depth: float = 0.2
    # ConvNeXt family (torchvision block_setting parameterization):
    # per-stage channel dims + block depths; the defaults are
    # convnext_tiny (use models/convnext.py::convnext_model_config for
    # named sizes, which also set the variant's stochastic_depth).
    convnext_dims: tuple = (96, 192, 384, 768)
    convnext_depths: tuple = (3, 3, 9, 3)
    dropout_rate: float = 0.3
    # Frozen backbone except these stages.  ResNet stage names are
    # 'layer1'..'layer4' (the default mirrors reference model.py:17-23);
    # ViT stage names are 'block0'..'block{L-1}', 'ln' (the final encoder
    # LayerNorm), and 'embed' (conv_proj + class_token + pos_embedding).
    # EfficientNet stage names are 'stem', 'stage1'..'stage7', and 'top'
    # (the final 1x1 conv); ConvNeXt names are 'stem', 'stage1'..'stage4',
    # and 'ln' (the final post-pool LayerNorm).  For family='vit' the
    # untouched ResNet default ('layer4',) is auto-mapped to the analogous
    # last-block form ('block{L-1}', 'ln') — see
    # vit_default_trainable_stages; for family='efficientnet' it maps to
    # ('stage7', 'top'); for family='convnext' to ('stage4', 'ln').
    trainable_stages: tuple = ("layer4",)
    head_only: bool = False  # freeze everything but the head
    # Frozen-stage BatchNorm mode.  'trainable_only' (default) keeps frozen
    # stages' BN in inference form — running stats in the forward, no stat
    # updates.  This is standard fine-tuning practice AND the dominant perf
    # lever on TPU: inference BN folds into the conv epilogue, removing the
    # batch-stat reductions + re-normalize passes over the frozen prefix's
    # large activation maps (measured 7.2k -> 9.3k imgs/sec/chip, BENCH.md).
    # 'all' reproduces PyTorch .train() semantics on frozen layers (batch
    # stats in the forward, running stats updated — reference model.py:17-23
    # freezes params but BN stays in train mode); use it for torch parity.
    bn_stats_mode: str = "trainable_only"
    compute_dtype: str = "bfloat16"  # MXU-friendly; params stay f32
    # conv/matmul precision: 'default' (fast, bf16-class passes) or
    # 'highest' (full f32 MXU passes — needed for the 1e-3 eval-fidelity bar
    # vs the reference when compute_dtype=float32).
    precision: str = "default"
    # Fused frozen-prefix bottleneck kernel (ops/pallas_resnet.py): 'auto'
    # enables it on TPU backends when eligible (bottleneck depth, inference
    # frozen BN, bf16, default precision), 'on' forces it (interpreter mode
    # off-TPU — slow, tests only), 'off' disables.  Perf-only switch: the
    # parameter tree and numerics class (bf16 conv outputs) are unchanged.
    fused_frozen_blocks: str = "off"
    # jax.checkpoint every trainable-stage block: backward recomputes
    # activations instead of holding them in HBM — trades ~1/3 more
    # trainable-stage FLOPs for memory headroom (bigger batches, deeper
    # variants).  Perf-neutral to numerics and the parameter tree.
    remat_trainable_blocks: bool = False
    pretrained_path: str | None = None  # torch state_dict .pth to convert


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization settings (reference model.py:45-60, train.py:111-189)."""

    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    # Optimizer family (reference model.py:57-58 hardcodes torch Adam over
    # the requires_grad params — 'adam' reproduces it exactly, coupled L2
    # and all).  'adamw' = decoupled weight decay (torch AdamW semantics;
    # the standard choice for the vit/convnext families), 'sgd' = momentum
    # 0.9 with coupled L2 (torch SGD semantics).  All three share the
    # OneCycle schedule, the trainable-param masking, and runtime-injected
    # lr/wd (zero recompiles across a sweep's trials).
    optimizer: str = "adam"  # adam | adamw | sgd
    # Learning-rate curve.  'onecycle' = the reference's OneCycleLR with
    # cosine annealing and torch's default warmup leg (train.py:115-121);
    # 'cosine' = plain CosineAnnealingLR(eta_min=0) decay from the peak;
    # 'constant' = fixed lr.  Orthogonal to scheduler_step, which decides
    # whether the curve advances per batch or per epoch.
    schedule: str = "onecycle"  # onecycle | cosine | constant
    batch_size: int = 32
    max_epochs: int = 15
    patience: int = 4
    aug_intensity: str = "medium"  # low | medium | high (dataload.py:11-58)
    # Subsampled epochs during hyperopt (reference train.py:19,73).
    train_samples_per_epoch: int | None = 1024
    eval_samples: int | None = 512
    # OneCycle steps_per_epoch hardcode (reference train.py:114 vs
    # final.py:267 use different values; we compute from the real epoch
    # length unless this override is set).
    steps_per_epoch_override: int | None = None
    scheduler_step: str = "batch"  # 'batch' (train.py:42) | 'epoch' (final.py:330)
    seed: int = 42
    label_smoothing: float = 0.0
    # Batch mixing (beyond-reference recipe support; standard for the ViT /
    # EfficientNet families): Beta(alpha, alpha) mixup and/or CutMix inside
    # the jitted step (ops/mix.py — shard-local reversed-batch pairing:
    # each device pairs within its own slice of the 'data'-sharded batch,
    # no cross-chip traffic).  0.0 = off (reference behavior, and the
    # step's RNG streams stay bit-identical to pre-mixing builds).  When
    # both are set, a per-step fair coin picks the transform.
    mixup_alpha: float = 0.0
    cutmix_alpha: float = 0.0
    # Exponential moving average of the weights (beyond-reference recipe;
    # standard for ViT/EfficientNet training).  decay > 0 tracks
    # ema = decay*ema + (1-decay)*params after every optimizer step as one
    # fused on-device tree update inside the compiled train step (the EMA
    # tree rides in opt_state, so it scans/donates/checkpoints for free);
    # BN families also track an EMA of the running statistics
    # (TrainState.ema_batch_stats, timm-ModelEma semantics) so the eval
    # view never pairs averaged params with un-averaged buffers.
    # Validation, best-snapshotting, and the returned weights then use
    # the EMA trees.  0.0 = off (reference behavior; opt_state structure
    # is unchanged, so existing checkpoints restore bit-identically).
    ema_decay: float = 0.0
    # Gradient accumulation (beyond-reference): each optimizer step's
    # forward/backward runs as this many SEQUENTIAL micro-batches inside
    # the jitted step, so activation memory scales with
    # batch_size/grad_accum_steps.  Micro-losses are normalized by the
    # full batch's denominator (train/step.py::_accum_loss_and_updates),
    # so the summed micro-gradients equal the full-batch gradient to fp
    # reassociation whenever the forward is per-sample independent
    # (BN-free families, or BN in inference form); BN layers normalizing
    # by batch statistics see micro-batch moments instead — the standard
    # accumulation caveat in every framework.  Lets batch_size exceed
    # what one backward pass fits in HBM (big ViT/EfficientNet variants
    # at high resolution).  Chunking is shard-local on multi-chip meshes
    # (no extra collectives); the augmentation/mixing streams are
    # bit-identical to grad_accum_steps=1, only the dropout stream
    # differs.  batch_size must be divisible by
    # data_shards * grad_accum_steps.
    grad_accum_steps: int = 1
    # Re-permute each device's HBM-resident local shard every epoch
    # (on-device gather, no re-upload) so batch composition re-randomizes
    # like the reference's per-epoch shard-shuffle + 1000-buffer
    # (reference hyperopt.py:119-128).
    hbm_reshuffle: bool = True


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout for jit/shard_map parallelism.

    The reference is single-device (SURVEY §2: no torch.distributed anywhere);
    here data parallelism over ICI is first-class, with optional tensor
    parallelism for the MLP head.
    """

    data: int = -1  # -1: use all devices on the data axis
    model: int = 1

    def axis_sizes(self, n_devices: int) -> tuple:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        return (data, model)


@dataclasses.dataclass(frozen=True)
class HyperoptConfig:
    """Study settings (reference run_hyperopt.py:44-50, hyperopt.py:386-447)."""

    n_trials: int = 200
    k_folds: int = 3
    first_fold_min_acc: float = 95.0  # tier-2 pruning floor (hyperopt.py:236-247)
    # Tier-1 pruner: 'median' (reference parity, hyperopt.py:434-438),
    # 'asha' (beyond-reference asynchronous successive halving — the
    # barrier-free choice under parallel trial scheduling), or 'none'.
    pruner: str = "median"
    median_startup_trials: int = 20  # MedianPruner(20, 10, 1) (hyperopt.py:434-438)
    median_warmup_steps: int = 10
    asha_min_resource: int = 1  # first rung (epochs)
    asha_reduction_factor: int = 3  # keep top 1/3 at each rung
    progressive_min_trials: int = 20  # tier-3 (hyperopt.py:285-307)
    progressive_factor: float = 0.85
    confidence: float = 0.80  # t-dist lower bound (hyperopt.py:361-370)
    storage: str = "optuna_animals10_kfold.db"
    study_name: str = "animals10_kfold"
    seed: int = 42

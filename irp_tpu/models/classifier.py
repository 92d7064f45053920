"""Backbone + MLP-head classifier and the create_model factory.

Mirrors the reference ``AnimalClassifier`` (reference functions/model.py:9-41):
headless ResNet50 backbone (fc -> Identity, model.py:27) feeding a
Dropout -> Linear(2048, 512) -> ReLU -> Dropout -> Linear(512, num_classes)
head (model.py:30-36), with class-weighted cross-entropy and Adam over
trainable params only (model.py:45-60).

TPU-native: the head's Dense layers are the natural tensor-parallel shard
point (kernel sharded on the output/input dim over the 'model' mesh axis —
see irp_tpu.parallel.mesh.param_sharding_rules).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from irp_tpu.config import ModelConfig
from irp_tpu.models.convnext import (
    STAGE_COUNT as _CNX_STAGES, ConvNeXt,
    convnext_default_trainable_stages)
from irp_tpu.models.efficientnet import (
    STAGE_COUNT as _EFF_STAGES, EfficientNet,
    efficientnet_default_trainable_stages)
from irp_tpu.models.resnet import STAGE_NAMES, ResNet
from irp_tpu.models.vit import (VisionTransformer, resolve_num_heads,
                                vit_default_trainable_stages)


def resolve_trainable_stages(cfg: ModelConfig) -> tuple:
    """The effective trainable-stage tuple for a config.

    For family='vit' the untouched ResNet default ('layer4',) means "the
    analogous last-block recipe" — block{L-1} + the final LayerNorm
    (vit_default_trainable_stages); anything else is taken literally."""
    if cfg.family == "vit" and tuple(cfg.trainable_stages) == ("layer4",):
        return vit_default_trainable_stages(cfg.num_layers)
    if (cfg.family == "efficientnet"
            and tuple(cfg.trainable_stages) == ("layer4",)):
        return efficientnet_default_trainable_stages()
    if (cfg.family == "convnext"
            and tuple(cfg.trainable_stages) == ("layer4",)):
        return convnext_default_trainable_stages()
    return tuple(cfg.trainable_stages)


def _vit_frozen_prefix(cfg: ModelConfig, stages: tuple) -> int:
    """Leading encoder blocks with no trainable stage at or before them.

    'embed' trainable => prefix 0 (the embedding sits before block 0, so
    the stop_gradient cut must not cover it)."""
    if cfg.head_only:
        return cfg.num_layers
    if "embed" in stages:
        return 0
    blocks = []
    for name in stages:
        if name.startswith("block"):
            idx = int(name[len("block"):])
            if not 0 <= idx < cfg.num_layers:
                raise ValueError(
                    f"trainable stage {name!r} out of range for "
                    f"num_layers={cfg.num_layers}")
            blocks.append(idx)
        elif name != "ln":
            raise ValueError(
                f"unknown ViT trainable stage {name!r} (expected "
                f"'block<i>', 'ln', or 'embed')")
    return min(blocks) if blocks else cfg.num_layers


def _efficientnet_freezing(cfg: ModelConfig, stages: tuple):
    """(frozen_prefix, top_frozen) for an EfficientNet config.

    frozen_prefix = leading MBConv stages with no trainable stage at or
    before them ('stem' trainable => prefix 0 — the stem sits before
    stage 1, so the stop_gradient cut must not cover it).
    """
    if cfg.head_only:
        return _EFF_STAGES, True
    top_frozen = "top" not in stages
    if "stem" in stages:
        return 0, top_frozen
    indices = []
    for name in stages:
        if name.startswith("stage"):
            idx = int(name[len("stage"):])
            if not 1 <= idx <= _EFF_STAGES:
                raise ValueError(
                    f"trainable stage {name!r} out of range "
                    f"(stage1..stage{_EFF_STAGES})")
            indices.append(idx)
        elif name != "top":
            raise ValueError(
                f"unknown EfficientNet trainable stage {name!r} (expected "
                f"'stage<i>', 'stem', or 'top')")
    prefix = min(indices) - 1 if indices else _EFF_STAGES
    return prefix, top_frozen


def _convnext_freezing(cfg: ModelConfig, stages: tuple) -> int:
    """frozen_prefix for a ConvNeXt config: leading stages with no
    trainable stage at or before them ('stem' trainable => prefix 0).
    The final LayerNorm ('ln') is post-pool, so it never moves the cut."""
    if cfg.head_only:
        return _CNX_STAGES
    if "stem" in stages:
        return 0
    indices = []
    for name in stages:
        if name.startswith("stage"):
            idx = int(name[len("stage"):])
            if not 1 <= idx <= _CNX_STAGES:
                raise ValueError(
                    f"trainable stage {name!r} out of range "
                    f"(stage1..stage{_CNX_STAGES})")
            indices.append(idx)
        elif name != "ln":
            raise ValueError(
                f"unknown ConvNeXt trainable stage {name!r} (expected "
                f"'stage<i>', 'stem', or 'ln')")
    return min(indices) - 1 if indices else _CNX_STAGES


class Classifier(nn.Module):
    """Backbone (ResNet, ViT, EfficientNet, or ConvNeXt family) +
    2-layer MLP head."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        if cfg.family not in ("resnet", "vit", "efficientnet", "convnext"):
            raise ValueError(f"unknown model family {cfg.family!r}")
        dtype = jnp.dtype(cfg.compute_dtype)
        precision = _resolve_precision(cfg.precision)
        if cfg.family == "convnext":
            if cfg.fused_frozen_blocks == "on":
                raise ValueError("fused_frozen_blocks='on' is a ResNet "
                                 "bottleneck kernel; not available for "
                                 "family='convnext'")
            stages = resolve_trainable_stages(cfg)
            self.backbone = ConvNeXt(
                dims=tuple(cfg.convnext_dims),
                depths=tuple(cfg.convnext_depths), dtype=dtype,
                frozen_prefix=_convnext_freezing(cfg, stages),
                stochastic_depth_prob=cfg.stochastic_depth,
                precision=precision,
                remat_blocks=cfg.remat_trainable_blocks)
            self._build_head(cfg, dtype, precision)
            return
        if cfg.family == "efficientnet":
            if cfg.fused_frozen_blocks == "on":
                raise ValueError("fused_frozen_blocks='on' is a ResNet "
                                 "bottleneck kernel; not available for "
                                 "family='efficientnet'")
            stages = resolve_trainable_stages(cfg)
            frozen_prefix, top_frozen = _efficientnet_freezing(cfg, stages)
            self.backbone = EfficientNet(
                width_mult=cfg.width_mult, depth_mult=cfg.depth_mult,
                dtype=dtype, frozen_prefix=frozen_prefix,
                top_frozen=top_frozen, bn_stats_mode=cfg.bn_stats_mode,
                stochastic_depth_prob=cfg.stochastic_depth,
                precision=precision,
                remat_blocks=cfg.remat_trainable_blocks)
            self._build_head(cfg, dtype, precision)
            return
        if cfg.family == "vit":
            if cfg.fused_frozen_blocks == "on":
                raise ValueError("fused_frozen_blocks='on' is a ResNet "
                                 "bottleneck kernel; not available for "
                                 "family='vit'")
            stages = resolve_trainable_stages(cfg)
            self.backbone = VisionTransformer(
                patch_size=cfg.patch_size, embed_dim=cfg.embed_dim,
                num_layers=cfg.num_layers,
                num_heads=resolve_num_heads(cfg),
                mlp_dim=cfg.mlp_dim, image_size=cfg.image_size, dtype=dtype,
                frozen_prefix=_vit_frozen_prefix(cfg, stages),
                precision=precision,
                remat_blocks=cfg.remat_trainable_blocks)
            self._build_head(cfg, dtype, precision)
            return
        if cfg.head_only:
            frozen_prefix = 4
        else:
            trainable = set(cfg.trainable_stages)
            frozen_prefix = 0
            for name in STAGE_NAMES:
                if name in trainable:
                    break
                frozen_prefix += 1
        fused = {"on": True, "off": False,
                 "auto": jax.default_backend() == "tpu",
                 }[cfg.fused_frozen_blocks]
        if cfg.fused_frozen_blocks == "on":
            # 'on' means FORCED — reject configs the kernel can't serve
            # rather than silently running unfused ('auto' degrades
            # silently by design; 'on' must not).
            from irp_tpu.models.resnet import BOTTLENECK_DEPTHS
            problems = []
            if cfg.depth not in BOTTLENECK_DEPTHS:
                problems.append(f"depth {cfg.depth} has no bottlenecks")
            if cfg.bn_stats_mode != "trainable_only":
                problems.append("bn_stats_mode must be 'trainable_only'")
            if cfg.compute_dtype != "bfloat16":
                problems.append("compute_dtype must be 'bfloat16'")
            if precision is not None:
                problems.append("precision must be 'default'")
            if cfg.groups != 1 or cfg.width_per_group != 64:
                problems.append("ResNeXt/Wide variants have no fused "
                                "kernel (plain ResNet blocks only)")
            if problems:
                raise ValueError(
                    "fused_frozen_blocks='on' is incompatible with this "
                    "config: " + "; ".join(problems))
        self.backbone = ResNet(depth=cfg.depth, dtype=dtype,
                               groups=cfg.groups,
                               width_per_group=cfg.width_per_group,
                               frozen_prefix=frozen_prefix,
                               bn_stats_mode=cfg.bn_stats_mode,
                               precision=precision,
                               fused_frozen_blocks=fused,
                               remat_blocks=cfg.remat_trainable_blocks)
        self._build_head(cfg, dtype, precision)

    def _build_head(self, cfg, dtype, precision):
        self.head_dense1 = nn.Dense(cfg.hidden_dim, dtype=dtype,
                                    param_dtype=jnp.float32,
                                    precision=precision)
        self.head_dense2 = nn.Dense(cfg.num_classes, dtype=dtype,
                                    param_dtype=jnp.float32,
                                    precision=precision)

    def _dropout(self, x, rate, deterministic: bool):
        """Inverted dropout with a RUNTIME rate.

        ``rate`` may be a traced scalar: the sweep injects each trial's
        dropout_rate as a step-function argument (like lr/wd in the
        injected-hyperparams optimizer), so 200 trials with 200 distinct
        rates share ONE compiled program instead of recompiling the
        scanned epoch per trial (nn.Dropout's rate is a static module
        attribute, which is what forced the recompile)."""
        if deterministic:
            return x
        keep = 1.0 - jnp.asarray(rate, jnp.float32)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
        scaled = x / jnp.maximum(keep, 1e-6).astype(x.dtype)
        return jnp.where(mask, scaled, jnp.zeros_like(x))

    def __call__(self, x, train: bool = False, dropout_rate=None):
        rate = (self.config.dropout_rate if dropout_rate is None
                else dropout_rate)
        feats = self.backbone(x, train=train)
        y = self._dropout(feats, rate, deterministic=not train)
        y = self.head_dense1(y)
        y = nn.relu(y)
        y = self._dropout(y, rate, deterministic=not train)
        y = self.head_dense2(y)
        return y.astype(jnp.float32)  # logits in f32 for a stable loss

    def features(self, x):
        """Headless forward (for the outlier-detection feature extractor,
        reference data_curation.py:654-684)."""
        return self.backbone(x, train=False).astype(jnp.float32)

    def spatial_features(self, x):
        """Pre-pool backbone feature map (B, H', W', C) — the Grad-CAM
        surface (irp_tpu.explain).  Eval-form BN, no dropout.

        ResNet family only as an explain surface: for ViT the head reads
        the CLS token, not a pool of the patch grid, so Grad-CAM uses
        ``vit_tokens``/``vit_logits_from_tokens`` instead (the map this
        returns is still the post-LN patch grid, useful for feature viz).
        """
        return self.backbone(x, train=False, return_spatial=True)

    def vit_tokens(self, x):
        """ViT Grad-CAM surface: the token sequence (B, S, E) entering
        the LAST encoder block (no stop_gradient — explain differentiates
        through it).  family='vit' only."""
        return self.backbone.prefix_tokens(x)

    def vit_logits_from_tokens(self, tokens):
        """Last block + final LN + CLS + eval-form head: (B,S,E) -> (B,K)
        f32 logits.  ``vit_logits_from_tokens(vit_tokens(x))`` equals the
        full ``__call__(x, train=False)`` logits exactly — the explain
        path relies on that equivalence (irp_tpu.explain)."""
        feats = self.backbone.suffix_feature(tokens)
        return self.head(feats)

    def head(self, feats):
        """Eval-form MLP head on pooled features (B, C) -> (B, classes).

        Dropout is identity at eval, so ``head(spatial.mean((1,2)))``
        equals the full ``__call__(x, train=False)`` logits —
        irp_tpu.explain relies on that equivalence to differentiate
        logits w.r.t. the spatial map."""
        y = self.head_dense1(feats)
        y = nn.relu(y)
        y = self.head_dense2(y)
        return y.astype(jnp.float32)

    def head_from_spatial(self, spatial):
        """Spatial map (B,h,w,C) -> eval-form logits, family-exact.

        The Grad-CAM surface (irp_tpu.explain):
        ``head_from_spatial(spatial_features(x))`` equals
        ``__call__(x, train=False)`` for every spatial family.  ResNet /
        EfficientNet pool and feed the head directly; ConvNeXt's final
        LayerNorm sits AFTER the pool (torchvision classifier.0), so its
        backbone recombines pool + LN (from_spatial=True) before the
        head."""
        if self.config.family == "convnext":
            feats = self.backbone(spatial, from_spatial=True)
        else:
            feats = spatial.mean(axis=(1, 2))
        return self.head(feats)


def _resolve_precision(name: str | None):
    if name in (None, "default"):
        return None
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH}[name]


def weighted_cross_entropy(logits, labels, class_weights=None,
                           label_smoothing: float = 0.0, denom=None):
    """Per-class-weighted softmax cross-entropy.

    Matches torch.nn.CrossEntropyLoss(weight=w) semantics (reference
    model.py:50-54): mean is weighted — sum(w_i * ce_i) / sum(w_i).

    ``denom`` overrides the normalizing denominator (batch size, or the
    weight sum when class-weighted).  Gradient accumulation uses this to
    make micro-batch losses sum EXACTLY to the full-batch loss: each
    chunk contributes sum(w_i * ce_i) / denom_full (step.py).
    """
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    if label_smoothing > 0.0:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / num_classes
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(onehot * logp, axis=-1)
    if class_weights is None:
        if denom is None:
            return jnp.mean(ce)
        return jnp.sum(ce) / denom
    w = jnp.asarray(class_weights, dtype=logits.dtype)[labels]
    d = jnp.maximum(jnp.sum(w), 1e-8) if denom is None else denom
    return jnp.sum(w * ce) / d


def mixed_weighted_cross_entropy(logits, labels_a, labels_b, lam,
                                 class_weights=None,
                                 label_smoothing: float = 0.0,
                                 denom_a=None, denom_b=None):
    """Loss side of mixup/CutMix (ops/mix.py::mix_batch): the convex
    two-term form ``lam * CE(y_a) + (1-lam) * CE(y_b)`` — equivalent to
    soft-target CE without materializing (B, C) one-hots, and the
    standard way class weighting composes with mixing (each term keeps
    its own weighted-mean denominator).  ``denom_a``/``denom_b``: see
    weighted_cross_entropy (gradient accumulation)."""
    loss_a = weighted_cross_entropy(logits, labels_a, class_weights,
                                    label_smoothing, denom=denom_a)
    loss_b = weighted_cross_entropy(logits, labels_b, class_weights,
                                    label_smoothing, denom=denom_b)
    lam = lam.astype(loss_a.dtype)
    return lam * loss_a + (1.0 - lam) * loss_b


# Module instances memoized on their (frozen, hashable) config: TrainState
# stores model.apply as static jit aux data, and bound-method equality needs
# the SAME module instance — a fresh Classifier per fit() would retrace the
# compiled train step every call (linen Modules are immutable; sharing is
# safe).
_MODEL_MEMO = {}


def get_classifier(cfg: ModelConfig) -> Classifier:
    model = _MODEL_MEMO.get(cfg)
    if model is None:
        model = Classifier(config=cfg)
        _MODEL_MEMO[cfg] = model
    return model


def init_classifier(cfg: ModelConfig, rng: jax.Array, image_size: int = 224):
    """Initialize the classifier; returns (module, variables)."""
    model = get_classifier(cfg)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init({"params": rng}, dummy, train=False)
    return model, variables

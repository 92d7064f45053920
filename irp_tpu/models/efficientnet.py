"""Flax EfficientNet family (torchvision-compatible layout, B0-B7).

Beyond-reference model family (the reference stack is ResNet-only,
reference functions/model.py:15): the EfficientNet-V1 ladder as a third
backbone that slots into the same ``Classifier`` head, conversion,
inference, serving, and explain paths as ResNet and ViT.

Architecture mirrors ``torchvision.models.efficientnet`` exactly — MBConv
blocks (1x1 expand -> depthwise kxk -> squeeze-excitation -> 1x1 project)
with SiLU activations, channel/depth scaling via torchvision's
``_make_divisible`` rounding, per-block linearly-scaled stochastic depth,
and the B5-B7 BatchNorm epsilon/momentum quirk (those weights came from
the TF port: eps 1e-3, momentum 0.01; B0-B4 use the nn.BatchNorm2d
defaults) — so pretrained torchvision ``efficientnet_b*`` checkpoints
convert mechanically (irp_tpu.models.convert).

Parameter naming (flax tree <-> torchvision state_dict):

- ``stem_conv`` / ``stem_bn``          <-> ``features.0.{0,1}``
- ``stage{s}_block{j}`` (s in 1..7)    <-> ``features.{s}.{j}.block``
  with children ``expand_conv/expand_bn`` (absent when expand_ratio==1,
  i.e. stage 1), ``dw_conv/dw_bn`` (depthwise: feature_group_count =
  channels — XLA lowers grouped convs natively), ``se_fc1/se_fc2``
  (1x1 convs with bias), ``project_conv/project_bn``
- ``top_conv`` / ``top_bn``            <-> ``features.8.{0,1}``

TPU-first details shared with the ResNet family:
- NHWC layout, bfloat16 compute with float32 params and BN statistics.
- Frozen-prefix semantics via a single ``stop_gradient`` cut after the
  last frozen stage (prunes the whole frozen backward graph).
- ``bn_stats_mode='trainable_only'`` keeps frozen-stage BN in inference
  form (folds into conv epilogues — the measured hot-path win on the
  ResNet family, BENCH.md).
- Optional ``nn.remat`` on trainable-stage blocks.

Trainable-stage names for ModelConfig.trainable_stages: ``stem``,
``stage1``..``stage7``, ``top`` (the final 1x1 conv).  The untouched
ResNet default ``('layer4',)`` auto-maps to the analogous last-stage
recipe ``('stage7', 'top')`` — see efficientnet_default_trainable_stages.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# torchvision _efficientnet_conf base table (expand_ratio, kernel, stride,
# input_channels, out_channels, num_layers) — scaled per variant by
# (width_mult, depth_mult) with _make_divisible / ceil rounding.
_BASE_SETTING = (
    (1, 3, 1, 32, 16, 1),
    (6, 3, 2, 16, 24, 2),
    (6, 5, 2, 24, 40, 2),
    (6, 3, 2, 40, 80, 3),
    (6, 5, 1, 80, 112, 3),
    (6, 5, 2, 112, 192, 4),
    (6, 3, 1, 192, 320, 1),
)

# (width_mult, depth_mult, default train resolution, torchvision head
# dropout).  B5-B7 additionally use the TF-port BatchNorm constants.
EFFICIENTNET_VARIANTS = {
    "b0": dict(width_mult=1.0, depth_mult=1.0, resolution=224, dropout=0.2),
    "b1": dict(width_mult=1.0, depth_mult=1.1, resolution=240, dropout=0.2),
    "b2": dict(width_mult=1.1, depth_mult=1.2, resolution=260, dropout=0.3),
    "b3": dict(width_mult=1.2, depth_mult=1.4, resolution=300, dropout=0.3),
    "b4": dict(width_mult=1.4, depth_mult=1.8, resolution=380, dropout=0.4),
    "b5": dict(width_mult=1.6, depth_mult=2.2, resolution=456, dropout=0.4),
    "b6": dict(width_mult=1.8, depth_mult=2.6, resolution=528, dropout=0.5),
    "b7": dict(width_mult=2.0, depth_mult=3.1, resolution=600, dropout=0.5),
}
_TF_BN_VARIANTS = ("b5", "b6", "b7")  # eps 1e-3, torch momentum 0.01

STAGE_COUNT = len(_BASE_SETTING)


def make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision.models._utils._make_divisible (channel rounding)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def scaled_setting(width_mult: float, depth_mult: float):
    """The per-stage (expand, kernel, stride, in_ch, out_ch, layers) table
    after width/depth scaling — torchvision MBConvConfig semantics."""
    out = []
    for expand, kernel, stride, in_ch, out_ch, layers in _BASE_SETTING:
        out.append((expand, kernel, stride,
                    make_divisible(in_ch * width_mult),
                    make_divisible(out_ch * width_mult),
                    int(math.ceil(layers * depth_mult))))
    return tuple(out)


def top_channels(width_mult: float) -> int:
    """features.8 output width: 4x the last stage's (scaled) out_channels."""
    return 4 * make_divisible(_BASE_SETTING[-1][4] * width_mult)


def bn_constants(width_mult: float, depth_mult: float):
    """(epsilon, flax momentum) for a variant's BatchNorm layers.

    B5-B7 weights came from the TF port: eps 1e-3, torch momentum 0.01
    (flax momentum 0.99).  Identified by their multipliers so conversion
    needs no variant name."""
    for name in _TF_BN_VARIANTS:
        v = EFFICIENTNET_VARIANTS[name]
        if (v["width_mult"], v["depth_mult"]) == (width_mult, depth_mult):
            return 1e-3, 0.99
    return 1e-5, 0.9


def efficientnet_model_config(variant: str = "b0", **overrides):
    """ModelConfig for a named torchvision EfficientNet size
    (family='efficientnet').

    ``overrides`` pass through to ModelConfig (num_classes, image_size,
    dropout_rate, trainable_stages, ...) and take precedence.  The
    variant's native train resolution is the default image_size, and its
    torchvision head dropout is the default dropout_rate."""
    from irp_tpu.config import ModelConfig

    if variant not in EFFICIENTNET_VARIANTS:
        raise ValueError(f"unknown EfficientNet variant {variant!r} "
                         f"(one of {sorted(EFFICIENTNET_VARIANTS)})")
    v = EFFICIENTNET_VARIANTS[variant]
    return ModelConfig(family="efficientnet",
                       **{**dict(width_mult=v["width_mult"],
                                 depth_mult=v["depth_mult"],
                                 image_size=v["resolution"],
                                 dropout_rate=v["dropout"]),
                          **overrides})


def efficientnet_default_trainable_stages() -> tuple:
    """The EfficientNet analog of the reference's freeze-all-but-layer4
    recipe (reference model.py:17-23): the last MBConv stage + the final
    1x1 conv feeding the pool."""
    return ("stage7", "top")


class MBConv(nn.Module):
    """Inverted residual with squeeze-excitation (torchvision MBConv).

    expand 1x1 -> depthwise kxk (stride) -> SE -> project 1x1, SiLU
    everywhere except after project; residual + per-sample stochastic
    depth when shapes match.
    """

    in_ch: int
    out_ch: int
    expand_ratio: int
    kernel: int
    stride: int
    sd_prob: float
    conv: Any
    norm: Any
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        expanded = (make_divisible(self.in_ch * self.expand_ratio)
                    if self.expand_ratio != 1 else self.in_ch)
        y = x
        if self.expand_ratio != 1:
            y = self.conv(expanded, (1, 1), name="expand_conv")(y)
            y = self.norm(name="expand_bn")(y)
            y = nn.silu(y)
        p = (self.kernel - 1) // 2
        y = self.conv(expanded, (self.kernel, self.kernel),
                      strides=(self.stride, self.stride),
                      padding=((p, p), (p, p)),
                      feature_group_count=expanded, name="dw_conv")(y)
        y = self.norm(name="dw_bn")(y)
        y = nn.silu(y)

        # Squeeze-excitation: squeeze width is input_channels // 4 (the
        # block input, NOT the expanded width — torchvision MBConv).
        squeeze = max(1, self.in_ch // 4)
        s = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = s.astype(self.dtype)
        s = nn.Conv(squeeze, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="se_fc1")(s)
        s = nn.silu(s)
        s = nn.Conv(expanded, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="se_fc2")(s)
        y = y * jax.nn.sigmoid(s)

        y = self.conv(self.out_ch, (1, 1), name="project_conv")(y)
        y = self.norm(name="project_bn")(y)
        if self.stride == 1 and self.in_ch == self.out_ch:
            y = self._stochastic_depth(y, train) + x
        return y

    def _stochastic_depth(self, y, train: bool):
        """Row-mode stochastic depth (torchvision StochasticDepth): drop
        the whole residual branch per SAMPLE with prob sd_prob, rescale
        survivors by 1/keep.  Identity at eval."""
        if not train or self.sd_prob <= 0.0:
            return y
        keep = 1.0 - self.sd_prob
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep,
                                    (y.shape[0], 1, 1, 1))
        return jnp.where(mask, y / jnp.asarray(keep, y.dtype),
                         jnp.zeros_like(y))


class EfficientNet(nn.Module):
    """Headless EfficientNet returning globally-pooled features (B, C).

    ``frozen_prefix``: number of leading MBConv stages (0-7) treated as
    frozen; a stop_gradient is inserted after the last frozen stage (the
    stem is frozen whenever any stage is).  ``top_frozen`` controls only
    the final conv's BN form under ``bn_stats_mode='trainable_only'`` —
    parameter freezing itself is the optimizer mask's job
    (irp_tpu.train.state.trainable_mask), as in the ResNet family.
    """

    width_mult: float = 1.0
    depth_mult: float = 1.0
    dtype: Any = jnp.bfloat16
    frozen_prefix: int = 6
    top_frozen: bool = False
    bn_stats_mode: str = "trainable_only"
    stochastic_depth_prob: float = 0.2
    precision: Any = None
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_spatial: bool = False):
        setting = scaled_setting(self.width_mult, self.depth_mult)
        eps, momentum = bn_constants(self.width_mult, self.depth_mult)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, precision=self.precision)

        def make_norm(frozen_stage: bool):
            if self.bn_stats_mode == "trainable_only" and frozen_stage:
                updating = False
            else:
                updating = train
            return partial(nn.BatchNorm, use_running_average=not updating,
                           momentum=momentum, epsilon=eps, dtype=self.dtype,
                           param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        x = conv(setting[0][3], (3, 3), strides=(2, 2),
                 padding=((1, 1), (1, 1)), name="stem_conv")(x)
        x = make_norm(self.frozen_prefix > 0)(name="stem_bn")(x)
        x = nn.silu(x)

        total_blocks = sum(s[5] for s in setting)
        block_id = 0
        for i, (expand, kernel, stride, in_ch, out_ch, layers) in enumerate(
                setting):
            frozen = (i + 1) <= self.frozen_prefix
            norm = make_norm(frozen_stage=frozen)
            for j in range(layers):
                sd = self.stochastic_depth_prob * block_id / total_blocks
                cls = MBConv
                if self.remat_blocks and not frozen:
                    # lifted transform preserves the variable tree/naming
                    cls = nn.remat(MBConv, static_argnums=(2,))
                x = cls(in_ch=in_ch if j == 0 else out_ch, out_ch=out_ch,
                        expand_ratio=expand, kernel=kernel,
                        stride=stride if j == 0 else 1, sd_prob=sd,
                        conv=conv, norm=norm, dtype=self.dtype,
                        name=f"stage{i + 1}_block{j}")(x, train)
                block_id += 1
            if (i + 1) == self.frozen_prefix:
                # Single cut: no backward graph for the frozen prefix.
                x = jax.lax.stop_gradient(x)

        x = conv(top_channels(self.width_mult), (1, 1), name="top_conv")(x)
        x = make_norm(self.top_frozen)(name="top_bn")(x)
        x = nn.silu(x)
        if return_spatial:
            # pre-pool feature map (B, H', W', C) — the Grad-CAM surface
            # (irp_tpu.explain), same contract as the ResNet family
            return x.astype(self.dtype)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, C)
        return x.astype(self.dtype)

    @property
    def num_features(self) -> int:
        return top_channels(self.width_mult)

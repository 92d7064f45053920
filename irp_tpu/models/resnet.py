"""Flax ResNet family (v1.5 bottleneck placement, torchvision-compatible).

TPU-native rebuild of the reference backbone (reference functions/model.py:
9-41 wraps ``torchvision.models.resnet50(IMAGENET1K_V2)`` with layers 1-3
frozen and layer4 trainable, fc replaced by Identity).  Here the backbone is
a from-scratch Flax module whose parameter tree mirrors torchvision's naming
(``conv1/bn1/layer{1..4}/block{j}/conv{1..3}...``) so pretrained PyTorch
state_dicts convert mechanically (see irp_tpu.models.convert).

TPU-first details:
- NHWC layout throughout (XLA's native conv layout on TPU).
- bfloat16 compute with float32 params and batch-norm statistics.
- Frozen-prefix semantics via a single ``stop_gradient`` cut after the last
  frozen stage: XLA then never builds the backward graph for layers 1-3,
  which is most of the FLOP savings of freezing (the reference relies on
  requires_grad=False which still backprops activations).
- BatchNorm running stats update in train mode even for frozen stages
  (matching PyTorch ``.train()`` semantics on frozen layers, a fidelity
  trap called out in SURVEY §7) unless ``update_stats`` excludes them.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any

# stage_sizes per depth, torchvision table
STAGE_SIZES = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
BOTTLENECK_DEPTHS = (50, 101, 152)

STAGE_NAMES = ("layer1", "layer2", "layer3", "layer4")


class BasicBlock(nn.Module):
    """Two 3x3 convs (ResNet-18/34)."""

    filters: int
    stride: int
    conv: ModuleDef
    norm: ModuleDef

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                      name="conv2")(y)
        y = self.norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1),
                                 strides=(self.stride, self.stride),
                                 name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 with expansion 4 (ResNet-50/101/152).

    Stride on the 3x3 conv = torchvision's v1.5 placement, required for
    IMAGENET1K weights to be valid.
    """

    filters: int
    stride: int
    conv: ModuleDef
    norm: ModuleDef
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1), name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(self.filters * self.expansion, (1, 1), name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters * self.expansion, (1, 1),
                                 strides=(self.stride, self.stride),
                                 name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Headless ResNet returning globally-pooled features (B, C).

    ``frozen_prefix``: number of leading stages (0-4) treated as frozen; a
    stop_gradient is inserted after the last frozen stage.  4 freezes the
    whole backbone (head-only fine-tuning).  Parameter freezing itself is
    enforced by the optimizer mask (irp_tpu.train.state.trainable_mask);
    this flag only prunes the backward graph.
    ``bn_stats_mode``: 'trainable_only' (default) keeps frozen-stage BN in
    inference form — running stats in the forward, stats never updated —
    which lets XLA fold the normalize into the conv epilogue (the measured
    hot-path win, BENCH.md); 'all' updates running stats everywhere in
    train mode and normalizes with batch statistics (PyTorch .train()
    behavior on frozen layers — the torch-parity mode).
    """

    depth: int = 50
    num_filters: int = 64
    dtype: Any = jnp.bfloat16
    frozen_prefix: int = 3
    bn_stats_mode: str = "trainable_only"
    precision: Any = None  # e.g. jax.lax.Precision.HIGHEST for f32 fidelity

    @nn.compact
    def __call__(self, x, train: bool = False):
        stage_sizes = STAGE_SIZES[self.depth]
        block_cls = Bottleneck if self.depth in BOTTLENECK_DEPTHS else BasicBlock
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, precision=self.precision)

        def make_norm(frozen_stage: bool):
            # torch BN defaults: momentum 0.1 (flax momentum = 0.9), eps 1e-5
            if self.bn_stats_mode == "trainable_only" and frozen_stage:
                updating = False
            else:
                updating = train
            return partial(nn.BatchNorm, use_running_average=not updating,
                           momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                           param_dtype=jnp.float32)

        norm0 = make_norm(frozen_stage=self.frozen_prefix > 0)
        x = x.astype(self.dtype)
        x = conv(self.num_filters, (7, 7), strides=(2, 2),
                 padding=((3, 3), (3, 3)), name="conv1")(x)
        x = norm0(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i, num_blocks in enumerate(stage_sizes):
            frozen = (i + 1) <= self.frozen_prefix
            norm = make_norm(frozen_stage=frozen)
            for j in range(num_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = block_cls(filters=self.num_filters * 2 ** i, stride=stride,
                              conv=conv, norm=norm,
                              name=f"{STAGE_NAMES[i]}_block{j}")(x)
            if (i + 1) == self.frozen_prefix:
                # Single cut: no backward graph for the frozen prefix.
                x = jax.lax.stop_gradient(x)

        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, C)
        return x.astype(self.dtype)

    @property
    def num_features(self) -> int:
        mult = 4 if self.depth in BOTTLENECK_DEPTHS else 1
        return self.num_filters * 8 * mult

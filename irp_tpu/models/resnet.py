"""Flax ResNet family (v1.5 bottleneck placement, torchvision-compatible).

TPU-native rebuild of the reference backbone (reference functions/model.py:
9-41 wraps ``torchvision.models.resnet50(IMAGENET1K_V2)`` with layers 1-3
frozen and layer4 trainable, fc replaced by Identity).  Here the backbone is
a from-scratch Flax module whose parameter tree mirrors torchvision's naming
(``conv1/bn1/layer{1..4}/block{j}/conv{1..3}...``) so pretrained PyTorch
state_dicts convert mechanically (see irp_tpu.models.convert).  The
ResNeXt (grouped 3x3) and Wide-ResNet variants use torchvision's
``groups``/``width_per_group`` parameterization and the SAME state_dict
layout, so resnext50_32x4d / wide_resnet50_2 checkpoints interchange the
same way.

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


class _ConvKernel(nn.Module):
    """Declares an nn.Conv-compatible ``kernel`` param (HWIO, lecun_normal,
    f32) without building the conv op — used by the fused-block path so its
    parameter tree stays byte-identical to the unfused modules (and thus to
    irp_tpu.models.convert's torchvision mapping)."""

    shape: tuple  # (kh, kw, in, out)

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _BNVars(nn.Module):
    """Declares nn.BatchNorm-compatible variables (params.scale/bias,
    batch_stats.mean/var) without building the op; see _ConvKernel."""

    features: int

    @nn.compact
    def __call__(self):
        f = (self.features,)
        scale = self.param("scale", nn.initializers.ones, f, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, f, jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(f, jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(f, jnp.float32))
        return scale, bias, mean.value, var.value


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 with expansion 4 (ResNet-50/101/152).

    Stride on the 3x3 conv = torchvision's v1.5 placement, required for
    IMAGENET1K weights to be valid.

    ``groups``/``width_per_group`` follow torchvision's ResNeXt /
    Wide-ResNet parameterization: the 1x1/3x3 convs run at
    ``width = filters * width_per_group / 64 * groups`` channels with the
    3x3 grouped (``feature_group_count`` — XLA lowers grouped convs onto
    the MXU natively); the block's output stays ``filters * expansion``.

    ``fused=True`` routes the whole block through the single-pass Pallas
    kernel (ops/pallas_resnet.py) instead of per-conv XLA ops — only valid
    for identity blocks (stride 1, matching channels) on a frozen stage
    with inference-form BN, where the BN affine folds into the conv
    weights and no backward pass exists.  The parameter tree is identical
    either way.
    """

    filters: int
    stride: int
    conv: ModuleDef
    norm: ModuleDef
    expansion: int = 4
    groups: int = 1
    width_per_group: int = 64
    fused: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if self.fused:
            return self._fused(x)
        width = int(self.filters * self.width_per_group / 64.) * self.groups
        residual = x
        y = self.conv(width, (1, 1), name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(width, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)),
                      feature_group_count=self.groups, name="conv2")(y)
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

    def _fused(self, x):
        from irp_tpu.ops.pallas_resnet import (fold_bn_into_conv,
                                               fused_identity_bottleneck)

        m = self.filters
        c = m * self.expansion
        assert self.stride == 1 and x.shape[-1] == c, \
            "fused path requires an identity bottleneck"
        k1 = _ConvKernel((1, 1, c, m), name="conv1")()
        s1 = _BNVars(m, name="bn1")()
        k2 = _ConvKernel((3, 3, m, m), name="conv2")()
        s2 = _BNVars(m, name="bn2")()
        k3 = _ConvKernel((1, 1, m, c), name="conv3")()
        s3 = _BNVars(c, name="bn3")()
        sg = jax.lax.stop_gradient
        # Fold each inference-form BN into its conv (f32), then cast the
        # weights to the compute dtype.  stop_gradient keeps AD from ever
        # asking the kernel for a JVP: the whole frozen prefix is
        # primal-only (ResNet inserts its own cut after the stage, but the
        # params enter here, upstream of that cut).
        w1, b1 = fold_bn_into_conv(sg(k1), *map(sg, s1))
        w2, b2 = fold_bn_into_conv(sg(k2), *map(sg, s2))
        w3, b3 = fold_bn_into_conv(sg(k3), *map(sg, s3))
        dt = self.dtype
        return fused_identity_bottleneck(
            sg(x), w1.reshape(c, m).astype(dt), b1,
            w2.astype(dt), b2, w3.reshape(m, c).astype(dt), b3,
            interpret=jax.default_backend() != "tpu")


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
    # torchvision's variant parameterization (Bottleneck docstring):
    # groups=32,width_per_group=4 = ResNeXt-50/101 32x4d;
    # width_per_group=128 = Wide-ResNet-50/101-2.  Bottleneck depths only.
    groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.bfloat16
    frozen_prefix: int = 3
    bn_stats_mode: str = "trainable_only"
    precision: Any = None  # e.g. jax.lax.Precision.HIGHEST for f32 fidelity
    # Route eligible frozen identity bottlenecks through the single-pass
    # Pallas kernel (ops/pallas_resnet.py): one HBM read + one write per
    # block instead of XLA's per-conv round trips.  Eligible = bottleneck
    # depths, frozen stage, inference-form BN, stride 1, bf16, default
    # precision.  Parameter tree is unchanged.
    fused_frozen_blocks: bool = False
    # jax.checkpoint (remat) every TRAINABLE-stage block: the backward
    # pass recomputes the block's activations instead of holding them
    # in HBM through the whole forward — the standard TPU trade of
    # FLOPs for memory headroom (bigger batches / deeper variants on
    # the same chip).  Frozen stages are excluded: stop_gradient
    # already prunes their backward graph, so XLA frees those
    # activations without help.  Numerics and the parameter tree are
    # unchanged (test_model.py locks both).
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_spatial: bool = False):
        stage_sizes = STAGE_SIZES[self.depth]
        block_cls = Bottleneck if self.depth in BOTTLENECK_DEPTHS else BasicBlock
        if ((self.groups != 1 or self.width_per_group != 64)
                and block_cls is not Bottleneck):
            # torchvision's rule: BasicBlock only supports the defaults
            raise ValueError(
                f"groups/width_per_group variants need a bottleneck depth "
                f"(50/101/152), got depth {self.depth}")
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

        fusable_stage = (self.fused_frozen_blocks
                         and block_cls is Bottleneck
                         and self.groups == 1
                         and self.width_per_group == 64
                         and self.bn_stats_mode == "trainable_only"
                         and self.dtype == jnp.bfloat16
                         and self.precision is None)
        for i, num_blocks in enumerate(stage_sizes):
            frozen = (i + 1) <= self.frozen_prefix
            norm = make_norm(frozen_stage=frozen)
            for j in range(num_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                kwargs = {}
                if block_cls is Bottleneck:
                    # j > 0 <=> identity block (j == 0 carries the
                    # projection shortcut, incl. layer1's 64->256)
                    kwargs = dict(fused=fusable_stage and frozen and j > 0,
                                  groups=self.groups,
                                  width_per_group=self.width_per_group,
                                  dtype=self.dtype)
                cls = block_cls
                if self.remat_blocks and not frozen:
                    # lifted transform: the variable tree/naming is
                    # preserved, so checkpoints interchange either way
                    cls = nn.remat(block_cls)
                x = cls(filters=self.num_filters * 2 ** i, stride=stride,
                        conv=conv, norm=norm,
                        name=f"{STAGE_NAMES[i]}_block{j}", **kwargs)(x)
            if (i + 1) == self.frozen_prefix:
                # Single cut: no backward graph for the frozen prefix.
                x = jax.lax.stop_gradient(x)

        if return_spatial:
            # pre-pool feature map (B, H', W', C) — the Grad-CAM surface
            # (irp_tpu.explain); parameter tree unchanged
            return x.astype(self.dtype)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, C)
        return x.astype(self.dtype)

    @property
    def num_features(self) -> int:
        mult = 4 if self.depth in BOTTLENECK_DEPTHS else 1
        return self.num_filters * 8 * mult

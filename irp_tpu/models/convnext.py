"""Flax ConvNeXt family (torchvision-compatible layout, Tiny-Large).

Beyond-reference model family (the reference stack is ResNet-only,
reference functions/model.py:15): the ConvNeXt-V1 ladder (Liu et al.
2022) as a fourth backbone that slots into the same ``Classifier`` head,
conversion, inference, serving, and explain paths as ResNet, ViT, and
EfficientNet.

Architecture mirrors ``torchvision.models.convnext`` exactly — a 4x4/4
patchify stem, four stages of CNBlocks (7x7 depthwise conv -> LayerNorm
-> Linear 4x expand -> exact GELU -> Linear project, with a learnable
per-channel layer scale initialized at 1e-6 and row-mode stochastic
depth on the residual branch), 2x2/2 LayerNorm+Conv downsampling between
stages, and a final LayerNorm on the pooled features — so pretrained
torchvision ``convnext_*`` checkpoints convert mechanically
(irp_tpu.models.convert).

Parameter naming (flax tree <-> torchvision state_dict):

- ``stem_conv`` / ``stem_ln``                <-> ``features.0.{0,1}``
- ``stage{s}_block{j}`` (s in 1..4)          <-> ``features.{2s-1}.{j}``
  with children ``dw_conv`` (block.0), ``ln`` (block.2),
  ``mlp_dense1`` (block.3), ``mlp_dense2`` (block.5), and the
  ``layer_scale`` leaf
- ``stage{s}_downsample_ln/_conv`` (s in 2..4) <-> ``features.{2s-2}.{0,1}``
- ``ln`` (final pooled-feature LayerNorm)    <-> ``classifier.0``

TPU-first details:
- NHWC layout end to end: torchvision's Permute sandwich around every
  block's LayerNorm/Linear pair disappears — channels already sit on the
  last axis, so the 1x1 "convs" are plain Dense matmuls the MXU eats
  directly, and LayerNorm reduces over the innermost (lane) dimension.
- bfloat16 compute with float32 params; no BatchNorm anywhere (LayerNorm
  has no running stats, so the frozen-BN fidelity trap of SURVEY §7 does
  not exist for this family and ``bn_stats_mode`` is irrelevant).
- Frozen-prefix semantics via a single ``stop_gradient`` cut after the
  last frozen stage (the downsample INTO stage s trains with stage s).
- The block MLP pair is named ``mlp_dense1``/``mlp_dense2`` on purpose:
  the mesh layout's Megatron rules (parallel/mesh.py) column-shard
  dense1 and row-shard dense2 by name, so ConvNeXt blocks pick up
  tensor parallelism with zero extra wiring.
- Optional ``nn.remat`` on trainable-stage blocks.

Trainable-stage names for ModelConfig.trainable_stages: ``stem``,
``stage1``..``stage4``, ``ln`` (the final LayerNorm).  The untouched
ResNet default ``('layer4',)`` auto-maps to the analogous last-stage
recipe ``('stage4', 'ln')`` — see convnext_default_trainable_stages.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

STAGE_COUNT = 4

# torchvision.models.convnext block settings: per-stage channel dims and
# block depths, plus each variant's stochastic_depth_prob default.
CONVNEXT_VARIANTS = {
    "tiny": dict(convnext_dims=(96, 192, 384, 768),
                 convnext_depths=(3, 3, 9, 3), stochastic_depth=0.1),
    "small": dict(convnext_dims=(96, 192, 384, 768),
                  convnext_depths=(3, 3, 27, 3), stochastic_depth=0.4),
    "base": dict(convnext_dims=(128, 256, 512, 1024),
                 convnext_depths=(3, 3, 27, 3), stochastic_depth=0.5),
    "large": dict(convnext_dims=(192, 384, 768, 1536),
                  convnext_depths=(3, 3, 27, 3), stochastic_depth=0.5),
}


def convnext_model_config(variant: str = "tiny", **overrides):
    """ModelConfig for a named torchvision ConvNeXt size
    (family='convnext').

    ``overrides`` pass through to ModelConfig (num_classes, image_size,
    dropout_rate, trainable_stages, ...) and take precedence over the
    variant's geometry (handy for scaled-down test doubles)."""
    from irp_tpu.config import ModelConfig

    if variant not in CONVNEXT_VARIANTS:
        raise ValueError(f"unknown ConvNeXt variant {variant!r} "
                         f"(one of {sorted(CONVNEXT_VARIANTS)})")
    return ModelConfig(family="convnext",
                       **{**CONVNEXT_VARIANTS[variant], **overrides})


def convnext_default_trainable_stages() -> tuple:
    """The ConvNeXt analog of the reference's freeze-all-but-layer4
    recipe (reference model.py:17-23): the last stage + the final
    pooled-feature LayerNorm."""
    return ("stage4", "ln")


class CNBlock(nn.Module):
    """torchvision CNBlock in NHWC: dw 7x7 -> LN -> Dense 4x -> GELU ->
    Dense -> layer_scale -> stochastic depth -> residual."""

    dim: int
    sd_prob: float
    dtype: Any = jnp.bfloat16
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = self.dim
        y = nn.Conv(dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=dim, use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    precision=self.precision, name="dw_conv")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="ln")(y)
        y = nn.Dense(4 * dim, dtype=self.dtype, param_dtype=jnp.float32,
                     precision=self.precision, name="mlp_dense1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU: exact erf
        y = nn.Dense(dim, dtype=self.dtype, param_dtype=jnp.float32,
                     precision=self.precision, name="mlp_dense2")(y)
        gamma = self.param("layer_scale",
                           nn.initializers.constant(1e-6), (dim,),
                           jnp.float32)
        y = y * gamma.astype(y.dtype)
        y = self._stochastic_depth(y, train)
        return x + y

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


class ConvNeXt(nn.Module):
    """Headless ConvNeXt returning pooled + LayerNormed features (B, C).

    ``frozen_prefix``: number of leading stages (0-4) treated as frozen;
    a stop_gradient is inserted after the last frozen stage (the stem is
    frozen whenever any stage is; the downsample into stage s sits after
    the cut when stage s is trainable).  Parameter freezing itself is the
    optimizer mask's job (irp_tpu.train.state.trainable_mask), as in the
    other families.

    ``from_spatial=True`` treats the input as an already-computed
    pre-pool spatial map and applies only pool + final LN — the Grad-CAM
    surface contract (Classifier.head_from_spatial): unlike ResNet /
    EfficientNet, pooling alone does not reproduce this family's feature
    vector because the final LayerNorm sits AFTER the pool
    (torchvision classifier.0).
    """

    dims: tuple = (96, 192, 384, 768)
    depths: tuple = (3, 3, 9, 3)
    dtype: Any = jnp.bfloat16
    frozen_prefix: int = 3
    stochastic_depth_prob: float = 0.1
    precision: Any = None
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_spatial: bool = False, from_spatial: bool = False):
        ln = partial(nn.LayerNorm, epsilon=1e-6, dtype=self.dtype,
                     param_dtype=jnp.float32)
        if from_spatial:
            x = jnp.mean(x.astype(self.dtype), axis=(1, 2))
            x = ln(name="ln")(x)
            return x.astype(self.dtype)
        conv = partial(nn.Conv, use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32, precision=self.precision)
        x = x.astype(self.dtype)
        x = conv(self.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                 name="stem_conv")(x)
        x = ln(name="stem_ln")(x)

        total_blocks = sum(self.depths)
        block_id = 0
        for i, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            s = i + 1
            frozen = s <= self.frozen_prefix
            if i > 0:
                x = ln(name=f"stage{s}_downsample_ln")(x)
                x = conv(dim, (2, 2), strides=(2, 2), padding="VALID",
                         name=f"stage{s}_downsample_conv")(x)
            for j in range(depth):
                # torchvision ConvNeXt scales by (total - 1), not total
                sd = (self.stochastic_depth_prob * block_id
                      / max(total_blocks - 1.0, 1.0))
                cls = CNBlock
                if self.remat_blocks and not frozen:
                    # lifted transform preserves the variable tree/naming
                    cls = nn.remat(CNBlock, static_argnums=(2,))
                x = cls(dim=dim, sd_prob=sd, dtype=self.dtype,
                        precision=self.precision,
                        name=f"stage{s}_block{j}")(x, train)
                block_id += 1
            if s == self.frozen_prefix:
                # Single cut: no backward graph for the frozen prefix.
                x = jax.lax.stop_gradient(x)

        if return_spatial:
            # pre-pool feature map (B, H', W', C) — the Grad-CAM surface
            # (irp_tpu.explain); recombine via from_spatial=True
            return x.astype(self.dtype)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, C)
        x = ln(name="ln")(x)  # torchvision classifier.0 (post-pool LN)
        return x.astype(self.dtype)

    @property
    def num_features(self) -> int:
        return self.dims[-1]

"""Flax Vision Transformer (torchvision-compatible layout).

Beyond-reference model family (the reference stack is ResNet-only,
reference functions/model.py:15): a ViT backbone that slots into the same
``Classifier`` head, conversion, inference, serving, and explain paths.
On TPU this is the most MXU-friendly family possible — the whole forward
is dense matmuls (patch-embed conv at stride=patch is itself one matmul
per patch), with no BatchNorm (LayerNorm has no running stats, so the
frozen-BN fidelity trap of SURVEY §7 does not exist here).

Architecture mirrors ``torchvision.models.vision_transformer`` exactly
(pre-LN encoder blocks, eps=1e-6, exact-erf GELU, CLS-token pooling) so
pretrained torchvision ``vit_*`` checkpoints convert mechanically
(irp_tpu.models.convert).  Parameter naming:

- ``conv_proj`` (patch embedding), ``class_token``, ``pos_embedding``
- ``block{i}``: ``ln1``, ``attn_q/attn_k/attn_v/attn_out``,
  ``ln2``, ``mlp_dense1``, ``mlp_dense2``
- ``ln`` (final encoder LayerNorm)

q/k/v are separate Dense layers (torchvision packs them as one
``in_proj``; conversion slices it) — separate projections keep whole
attention heads local when the kernel's output dim is sharded over the
'model' mesh axis (Megatron-style tensor parallelism), which a packed
[q;k;v] layout would interleave across devices.

TPU-first details shared with the ResNet family:
- bfloat16 compute, float32 params; attention softmax in f32.
- Frozen-prefix semantics via a single ``stop_gradient`` cut after the
  last frozen encoder block (prunes the whole backward graph for the
  frozen prefix, embedding included).
- Optional ``nn.remat`` on trainable blocks (activation recompute).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


# torchvision.models.vision_transformer's published sizes.  vit_h_14 is
# the one family member whose head_dim is not 64 (1280/16 = 80), so it
# carries an explicit num_heads; the others leave 0 = embed_dim // 64.
VIT_VARIANTS = {
    "b_16": dict(patch_size=16, embed_dim=768, num_layers=12, mlp_dim=3072),
    "b_32": dict(patch_size=32, embed_dim=768, num_layers=12, mlp_dim=3072),
    "l_16": dict(patch_size=16, embed_dim=1024, num_layers=24,
                 mlp_dim=4096),
    "l_32": dict(patch_size=32, embed_dim=1024, num_layers=24,
                 mlp_dim=4096),
    "h_14": dict(patch_size=14, embed_dim=1280, num_layers=32,
                 mlp_dim=5120, num_heads=16),
}


def vit_model_config(variant: str = "b_16", **overrides):
    """ModelConfig for a named torchvision ViT size (family='vit').

    ``overrides`` pass through to ModelConfig (num_classes, image_size,
    dropout_rate, trainable_stages, ...) and take precedence over the
    variant's geometry (handy for scaled-down test doubles)."""
    from irp_tpu.config import ModelConfig

    if variant not in VIT_VARIANTS:
        raise ValueError(f"unknown ViT variant {variant!r} "
                         f"(one of {sorted(VIT_VARIANTS)})")
    return ModelConfig(family="vit", **{**VIT_VARIANTS[variant],
                                        **overrides})


def resolve_num_heads(cfg) -> int:
    """The family's auto-heads rule: ``num_heads=0`` means head_dim 64
    (config.py num_heads note; true of every torchvision ViT but h_14).
    Kept in one place so the flax classifier and the torch fidelity
    reference can never disagree on head count."""
    return cfg.num_heads or cfg.embed_dim // 64


def vit_default_trainable_stages(num_layers: int) -> tuple:
    """The ViT analog of the reference's freeze-all-but-layer4 recipe
    (reference model.py:17-23): last encoder block + the final LayerNorm."""
    return (f"block{num_layers - 1}", "ln")


class EncoderBlock(nn.Module):
    """Pre-LN transformer block (torchvision EncoderBlock semantics:
    x = x + attn(ln_1(x)); x = x + mlp(ln_2(x)))."""

    embed_dim: int
    num_heads: int
    mlp_dim: int
    dtype: Any = jnp.bfloat16
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        e, h = self.embed_dim, self.num_heads
        assert e % h == 0, f"embed_dim {e} not divisible by num_heads {h}"
        d = e // h
        ln = partial(nn.LayerNorm, epsilon=1e-6, dtype=self.dtype,
                     param_dtype=jnp.float32)
        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=jnp.float32,
                        precision=self.precision)
        b, s, _ = x.shape

        y = ln(name="ln1")(x)
        q = dense(e, name="attn_q")(y).reshape(b, s, h, d)
        k = dense(e, name="attn_k")(y).reshape(b, s, h, d)
        v = dense(e, name="attn_v")(y).reshape(b, s, h, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            precision=self.precision) * (d ** -0.5)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        attn = attn.astype(self.dtype)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                       precision=self.precision).reshape(b, s, e)
        x = x + dense(e, name="attn_out")(y)

        y = ln(name="ln2")(x)
        y = dense(self.mlp_dim, name="mlp_dense1")(y)
        y = jax.nn.gelu(y, approximate=False)  # torchvision uses exact GELU
        y = dense(e, name="mlp_dense2")(y)
        return x + y


class VisionTransformer(nn.Module):
    """Headless ViT returning the CLS-token feature (B, embed_dim).

    ``frozen_prefix``: number of leading encoder blocks treated as frozen;
    a stop_gradient cut after the last frozen block prunes the backward
    graph for those blocks AND the patch/class/position embeddings
    upstream of it.  ``num_layers`` freezes the whole encoder stack
    (head-only fine-tuning; the final ``ln`` sits after the cut and stays
    differentiable — whether it *updates* is the optimizer mask's call,
    irp_tpu.train.state.trainable_mask).

    ``prefix_tokens`` / ``suffix_feature`` split the forward around the
    LAST encoder block: Grad-CAM for ViT differentiates (last block +
    final LN + head) w.r.t. the token sequence entering the last block —
    the standard ViT target layer (gradients w.r.t. the final-LN patch
    tokens are identically zero because only the CLS token reaches the
    head).  Neither method applies the stop_gradient cut (they exist for
    explain, which needs the gradient the cut would kill).
    """

    patch_size: int = 16
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    image_size: int = 224  # pins the pos_embedding length (torchvision too)
    dtype: Any = jnp.bfloat16
    frozen_prefix: int = 11
    precision: Any = None
    remat_blocks: bool = False

    def setup(self):
        self.conv_proj = nn.Conv(self.embed_dim,
                                 (self.patch_size, self.patch_size),
                                 strides=(self.patch_size, self.patch_size),
                                 padding="VALID", dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 precision=self.precision)
        self.class_token = self.param("class_token", nn.initializers.zeros,
                                      (1, 1, self.embed_dim), jnp.float32)
        grid = self.image_size // self.patch_size
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(stddev=0.02),
            (1, grid * grid + 1, self.embed_dim), jnp.float32)
        for i in range(self.num_layers):
            cls_block = EncoderBlock
            if self.remat_blocks and i >= self.frozen_prefix:
                # lifted transform preserves the variable tree/naming,
                # so checkpoints interchange either way
                cls_block = nn.remat(EncoderBlock)
            setattr(self, f"block{i}",
                    cls_block(embed_dim=self.embed_dim,
                              num_heads=self.num_heads,
                              mlp_dim=self.mlp_dim, dtype=self.dtype,
                              precision=self.precision))
        self.ln = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                               param_dtype=jnp.float32)

    def _embed(self, x):
        """Patchify + CLS + position -> (tokens (B,S,E), grid side)."""
        x = x.astype(self.dtype)
        x = self.conv_proj(x)
        b, gh, gw, e = x.shape
        if gh * gw + 1 != self.pos_embedding.shape[1]:
            raise ValueError(
                f"input gives a {gh}x{gw} patch grid but pos_embedding "
                f"was built for image_size={self.image_size} "
                f"(patch {self.patch_size})")
        x = x.reshape(b, gh * gw, e)
        cls = jnp.broadcast_to(self.class_token.astype(self.dtype),
                               (b, 1, e))
        x = jnp.concatenate([cls, x], axis=1)
        return x + self.pos_embedding.astype(self.dtype), gh, gw

    def __call__(self, x, train: bool = False,
                 return_spatial: bool = False):
        del train  # no BatchNorm / internal dropout: train == eval form
        x, gh, gw = self._embed(x)
        for i in range(self.num_layers):
            x = getattr(self, f"block{i}")(x)
            if i + 1 == self.frozen_prefix:
                # Single cut: no backward graph for the frozen prefix
                # (blocks 0..i, embeddings, class/pos tokens).
                x = jax.lax.stop_gradient(x)
        x = self.ln(x)
        if return_spatial:
            # post-LN patch-token grid (B, gh, gw, E).  NOTE: the
            # classification feature is the CLS token, not a pool of
            # this grid — Grad-CAM differentiates around the last block
            # instead (prefix_tokens/suffix_feature).
            b, _, e = x.shape
            return x[:, 1:].reshape(b, gh, gw, e)
        return x[:, 0]  # CLS token

    def prefix_tokens(self, x):
        """Embed + blocks 0..L-2: the token sequence entering the last
        block (B, S, E) — the ViT Grad-CAM surface.  No stop_gradient."""
        x, _, _ = self._embed(x)
        for i in range(self.num_layers - 1):
            x = getattr(self, f"block{i}")(x)
        return x

    def suffix_feature(self, tokens):
        """Last block + final LN + CLS pick: (B,S,E) -> (B,E).
        ``suffix_feature(prefix_tokens(x)) == __call__(x)`` exactly."""
        x = getattr(self, f"block{self.num_layers - 1}")(tokens)
        return self.ln(x)[:, 0]

    @property
    def num_features(self) -> int:
        return self.embed_dim

"""On-device mixup / CutMix batch mixing.

Beyond-reference training-recipe support (the reference trains with
geometric/color augmentation only, reference functions/dataload.py:11-58):
mixup (Zhang et al. 2018) blends each sample with its reversed-batch
partner by a Beta-drawn coefficient; CutMix (Yun et al. 2019) pastes a
rectangular patch of the partner instead.  Both are standard for the
ViT / EfficientNet families this framework adds.

TPU-first design: everything here is a pure jnp function traced inside
the jitted train step — the pairing is ``jnp.flip`` on the batch axis
(static, gather-free, shard-local under data parallelism: each device
mixes within its own shard, no cross-chip traffic), the CutMix patch is
an iota-comparison mask (static shapes, no dynamic slicing), and one
coefficient is drawn per step (batch-wise mixing) so the blend is a
scalar-weighted elementwise fuse XLA folds into the augmentation
pipeline.  Labels are NOT materialized as soft one-hots; the loss side
uses the two-term form lam*CE(y_a) + (1-lam)*CE(y_b)
(models/classifier.py::mixed_weighted_cross_entropy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cutmix_mask_and_lam(key, lam, height: int, width: int):
    """Rectangular patch mask from a Beta-drawn target lam.

    Patch side ratio sqrt(1-lam); the center is uniform over the image so
    border clipping can shrink the actual patch — lam is re-derived from
    the realized patch area (the standard CutMix adjustment).
    Returns (mask[H,W] float32 — 1 inside the patch, 0 outside — and the
    adjusted lam scalar)."""
    k_cx, k_cy = jax.random.split(key)
    ratio = jnp.sqrt(jnp.maximum(1.0 - lam, 0.0))
    cut_h = (height * ratio).astype(jnp.int32)
    cut_w = (width * ratio).astype(jnp.int32)
    cy = jax.random.randint(k_cy, (), 0, height)
    cx = jax.random.randint(k_cx, (), 0, width)
    y1 = jnp.clip(cy - cut_h // 2, 0, height)
    y2 = jnp.clip(cy + (cut_h - cut_h // 2), 0, height)
    x1 = jnp.clip(cx - cut_w // 2, 0, width)
    x2 = jnp.clip(cx + (cut_w - cut_w // 2), 0, width)
    rows = jnp.arange(height)
    cols = jnp.arange(width)
    mask = ((rows[:, None] >= y1) & (rows[:, None] < y2) &
            (cols[None, :] >= x1) & (cols[None, :] < x2))
    area = (y2 - y1) * (x2 - x1)
    lam_adj = 1.0 - area.astype(jnp.float32) / float(height * width)
    return mask.astype(jnp.float32), lam_adj


def mix_batch(x, labels, key, mixup_alpha: float = 0.0,
              cutmix_alpha: float = 0.0):
    """Mix a (B,H,W,C) batch with its reversed self.

    ``mixup_alpha`` / ``cutmix_alpha`` are STATIC Python floats (baked
    into the compiled step; part of the step-factory memo key).  When
    both are > 0 a per-step fair coin picks which transform applies
    (timm's switch_prob=0.5 convention).

    Returns ``(x_mixed, labels_a, labels_b, lam)`` where the loss
    contract is ``lam * loss(y_a) + (1 - lam) * loss(y_b)``; lam is an
    f32 scalar.  With both alphas 0 this is an identity passthrough
    (lam=1) — but prefer not tracing it at all in that case.
    """
    use_mixup = float(mixup_alpha) > 0.0
    use_cutmix = float(cutmix_alpha) > 0.0
    labels_b = jnp.flip(labels, axis=0)
    if not (use_mixup or use_cutmix):
        return x, labels, labels_b, jnp.float32(1.0)
    x2 = jnp.flip(x, axis=0)
    height, width = x.shape[1], x.shape[2]
    k_choice, k_mix, k_cut, k_box = jax.random.split(key, 4)

    def mixup_branch():
        lam = jax.random.beta(k_mix, mixup_alpha, mixup_alpha).astype(
            jnp.float32)
        mixed = x + (x2 - x) * (1.0 - lam).astype(x.dtype)
        return mixed, lam

    def cutmix_branch():
        lam0 = jax.random.beta(k_cut, cutmix_alpha, cutmix_alpha).astype(
            jnp.float32)
        mask, lam = _cutmix_mask_and_lam(k_box, lam0, height, width)
        patch = mask[None, :, :, None].astype(x.dtype)
        mixed = x * (1.0 - patch) + x2 * patch
        return mixed, lam

    if use_mixup and use_cutmix:
        pick_cut = jax.random.bernoulli(k_choice)
        xm, lam_m = mixup_branch()
        xc, lam_c = cutmix_branch()
        mixed = jnp.where(pick_cut, xc, xm)
        lam = jnp.where(pick_cut, lam_c, lam_m)
    elif use_mixup:
        mixed, lam = mixup_branch()
    else:
        mixed, lam = cutmix_branch()
    return mixed, labels, labels_b, lam

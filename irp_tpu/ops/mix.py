"""On-device mixup / CutMix batch mixing.

Beyond-reference training-recipe support (the reference trains with
geometric/color augmentation only, reference functions/dataload.py:11-58):
mixup (Zhang et al. 2018) blends each sample with a partner drawn from
the batch by a Beta-drawn coefficient; CutMix (Yun et al. 2019) pastes a
rectangular patch of the partner instead.  Both are standard for the
ViT / EfficientNet families this framework adds.

TPU-first design: everything here is a pure jnp function traced inside
the jitted train step.  Pairing reverses each device's LOCAL slice of
the batch (``_partner``): the (B, ...) batch sharded over the mesh's
'data' axis is viewed as (num_shards, B/num_shards, ...) — dim 0 stays
sharded, dim 1 is device-local — and flipped on dim 1, so the pairing
is static, gather-free, and genuinely shard-local (a plain
``jnp.flip(axis=0)`` on a GSPMD-sharded batch is a GLOBAL reverse that
compiles to a collective-permute shipping the full image batch across
chips every step).  The CutMix patch is an iota-comparison mask (static
shapes, no dynamic slicing), one coefficient is drawn per step
(batch-wise mixing), and both transforms share the single blend form
``x + (x2 - x) * w`` — w is a scalar (mixup) or an (H, W) mask
(CutMix) — so even with both alphas set only ONE full-batch
intermediate materializes inside the scanned whole-epoch program.
Labels are NOT materialized as soft one-hots; the loss side uses the
two-term form lam*CE(y_a) + (1-lam)*CE(y_b)
(models/classifier.py::mixed_weighted_cross_entropy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _partner(arr, num_shards: int):
    """Reversed-batch pairing within each data-parallel shard.

    With ``num_shards == 1`` this is the classic whole-batch reverse.
    For a batch sharded over dim 0 into ``num_shards`` equal slices, the
    (B, ...) -> (S, B/S, ...) reshape is shard-preserving under GSPMD
    (dim 0 carries the 'data' sharding, dim 1 is local), so the flip on
    dim 1 touches only device-local rows — no cross-chip traffic
    (verified: the compiled HLO contains no collective-permute).
    """
    if num_shards <= 1:
        return jnp.flip(arr, axis=0)
    b = arr.shape[0]
    if b % num_shards:
        raise ValueError(
            f"batch size {b} not divisible by num_shards={num_shards}")
    grouped = arr.reshape((num_shards, b // num_shards) + arr.shape[1:])
    return jnp.flip(grouped, axis=1).reshape(arr.shape)


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
              cutmix_alpha: float = 0.0, num_shards: int = 1):
    """Mix a (B,H,W,C) batch with its shard-locally reversed self.

    ``mixup_alpha`` / ``cutmix_alpha`` are STATIC Python floats (baked
    into the compiled step; part of the step-factory memo key), as is
    ``num_shards`` (the mesh's 'data'-axis size — see ``_partner``).
    When both alphas are > 0 a per-step fair coin picks which transform
    applies (timm's switch_prob=0.5 convention).

    Returns ``(x_mixed, labels_a, labels_b, lam)`` where the loss
    contract is ``lam * loss(y_a) + (1 - lam) * loss(y_b)``; lam is an
    f32 scalar.  With both alphas 0 this is an identity passthrough
    (lam=1) — but prefer not tracing it at all in that case.
    """
    use_mixup = float(mixup_alpha) > 0.0
    use_cutmix = float(cutmix_alpha) > 0.0
    labels_b = _partner(labels, num_shards)
    if not (use_mixup or use_cutmix):
        return x, labels, labels_b, jnp.float32(1.0)
    x2 = _partner(x, num_shards)
    height, width = x.shape[1], x.shape[2]
    k_choice, k_mix, k_cut, k_box = jax.random.split(key, 4)

    # Both transforms are the one blend x + (x2 - x) * w:
    #   mixup  -> w = (1 - lam) scalar
    #   CutMix -> w = patch mask (0/1 per pixel)
    # so the both-alphas case selects between an (H, W) weight map and a
    # scalar BEFORE touching the batch — one full-batch intermediate, not
    # two branches merged by a batch-sized where.
    if use_mixup:
        lam_m = jax.random.beta(k_mix, mixup_alpha, mixup_alpha).astype(
            jnp.float32)
    if use_cutmix:
        lam0 = jax.random.beta(k_cut, cutmix_alpha, cutmix_alpha).astype(
            jnp.float32)
        mask, lam_c = _cutmix_mask_and_lam(k_box, lam0, height, width)
    if use_mixup and use_cutmix:
        pick_cut = jax.random.bernoulli(k_choice)
        w = jnp.where(pick_cut, mask, 1.0 - lam_m)[None, :, :, None]
        lam = jnp.where(pick_cut, lam_c, lam_m)
    elif use_mixup:
        w = 1.0 - lam_m
        lam = lam_m
    else:
        w = mask[None, :, :, None]
        lam = lam_c
    mixed = x + (x2 - x) * w.astype(x.dtype)
    return mixed, labels, labels_b, lam

"""Synthetic dataset helpers for tests and benchmarks.

Generates class-separable random JPEG images (each class has a distinct mean
color + structured pattern so a classifier can actually learn) and writes
them as WebDataset shards with the reference sample schema
(reference data_curation.py:1006-1012).
"""

from __future__ import annotations

import io
import os

import numpy as np
from PIL import Image

from irp_tpu.data.tar import ShardWriter

CLASS_NAMES_POOL = [
    "cane", "cavallo", "elefante", "farfalla", "gallina",
    "gatto", "mucca", "pecora", "ragno", "scoiattolo",
]


def make_image(rng: np.random.Generator, class_idx: int, num_classes: int,
               size: int = 224) -> Image.Image:
    """Class-separable image: class-specific hue + frequency pattern."""
    base = np.zeros((size, size, 3), dtype=np.float32)
    hue = class_idx / max(num_classes, 1)
    color = np.array([
        0.5 + 0.5 * np.cos(2 * np.pi * hue),
        0.5 + 0.5 * np.cos(2 * np.pi * (hue + 1 / 3)),
        0.5 + 0.5 * np.cos(2 * np.pi * (hue + 2 / 3)),
    ], dtype=np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    pattern = 0.5 + 0.5 * np.sin(2 * np.pi * (class_idx + 1) * xx) * np.cos(
        2 * np.pi * (class_idx + 1) * yy)
    base += color[None, None, :] * pattern[:, :, None]
    noise = rng.normal(0, 0.08, size=(size, size, 3)).astype(np.float32)
    arr = np.clip((base + noise) * 255.0, 0, 255).astype(np.uint8)
    return Image.fromarray(arr, mode="RGB")


def make_hard_image(rng: np.random.Generator, class_idx: int,
                    num_classes: int, size: int = 224) -> Image.Image:
    """HARD class signal for convergence demos: identical color statistics
    for every class — the class is encoded as the (spatial frequency,
    mirror-symmetric orientation pair) of a low-contrast PLAID under
    per-pixel noise of the same magnitude, with random phase, brightness,
    and contrast.  Not separable by any single pixel or color statistic;
    a CNN must learn oriented band-pass filters.

    The code is deliberately invariant to the training augmentations, the
    way real semantic classes are: the plaid's mirror orientation pair
    {+theta, -theta} maps to itself under horizontal/vertical flips, and
    frequency levels are spaced 2x apart — far beyond the <=1.25x apparent-
    frequency shift of the 0.8-1.0 random-resized-crop scale jitter.  (An
    earlier single-orientation encoding over [0, pi) was label-ambiguous
    under flips: theta <-> pi-theta collapsed class pairs, capping accuracy
    near 60%.)"""
    n_freq = min(max(num_classes, 1), 5)
    n_orient = -(-num_classes // n_freq) if num_classes else 1
    freq = 4.0 * (2.0 ** (class_idx % n_freq))       # cycles/image: 4..64
    theta = (np.pi / 2) * ((class_idx // n_freq) + 0.5) / n_orient
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.full((size, size, 3), 0.5, dtype=np.float32)
    for sign in (1.0, -1.0):  # mirror pair -> flip-invariant
        fx, fy = np.cos(theta), sign * np.sin(theta)
        phase = rng.uniform(0, 2 * np.pi)
        contrast = rng.uniform(0.10, 0.16)
        img += contrast * np.sin(
            2 * np.pi * freq * (fx * xx + fy * yy) + phase)[..., None]
    img = img + rng.normal(0, 0.15, (size, size, 3)).astype(np.float32)
    img = 0.5 + rng.uniform(0.8, 1.2) * (img - 0.5) + rng.uniform(-0.08, 0.08)
    arr = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    return Image.fromarray(arr, mode="RGB")


def make_synthetic_shards(output_dir: str, num_classes: int = 4,
                          per_class: int = 30, samples_per_shard: int = 25,
                          seed: int = 0, size: int = 224,
                          prefix: str = "train", hard: bool = False):
    """Write synthetic shards; returns dict with paths and metadata."""
    rng = np.random.default_rng(seed)
    class_names = CLASS_NAMES_POOL[:num_classes]
    writer = ShardWriter(output_dir, prefix, samples_per_shard)
    order = []
    for c in range(num_classes):
        order += [c] * per_class
    rng.shuffle(order)
    image_fn = make_hard_image if hard else make_image
    with writer:
        for i, c in enumerate(order):
            img = image_fn(rng, c, num_classes, size)
            buf = io.BytesIO()
            img.save(buf, format="JPEG", quality=92)
            name = class_names[c]
            key = f"{name}_{i:06d}"
            writer.write({
                "__key__": key,
                "jpg": buf.getvalue(),
                "cls": name,
                "json": {"class": name, "id": key},
            })
    return {
        "dir": output_dir,
        "shards": writer.shard_paths,
        "class_names": class_names,
        "num_classes": num_classes,
        "total": writer.total,
    }

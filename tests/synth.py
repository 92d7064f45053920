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
    for every class — the class is encoded only as the ORIENTATION of a
    low-contrast grating under per-pixel noise of the same magnitude,
    with random phase, brightness, and contrast.  Not separable by any
    single pixel or color statistic; a CNN must learn oriented filters."""
    angle = np.pi * class_idx / max(num_classes, 1)
    fx, fy = np.cos(angle), np.sin(angle)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    phase = rng.uniform(0, 2 * np.pi)
    grating = np.sin(2 * np.pi * 8.0 * (fx * xx + fy * yy) + phase)
    contrast = rng.uniform(0.12, 0.22)
    img = 0.5 + contrast * grating[..., None] * np.ones(3, np.float32)
    img = img + rng.normal(0, 0.18, (size, size, 3)).astype(np.float32)
    img = 0.5 + rng.uniform(0.7, 1.3) * (img - 0.5) + rng.uniform(-0.1, 0.1)
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

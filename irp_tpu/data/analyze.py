"""Shard analysis: class inventory, label mapping, class weights.

Reproduces the reference ``analyze_webdataset`` contract (reference
functions/utility.py:18-123): one full pass over train shards counting the
``cls`` field; class names ordered most-common-first (utility.py:96-97 via
``Counter.most_common()`` — count descending, ties by first-seen order; this
ordering IS the label<->index mapping, SURVEY §2 #13); class weights are
inverse-frequency ``n / (k * freq)`` (utility.py:107-116).
"""

from __future__ import annotations

import collections
import glob
import os
from typing import Sequence

from irp_tpu.config import DatasetInfo
from irp_tpu.data.tar import iter_samples


def resolve_shards(path_pattern: str | Sequence[str]) -> list:
    """Expand a glob/dir/list into a sorted list of shard paths."""
    if isinstance(path_pattern, (list, tuple)):
        return list(path_pattern)
    if os.path.isdir(path_pattern):
        # reference semantics: a bare directory means its train shards
        # (utility.py label mapping comes from train data); fall back to
        # any .tar so test/val-only directories don't silently resolve
        # to nothing
        train = sorted(glob.glob(os.path.join(path_pattern, "train-*.tar")))
        return train or sorted(glob.glob(os.path.join(path_pattern,
                                                      "*.tar")))
    return sorted(glob.glob(path_pattern))


def analyze_webdataset(path_pattern: str | Sequence[str], verbose: bool = False) -> DatasetInfo:
    """Count classes across shards and derive the DatasetInfo.

    Mirrors reference utility.py:18-123 exactly in its outputs:
    - ``class_names``: by descending frequency, ties first-seen
    - ``class_weights[i] = total / (num_classes * count_i)``
    """
    shard_files = resolve_shards(path_pattern)
    if not shard_files:
        raise ValueError(f"No WebDataset shards found at {path_pattern}")

    class_counts: collections.Counter = collections.Counter()
    total = 0
    for sample in iter_samples(shard_files):
        cls = sample.get("cls")
        if cls is None:
            continue
        name = cls.decode("utf-8") if isinstance(cls, bytes) else cls
        class_counts[name] += 1
        total += 1

    ordered = class_counts.most_common()
    class_names = tuple(name for name, _ in ordered)
    counts = tuple(count for _, count in ordered)
    k = len(class_names)
    weights = tuple(total / (k * c) for c in counts)

    if verbose:
        print(f"Analyzed {len(shard_files)} shards: {total} samples, {k} classes")
        for name, count, w in zip(class_names, counts, weights):
            print(f"  {name}: {count} ({100.0 * count / total:.2f}%), weight {w:.4f}")

    return DatasetInfo(
        num_classes=k,
        class_names=class_names,
        class_weights=weights,
        class_counts=counts,
        total_samples=total,
    )

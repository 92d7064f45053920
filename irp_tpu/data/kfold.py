"""Stratified shard-level k-fold splitting.

Same algorithm as the reference ``create_stratified_kfolds`` (reference
functions/dataload.py:61-144): per-shard class histograms from one streaming
pass, a seeded shuffle of the shard list, then greedy assignment of each
shard to the fold with the currently-smallest total sample count
(dataload.py:119-129).  Folds are shard-level, not sample-level — a design
decision inherited as spec (SURVEY §2 #15).
"""

from __future__ import annotations

import collections
import random
from typing import Dict, List, Sequence

from irp_tpu.data.tar import iter_shard


def shard_class_histogram(shard_path: str) -> collections.Counter:
    counts: collections.Counter = collections.Counter()
    for sample in iter_shard(shard_path):
        cls = sample.get("cls")
        if cls is None:
            continue
        name = cls.decode("utf-8") if isinstance(cls, bytes) else cls
        counts[name] += 1
    return counts


def create_stratified_kfolds(
    shard_paths: Sequence[str],
    k: int = 5,
    seed: int = 42,
    verbose: bool = False,
    histograms: Dict[str, collections.Counter] | None = None,
) -> List[List[str]]:
    """Partition shards into k folds balancing total sample counts.

    ``histograms`` may be passed to skip re-reading every shard (the
    reference re-reads every shard on every hyperopt trial,
    dataload.py:78-93 — a deliberate perf fix here: the hyperopt driver
    computes histograms once and reuses them across trials).
    """
    if histograms is None:
        histograms = {p: shard_class_histogram(p) for p in shard_paths}

    order = list(shard_paths)
    rng = random.Random(seed)
    rng.shuffle(order)

    folds: List[List[str]] = [[] for _ in range(k)]
    fold_totals = [0] * k
    fold_class_counts = [collections.Counter() for _ in range(k)]

    for shard in order:
        idx = min(range(k), key=lambda i: fold_totals[i])
        folds[idx].append(shard)
        hist = histograms.get(shard, collections.Counter())
        fold_totals[idx] += sum(hist.values())
        fold_class_counts[idx].update(hist)

    if verbose:
        print(f"Created {k} folds:")
        for i, (fold, counts) in enumerate(zip(folds, fold_class_counts)):
            total = sum(counts.values())
            print(f"Fold {i + 1}: {len(fold)} shards, {total} samples")
            for cls, c in counts.most_common():
                print(f"  {cls}: {c} ({100.0 * c / max(total, 1):.2f}%)")

    return folds

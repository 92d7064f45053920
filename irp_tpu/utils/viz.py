"""Visualization: confusion heatmap, sample grids, prediction galleries,
training curves.

Covers the reference's matplotlib/seaborn outputs: confusion-matrix heatmap
(reference functions/final.py:380-391), correct/incorrect classification
grids (final.py:27-152), sample-image grid (data_curation.py:45-87), and
best-trial epoch curves (hyperopt.py:498-612).  All figures are written to
files (Agg backend) so they work headless and log as artifacts.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_confusion_matrix(cm: np.ndarray, class_names: Sequence[str],
                          path: str,
                          title: str = "Confusion Matrix") -> str:
    import seaborn as sns

    plt.figure(figsize=(12, 10))
    sns.heatmap(cm, annot=True, fmt="d", cmap="Blues",
                xticklabels=class_names, yticklabels=class_names)
    plt.xlabel("Predicted")
    plt.ylabel("True")
    plt.title(title)
    plt.tight_layout()
    plt.savefig(path)
    plt.close()
    return path


def plot_image_grid(images: Sequence[np.ndarray], titles: Sequence[str],
                    path: str, ncols: int = 5,
                    suptitle: Optional[str] = None) -> str:
    """uint8 HWC images in a grid with per-image titles."""
    n = len(images)
    if n == 0:
        return path
    ncols = min(ncols, n)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(3 * ncols, 3.2 * nrows))
    axes = np.atleast_1d(axes).reshape(-1)
    for ax in axes[n:]:
        ax.axis("off")
    for ax, img, title in zip(axes, images, titles):
        ax.imshow(img.astype(np.uint8))
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    if suptitle:
        fig.suptitle(suptitle)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def plot_history(history: Dict[str, List[float]], path: str) -> str:
    """train/val loss + accuracy curves (reference hyperopt.py:560-607).

    Series may be missing or of unequal length (a run killed mid-epoch,
    a no-validation final run): each gets its own epoch axis."""
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4.5))

    def _plot(ax, key, label):
        ys = history.get(key) or []
        if ys:
            ax.plot(range(1, len(ys) + 1), ys, label=label)
        return bool(ys)

    any1 = _plot(ax1, "train_loss", "train") | _plot(ax1, "val_loss", "val")
    ax1.set_xlabel("epoch"); ax1.set_ylabel("loss")
    if any1:
        ax1.legend()
    ax1.set_title("Loss")
    any2 = _plot(ax2, "train_acc", "train") | _plot(ax2, "val_acc", "val")
    ax2.set_xlabel("epoch"); ax2.set_ylabel("accuracy (%)")
    if any2:
        ax2.legend()
    ax2.set_title("Accuracy")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def plot_epoch_mean_std(epochs: Sequence[int], means: Sequence[float],
                        stds: Sequence[float], path: str,
                        title: str = "Cross-fold validation accuracy") -> str:
    means = np.asarray(means)
    stds = np.asarray(stds)
    plt.figure(figsize=(8, 5))
    plt.plot(epochs, means, marker="o")
    plt.fill_between(epochs, means - stds, means + stds, alpha=0.25)
    plt.xlabel("epoch"); plt.ylabel("val acc (%)")
    plt.title(title)
    plt.tight_layout()
    plt.savefig(path)
    plt.close()
    return path

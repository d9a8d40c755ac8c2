"""Plotting utilities.

Parity with reference ImageHelper (reference src/util/ImageHelper.py:32-306):
timestamps, de-standardized single-image display, 3x3 reconstruction grids,
heatmap / ground-truth / overlay grids with the jet colormap, loss-curve
plots from history dicts, and dataset-distribution bars. All figures return
matplotlib Figure objects; callers decide whether to save or log them.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def timestamp() -> str:
    """Filesystem-safe timestamp (reference ImageHelper.py:36-43)."""
    return time.strftime("%Y-%m-%d_%H-%M-%S")


def destandardize(
    image: np.ndarray, mean: Optional[np.ndarray], std: Optional[np.ndarray]
) -> np.ndarray:
    """Undo normalization for display (reference :45-64). image: [H,W,3]."""
    img = np.asarray(image, dtype=np.float64)
    if mean is not None and std is not None:
        img = img * np.asarray(std) + np.asarray(mean)
    return np.clip(img, 0.0, 1.0)


def show_image(
    image: np.ndarray,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    vmin: float = 0.0,
    vmax: float = 1.0,
) -> plt.Figure:
    """Single-image display with de-standardization (reference
    ImageHelper.show_image, src/util/ImageHelper.py:45-64). image: [H,W,C]
    (NHWC convention; the reference takes CHW and transposes — we are
    already channels-last). Returns the Figure so callers save/log it."""
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.imshow(destandardize(image, mean, std), vmin=vmin, vmax=vmax)
    ax.axis("off")
    fig.tight_layout()
    return fig


def plot_recons(recons: np.ndarray, n: int = 9) -> plt.Figure:
    """3x3 grid of reconstructions (reference :66-81). recons: [N,H,W,3] in
    [-1,1] or [0,1]."""
    n = min(n, recons.shape[0])
    side = int(np.ceil(np.sqrt(n)))
    fig, axes = plt.subplots(side, side, figsize=(3 * side, 3 * side))
    axes = np.atleast_1d(axes).ravel()
    for i, ax in enumerate(axes):
        ax.axis("off")
        if i < n:
            img = recons[i]
            if img.min() < 0:
                img = (img + 1.0) / 2.0
            ax.imshow(np.clip(img, 0, 1))
    fig.tight_layout()
    return fig


def plot_heatmaps(
    anomaly_maps: np.ndarray,
    ground_truth: np.ndarray,
    originals: Optional[np.ndarray] = None,
    vmin: float = 0.0,
    vmax: float = 1.0,
    n: int = 9,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
):
    """(heatmaps, ground truth, overlay) figures with the jet colormap
    (reference :83-150)."""
    n = min(n, anomaly_maps.shape[0])
    side = int(np.ceil(np.sqrt(n)))

    def grid(draw):
        fig, axes = plt.subplots(side, side, figsize=(3 * side, 3 * side))
        axes = np.atleast_1d(axes).ravel()
        for i, ax in enumerate(axes):
            ax.axis("off")
            if i < n:
                draw(ax, i)
        fig.tight_layout()
        return fig

    fig_heat = grid(
        lambda ax, i: ax.imshow(anomaly_maps[i], cmap="jet", vmin=vmin, vmax=vmax)
    )
    fig_gt = grid(lambda ax, i: ax.imshow(ground_truth[i], cmap="gray"))

    def overlay(ax, i):
        if originals is not None:
            ax.imshow(destandardize(originals[i], mean, std))
        ax.imshow(anomaly_maps[i], cmap="jet", vmin=vmin, vmax=vmax, alpha=0.4)

    fig_overlay = grid(overlay)
    return fig_heat, fig_gt, fig_overlay


def plot_loss_curves(history: Dict[str, List[float]]) -> plt.Figure:
    """Train/valid loss curves from a TrainResult.history dict
    (reference :152-222 plots from json files)."""
    fig, ax = plt.subplots(figsize=(8, 5))
    for key in ("train_loss", "valid_loss"):
        if key in history:
            ax.plot(history[key], label=key)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    fig.tight_layout()
    return fig


def plot_roc_curve(
    fpr: np.ndarray, tpr: np.ndarray, auc: float, title: str = "ROC"
) -> plt.Figure:
    """ROC display (reference ValidationHelper.calc_auroc uses sklearn's
    RocCurveDisplay, src/util/ValidationHelper.py:42-67)."""
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(fpr, tpr, label=f"AUC = {auc:.4f}")
    ax.plot([0, 1], [0, 1], "--", color="gray", linewidth=0.8)
    ax.set_xlabel("false positive rate")
    ax.set_ylabel("true positive rate")
    ax.set_title(title)
    ax.legend(loc="lower right")
    fig.tight_layout()
    return fig


def plot_pr_curve(
    precision: np.ndarray, recall: np.ndarray, auc: float,
    title: str = "precision-recall",
) -> plt.Figure:
    """PR display (reference ValidationHelper.py:180-183 uses
    PrecisionRecallDisplay)."""
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(recall, precision, label=f"PR-AUC = {auc:.4f}")
    ax.set_xlabel("recall")
    ax.set_ylabel("precision")
    ax.set_title(title)
    ax.legend(loc="lower left")
    fig.tight_layout()
    return fig


def plot_dataset_distribution(
    counts: Dict[str, int], title: str = "dataset distribution"
) -> plt.Figure:
    """Bar plot of per-class sample counts (reference :225-306)."""
    fig, ax = plt.subplots(figsize=(max(6, len(counts)), 4))
    ax.bar(list(counts.keys()), list(counts.values()))
    ax.set_title(title)
    ax.tick_params(axis="x", rotation=45)
    fig.tight_layout()
    return fig

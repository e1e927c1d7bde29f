"""Classifier figure writers with the reference's filenames.

Produces the per-run curves and CV bar charts that reference
train_classifier.py:289-451/:454-511 emits: {prefix}loss_curve.png,
{prefix}accuracy_curve.png, {prefix}synthetic_ratio_curve.png,
{prefix}cv_test_metrics_per_fold.png, {prefix}cv_test_loss_per_fold.png.
"""
from __future__ import annotations

import os
from typing import Dict, List

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from xgan.utils import check_create_dir  # noqa: E402


def _plot_curves(histories: List[Dict], train_key: str, val_key: str,
                 title: str, ylabel: str, path: str, run_prefix: str,
                 ratio_only: bool = False):
    plt.figure(figsize=(10, 6))
    train_series, val_series = [], []
    for h in histories:
        if ratio_only:
            vals = h.get("synthetic_ratio", [])
            if not vals:
                continue
            plt.plot(range(1, len(vals) + 1), vals, alpha=0.3, color="blue")
            train_series.append(vals)
        else:
            tv = h.get(train_key, [])
            vv = h.get(val_key, [])
            if not tv:
                continue
            ep = range(1, len(tv) + 1)
            plt.plot(ep, tv, alpha=0.3, color="blue")
            if vv:
                plt.plot(ep, vv, alpha=0.3, color="orange")
            train_series.append(tv)
            if vv:
                val_series.append(vv)
    if not train_series:
        print(f"Warning: no data for {title}; skipping plot.")
        plt.close()
        return

    def mean_over_common(series):
        # fold histories can have unequal epoch counts (fold-level resume
        # of a run whose --epochs changed); average over the common
        # prefix rather than crashing on a ragged array
        n = min(len(s) for s in series)
        return np.mean([s[:n] for s in series], axis=0)

    avg_t = mean_over_common(train_series)
    ep = range(1, len(avg_t) + 1)
    if ratio_only:
        plt.plot(ep, avg_t, "b-", label="Average Ratio", linewidth=2)
    else:
        plt.plot(ep, avg_t, "b-", label="Average Training", linewidth=2)
        if val_series:
            avg_v = mean_over_common(val_series)
            plt.plot(range(1, len(avg_v) + 1), avg_v, color="orange",
                     label="Average Validation", linewidth=2)
    plt.title(f"{title} - {run_prefix}" if run_prefix else title)
    plt.xlabel("Epoch")
    plt.ylabel(ylabel)
    plt.legend(bbox_to_anchor=(1.05, 1), loc="upper left")
    plt.grid(True)
    plt.tight_layout()
    plt.savefig(path, bbox_inches="tight")
    plt.close()
    print(f"Saved {path}")


_CV_METRICS = [("accuracy", "Accuracy"), ("weighted_precision", "Precision"),
               ("weighted_recall", "Recall"), ("weighted_f1_score",
                                               "F1 score")]


def plot_cv_bars(cv_results: Dict, figures_dir: str, run_prefix: str):
    folds = cv_results.get("folds", [])
    if not folds:
        return
    index = np.arange(len(folds))
    names = [f"Fold {i + 1}" for i in range(len(folds))]

    plt.figure(figsize=(12, 7))
    bar_w = 0.2
    colors = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728"]
    for i, (key, label) in enumerate(_CV_METRICS):
        vals = [m.get(key, 0.0) for m in folds]
        plt.bar(index + i * bar_w - 1.5 * bar_w, vals, bar_w, label=label,
                color=colors[i], alpha=0.8)
        avg = cv_results.get("average", {}).get(key)
        if avg is not None:
            plt.hlines(avg, index[0] - bar_w, index[-1] + 4 * bar_w,
                       colors=colors[i], linestyles="dashed",
                       label=f"Avg {label}: {avg:.3f}")
    plt.xlabel("Fold")
    plt.ylabel("Score")
    plt.title("Test Set Performance Metrics per Fold (Cross-Validation)")
    plt.xticks(index, names)
    plt.ylim(0, 1.05)
    plt.legend(loc="upper right", fontsize="small")
    plt.grid(True, linestyle="--", alpha=0.3)
    plt.tight_layout()
    path = os.path.join(figures_dir, f"{run_prefix}cv_test_metrics_per_fold.png")
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()
    print(f"Saved metrics plot to {path}")

    losses = [m.get("loss", np.nan) for m in folds]
    if not all(np.isnan(losses)):
        plt.figure(figsize=(10, 6))
        plt.bar(index, losses, color="#1f77b4", alpha=0.8,
                label="Test Loss")
        avg = cv_results.get("average", {}).get("loss")
        if avg is not None:
            plt.hlines(avg, index[0] - 0.5, index[-1] + 0.5, colors="red",
                       linestyles="dashed", label=f"Avg Loss: {avg:.4f}")
        plt.xlabel("Fold")
        plt.ylabel("Loss")
        plt.title("Test Set Loss per Fold (Cross-Validation)")
        plt.xticks(index, names)
        plt.legend(loc="upper right")
        plt.grid(True, linestyle="--", alpha=0.3)
        plt.tight_layout()
        path = os.path.join(figures_dir,
                            f"{run_prefix}cv_test_loss_per_fold.png")
        plt.savefig(path, dpi=300, bbox_inches="tight")
        plt.close()
        print(f"Saved loss plot to {path}")


def generate_plots(histories: List[Dict], figures_dir: str, run_prefix: str,
                   cv_results: Dict = None):
    """All per-run figures; histories is one dict (single run) or one per
    fold (CV)."""
    check_create_dir(figures_dir)
    _plot_curves(histories, "train_loss", "val_loss", "Training Loss",
                 "Loss", os.path.join(figures_dir,
                                      f"{run_prefix}loss_curve.png"),
                 run_prefix)
    _plot_curves(histories, "train_acc", "val_acc", "Training Accuracy",
                 "Accuracy", os.path.join(
                     figures_dir, f"{run_prefix}accuracy_curve.png"),
                 run_prefix)
    if any(h.get("synthetic_ratio") for h in histories):
        _plot_curves(histories, "", "", "Synthetic Data Ratio", "Ratio",
                     os.path.join(figures_dir,
                                  f"{run_prefix}synthetic_ratio_curve.png"),
                     run_prefix, ratio_only=True)
    if cv_results:
        plot_cv_bars(cv_results, figures_dir, run_prefix)

"""Metrics JSON writers — byte-level schema compatibility with the reference.

The JSON files are the de-facto public API consumed by the reference's
analyze_results.py (SURVEY.md §5):

- DCGAN:      gan_training_history.json with keys G_losses_iter,
              D_losses_iter, D_x_iter, D_G_z1_iter, D_G_z2_iter,
              G_losses_epoch, D_losses_epoch (train_gan.py:100-108)
- CGAN:       same + perceptual_losses, feature_matching_losses
              (train_cgan.py:127-128)
- WGAN-GP:    wgan_training_history.json with D_losses, G_losses,
              D_losses_epoch, G_losses_epoch (train_wggan.py:57)
- Classifier: {fold_N_}{strategy}_training_history.json with keys epoch,
              train_loss, train_acc, val_loss, val_acc, synthetic_ratio
              (train_classifier.py:95-102);
              {strategy}_cv_summary.json = {folds, average, std_dev}
              (:643-657); {strategy}_final_metrics.json =
              {config, metrics} (:681-688).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List

import numpy as np


def _pyify(obj):
    if isinstance(obj, dict):
        return {k: _pyify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_pyify(v) for v in obj]
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, np.ndarray):
        return [_pyify(v) for v in obj.tolist()]
    if hasattr(obj, "item") and getattr(obj, "ndim", None) == 0:
        return obj.item()
    return obj


def write_json(path: str, payload: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(_pyify(payload), f, indent=4)
    print(f"Saved metrics to {path}")


def cv_summary(fold_metrics: List[Dict[str, float]]) -> Dict[str, Any]:
    """{folds, average, std_dev} aggregation (train_classifier.py:640-647)."""
    keys = fold_metrics[0].keys()
    return {
        "folds": fold_metrics,
        "average": {k: float(np.mean([m[k] for m in fold_metrics]))
                    for k in keys},
        "std_dev": {k: float(np.std([m[k] for m in fold_metrics]))
                    for k in keys},
    }

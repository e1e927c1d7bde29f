"""Fold-level resume: a completed fold is loaded, not retrained."""
import argparse
import json

import pytest


def _args(fake_dataset, tmp_path, **over):
    base = dict(
        data_dir=fake_dataset["data_dir"],
        synthetic_dir=fake_dataset["synthetic_dir"],
        model_dir=str(tmp_path / "models"),
        output_dir=str(tmp_path / "results"),
        results_dir=str(tmp_path / "results/metrics"),
        figures_dir=str(tmp_path / "results/figures"),
        epochs=1, batch_size=8, lr=1e-3, unfreeze=False, k_folds=2,
        workers=0, use_synthetic=False, use_curriculum=False,
        curriculum_schedule="", pretrained_path="", parallel_folds=False,
        image_size=32, seed=0, compute_dtype="f32",
        cache_dir=str(tmp_path / "cache"), limit_batches=1, trace_dir="",
        resume_from="", cpu=True, resnet_stages=(1, 1, 1, 1))
    base.update(over)
    return argparse.Namespace(**base)


def test_fold_resume_skips_completed(fake_dataset, tmp_path, capsys):
    from xgan.train.classifier_loop import train_classifier
    args = _args(fake_dataset, tmp_path)
    first = train_classifier(args)
    assert len(first["folds"]) == 2

    # Second run with resume: both folds must be loaded, not retrained.
    args2 = _args(fake_dataset, tmp_path, resume_from="auto")
    second = train_classifier(args2)
    out = capsys.readouterr().out
    assert out.count("already trained") == 2
    # metrics reproduce from the same checkpoints
    for a, b in zip(first["folds"], second["folds"]):
        assert abs(a["accuracy"] - b["accuracy"]) < 1e-9


def test_fold_resume_retrains_incomplete(fake_dataset, tmp_path, capsys):
    from xgan.train.classifier_loop import train_classifier
    args = _args(fake_dataset, tmp_path)
    train_classifier(args)
    # Ask for MORE epochs than the stored fold histories: must retrain.
    args2 = _args(fake_dataset, tmp_path, resume_from="auto", epochs=2)
    train_classifier(args2)
    out = capsys.readouterr().out
    assert "already trained" not in out

"""Parallel k-fold CV: helpers + end-to-end run, and agreement of artifact
schemas with the sequential path."""
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.train.common import ModelState
from xgan.train.parallel_folds import (fold_epoch_batches, stack_states,
                                       unstack_state)


def test_stack_unstack_roundtrip():
    mk = lambda v: ModelState(params={"w": jnp.full((2, 2), v)},
                              batch_stats={"m": jnp.full((3,), v)},
                              opt_state=())
    stacked = stack_states([mk(1.0), mk(2.0), mk(3.0)])
    assert stacked.params["w"].shape == (3, 2, 2)
    s1 = unstack_state(stacked, 1)
    np.testing.assert_array_equal(np.asarray(s1.params["w"]),
                                  np.full((2, 2), 2.0))


def test_fold_epoch_batches_alignment():
    rng = np.random.default_rng(0)
    folds = [np.arange(10), np.arange(10, 16), np.arange(16, 40)]
    batches, n_valid = fold_epoch_batches(folds, 4, rng)
    # longest fold (24 items) dictates ceil(24/4)=6 batches
    assert batches.shape == (6, 3, 4)
    np.testing.assert_array_equal(n_valid, [10, 6, 24])
    for f, fi in enumerate(folds):
        flat = batches[:, f, :].reshape(-1)
        # the first n_valid entries cover the fold exactly once
        assert set(flat[:n_valid[f]].tolist()) == set(fi.tolist())
        # all entries stay within the fold's index set
        assert set(flat.tolist()) <= set(fi.tolist())


@pytest.mark.parametrize("strategy", ["baseline", "curriculum"])
def test_parallel_cv_end_to_end(fake_dataset, tmp_path, strategy):
    from xgan.train.classifier_loop import train_classifier
    args = argparse.Namespace(
        data_dir=fake_dataset["data_dir"],
        synthetic_dir=fake_dataset["synthetic_dir"],
        model_dir=str(tmp_path / "models"),
        output_dir=str(tmp_path / "results"),
        results_dir=str(tmp_path / "results/metrics"),
        figures_dir=str(tmp_path / "results/figures"),
        epochs=1, batch_size=8, lr=1e-3, unfreeze=False, k_folds=2,
        workers=0, use_synthetic=strategy != "baseline",
        use_curriculum=strategy == "curriculum",
        curriculum_schedule="0:0.5", pretrained_path="",
        parallel_folds=True, image_size=32, seed=0, compute_dtype="f32",
        cache_dir=str(tmp_path / "cache"), limit_batches=2, trace_dir="",
        cpu=True, resnet_stages=(1, 1, 1, 1))
    summary = train_classifier(args)
    assert len(summary["folds"]) == 2
    md = tmp_path / "results/metrics"
    assert (md / f"{strategy}_cv_summary.json").exists()
    for fold in (1, 2):
        h = json.loads(
            (md / f"fold_{fold}_{strategy}_training_history.json")
            .read_text())
        assert list(h.keys()) == ["epoch", "train_loss", "train_acc",
                                  "val_loss", "val_acc", "synthetic_ratio"]
        assert (tmp_path / "models" /
                f"fold_{fold}_{strategy}_resnet50.msgpack").exists()

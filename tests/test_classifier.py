"""Classifier path tests: curriculum parser goldens, mixer distribution,
concat gather, and the end-to-end CV flow on fixture data."""
import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.data.mixer import mix_batch
from xgan.train.classifier import gather_concat
from xgan.train.curriculum import (get_current_synthetic_ratio,
                                   parse_curriculum_schedule)


def test_parse_schedule_golden():
    # cases from reference train_classifier.py:27-63 semantics
    s = parse_curriculum_schedule("0:0.0, 5:0.25, 10:0.5")
    assert s == {0: 0.0, 5: 0.25, 10: 0.5}
    # epoch 0 implicitly added
    s = parse_curriculum_schedule("5:0.25")
    assert s == {0: 0.0, 5: 0.25}
    # sorted
    s = parse_curriculum_schedule("10:0.5,5:0.25")
    assert list(s.keys()) == [0, 5, 10]
    assert parse_curriculum_schedule("") == {}
    with pytest.raises(ValueError):
        parse_curriculum_schedule("5:1.5")
    with pytest.raises(ValueError):
        parse_curriculum_schedule("bogus")


def test_current_ratio_lookup():
    s = parse_curriculum_schedule("0:0.0, 5:0.25, 10:0.5")
    assert get_current_synthetic_ratio(0, s) == 0.0
    assert get_current_synthetic_ratio(4, s) == 0.0
    assert get_current_synthetic_ratio(5, s) == 0.25
    assert get_current_synthetic_ratio(9, s) == 0.25
    assert get_current_synthetic_ratio(100, s) == 0.5
    assert get_current_synthetic_ratio(3, {}) == 0.0


def test_gather_concat_spaces():
    real = jnp.arange(4 * 2 * 2 * 3, dtype=jnp.uint8).reshape(4, 2, 2, 3)
    synth = (100 + jnp.arange(2 * 2 * 2 * 3, dtype=jnp.uint8)
             ).reshape(2, 2, 2, 3)
    rl = jnp.array([0, 1, 0, 1], jnp.int32)
    sl = jnp.array([1, 1], jnp.int32)
    idx = jnp.array([0, 3, 4, 5])  # two real, two synthetic
    imgs, labels = gather_concat(real, rl, synth, sl, idx)
    np.testing.assert_array_equal(np.asarray(imgs[0]), np.asarray(real[0]))
    np.testing.assert_array_equal(np.asarray(imgs[1]), np.asarray(real[3]))
    np.testing.assert_array_equal(np.asarray(imgs[2]), np.asarray(synth[0]))
    np.testing.assert_array_equal(np.asarray(imgs[3]), np.asarray(synth[1]))
    np.testing.assert_array_equal(np.asarray(labels), [0, 1, 1, 1])


def test_mixer_distribution():
    """Bernoulli(ratio) substitution with synthetic label 1
    (PhasedAugmentedDataset semantics, data_loader.py:524-539)."""
    n_r, n_s, b = 64, 32, 512
    real = jnp.zeros((n_r, 2, 2, 3), jnp.uint8)
    synth = jnp.full((n_s, 2, 2, 3), 255, jnp.uint8)
    rl = jnp.zeros((n_r,), jnp.int32)
    sl = jnp.ones((n_s,), jnp.int32)
    idx = jnp.arange(b) % n_r
    for ratio in [0.0, 0.25, 1.0]:
        imgs, labels = mix_batch(real, rl, idx, synth, sl,
                                 jnp.float32(ratio), jax.random.key(0))
        frac = float(jnp.mean(labels.astype(jnp.float32)))
        assert abs(frac - ratio) < 0.08
        # synthetic rows are all-255 images
        synth_rows = np.asarray(imgs)[np.asarray(labels) == 1]
        if synth_rows.size:
            assert (synth_rows == 255).all()


def _clf_args(fake_dataset, tmp_path, **over):
    base = dict(
        data_dir=fake_dataset["data_dir"],
        synthetic_dir=fake_dataset["synthetic_dir"],
        model_dir=str(tmp_path / "models"),
        output_dir=str(tmp_path / "results"),
        results_dir=str(tmp_path / "results/metrics"),
        figures_dir=str(tmp_path / "results/figures"),
        epochs=1, batch_size=8, lr=1e-3, unfreeze=False, k_folds=2,
        workers=0, use_synthetic=False, use_curriculum=False,
        curriculum_schedule="0:0.0, 5:0.25, 10:0.5", pretrained_path="",
        image_size=32, seed=0, compute_dtype="f32",
        cache_dir=str(tmp_path / "cache"), limit_batches=2, trace_dir="",
        cpu=True, resnet_stages=(1, 1, 1, 1))
    base.update(over)
    return argparse.Namespace(**base)


@pytest.mark.parametrize("strategy", ["baseline", "augmented", "curriculum"])
def test_classifier_cv_end_to_end(fake_dataset, tmp_path, strategy):
    from xgan.train.classifier_loop import train_classifier
    args = _clf_args(
        fake_dataset, tmp_path,
        use_synthetic=strategy != "baseline",
        use_curriculum=strategy == "curriculum",
        curriculum_schedule="0:0.5")
    summary = train_classifier(args)
    assert set(summary.keys()) == {"folds", "average", "std_dev"}
    assert len(summary["folds"]) == 2
    for m in summary["folds"]:
        # reference keys (train_classifier.py:241-247) + our auroc extra
        assert {"loss", "accuracy", "weighted_precision",
                "weighted_recall",
                "weighted_f1_score"} <= set(m.keys())
        assert "auroc" in m

    md = tmp_path / "results/metrics"
    assert (md / f"{strategy}_cv_summary.json").exists()
    for fold in (1, 2):
        hp = md / f"fold_{fold}_{strategy}_training_history.json"
        assert hp.exists()
        h = json.loads(hp.read_text())
        assert list(h.keys()) == ["epoch", "train_loss", "train_acc",
                                  "val_loss", "val_acc", "synthetic_ratio"]
        assert (tmp_path / "models" /
                f"fold_{fold}_{strategy}_resnet50.msgpack").exists()
        # torchvision-format twin for the reference analyzer's Grad-CAM
        assert (tmp_path / "models" /
                f"fold_{fold}_{strategy}_resnet50.pth").exists()
    figs = tmp_path / "results/figures"
    assert (figs / f"{strategy}_loss_curve.png").exists()
    assert (figs / f"{strategy}_accuracy_curve.png").exists()
    assert (figs / f"{strategy}_cv_test_metrics_per_fold.png").exists()


def test_wraparound_padding_excluded_from_metrics(fake_dataset, tmp_path):
    """Non-multiple batch size: the tail batch wraps duplicate rows for
    static shapes, and the reported per-epoch metrics must cover exactly
    the n real rows. (Since round 3 the padded duplicates are also
    excluded from gradients/BN via the tail mask — tests/test_tail_exact
    pins that; this test pins the metrics path and that the mask is
    handed to the step for exactly the final batch.)"""
    import jax
    from xgan.data.pipeline import epoch_batches
    from xgan.train.classifier_loop import _epoch_pass

    n, bsz = 21, 8  # 3 batches, 3 padded rows in the last
    rng = np.random.default_rng(0)
    batches = epoch_batches(n, bsz, rng)
    assert batches.shape == (3, 8)
    flat = batches.reshape(-1)
    assert sorted(flat[:n].tolist()) == list(range(n))  # exact permutation
    assert set(flat[n:].tolist()) <= set(range(n))      # wrap duplicates

    class Store:
        images = jnp.arange(n, dtype=jnp.int32)
        labels = jnp.zeros((n,), jnp.int32)

    seen = []

    masks = []

    def fake_step(state, r_img, r_lab, s_img, s_lab, idx, ratio, key,
                  mask=None):
        seen.append(np.asarray(idx))
        masks.append(None if mask is None else np.asarray(mask))
        # per-sample loss = the sample's index value; preds==labels
        losses = jnp.take(r_img, idx).astype(jnp.float32)
        labels = jnp.take(r_lab, idx)
        return state, losses, labels, labels

    _, loss, acc = _epoch_pass(fake_step, None, (Store, Store), batches,
                               jnp.float32(0.0), jax.random.key(0), n)
    # mean over exactly the n real rows: indices 0..n-1 each once
    assert abs(loss - np.arange(n).mean()) < 1e-6
    assert acc == 1.0
    assert sum(s.size for s in seen) == 24  # static shapes: dups present
    # the tail mask arrives on exactly the final batch, zeroing the dups
    assert masks[0] is None and masks[1] is None
    np.testing.assert_array_equal(masks[2], [1, 1, 1, 1, 1, 0, 0, 0])


def test_empty_synthetic_dir_fallback(fake_dataset, tmp_path):
    """An existing-but-empty synthetic dir must not error (VERDICT r1 #10;
    reference data_loader.py:509-510,527-536): curriculum substitutes
    random real positives per synthetic draw, plain augmentation
    concatenates nothing. A MISSING dir still errors cleanly."""
    from xgan.train.classifier_loop import train_classifier
    empty = tmp_path / "empty_synth"
    empty.mkdir()

    args = _clf_args(fake_dataset, tmp_path / "cur", k_folds=1,
                     use_synthetic=True, use_curriculum=True,
                     curriculum_schedule="0:1.0",
                     synthetic_dir=str(empty))
    metrics = train_classifier(args)
    assert metrics is not None and 0.0 <= metrics["accuracy"] <= 1.0

    args = _clf_args(fake_dataset, tmp_path / "aug", k_folds=1,
                     use_synthetic=True, synthetic_dir=str(empty))
    metrics = train_classifier(args)
    assert metrics is not None and 0.0 <= metrics["accuracy"] <= 1.0

    args = _clf_args(fake_dataset, tmp_path / "missing", k_folds=1,
                     use_synthetic=True,
                     synthetic_dir=str(tmp_path / "nope"))
    assert train_classifier(args) is None


def test_classifier_single_run(fake_dataset, tmp_path):
    from xgan.train.classifier_loop import train_classifier
    args = _clf_args(fake_dataset, tmp_path, k_folds=1)
    metrics = train_classifier(args)
    assert 0.0 <= metrics["accuracy"] <= 1.0
    fm = tmp_path / "results/metrics/baseline_final_metrics.json"
    data = json.loads(fm.read_text())
    assert set(data.keys()) == {"config", "metrics"}
    assert data["config"]["k_folds"] == 1


def test_mix_batch_synth_pool_draws_only_pool_rows():
    """pooled empty-synthetic fallback: with synth_pool set, every
    synthetic draw must resolve to a pool row of the aliased real store
    (zero-copy reference fallback, mixer.mix_batch)."""
    import jax
    from xgan.data.mixer import mix_batch
    n = 16
    real = (jnp.arange(n, dtype=jnp.uint8)[:, None, None, None]
            * jnp.ones((1, 4, 4, 3), jnp.uint8))
    labels = jnp.zeros((n,), jnp.int32).at[jnp.asarray([5, 7])].set(1)
    pool = jnp.asarray([5, 7], jnp.int32)
    idx = jnp.arange(8, dtype=jnp.int32)
    imgs, labs = mix_batch(real, labels, idx, real, labels,
                           jnp.float32(1.0), jax.random.key(0),
                           synth_pool=pool)
    rows = set(np.asarray(imgs[:, 0, 0, 0]).tolist())
    assert rows <= {5, 7}
    assert np.all(np.asarray(labs) == 1)

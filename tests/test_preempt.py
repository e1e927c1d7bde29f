"""Preemption-safe shutdown (loop_common.GracefulShutdown): SIGTERM →
epoch-boundary checkpoint → clean exit 0 → ``--resume-from auto``
continues the run. TPU pods send SIGTERM ahead of maintenance; the
reference loop would die and lose everything since its last write-only
checkpoint."""
import json
import os
import signal
import subprocess
import sys

import pytest

SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src")


def test_graceful_shutdown_unit():
    """First signal sets the flag; second raises KeyboardInterrupt
    (stop NOW, finally blocks still run); restore() reinstates the
    previous handlers."""
    from xgan.train.loop_common import GracefulShutdown

    prev = signal.getsignal(signal.SIGTERM)
    sd = GracefulShutdown()
    sd.install()
    try:
        os.kill(os.getpid(), signal.SIGTERM)
        assert sd.requested
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGTERM)
    finally:
        sd.restore()
    assert signal.getsignal(signal.SIGTERM) is prev
    # off the main thread: install degrades to an inert flag (tests
    # drive the loops from worker threads)
    import threading

    def worker():
        sd2 = GracefulShutdown()
        sd2.install()
        assert not sd2.requested
        sd2.restore()

    t = threading.Thread(target=worker)
    t.start()
    t.join(timeout=10)
    assert signal.getsignal(signal.SIGTERM) is prev


def test_checkpoint_boundary_latches_once():
    """The gate must read shutdown.requested exactly ONCE: a signal
    landing between a save-gate read and a break-check read would stop
    the loop WITHOUT the snapshot the preempt notice promises. The
    flip-flop stub returns False on its first read and True after —
    a two-read implementation would return stop=True with no save."""
    from xgan.train.loop_common import checkpoint_boundary

    class FlipFlop:
        def __init__(self):
            self.reads = 0

        @property
        def requested(self):
            self.reads += 1
            return self.reads > 1

    saved = []
    ff = FlipFlop()
    stop = checkpoint_boundary(ff, epoch=0, epochs=10, interval=10,
                               save=lambda: saved.append(1))
    assert ff.reads == 1  # single latched read
    assert not stop and not saved  # signal after the read: next boundary

    class Always:
        requested = True

    # preempt mid-run: save forced off-interval, stop requested
    stop = checkpoint_boundary(Always(), epoch=0, epochs=10, interval=10,
                               save=lambda: saved.append(2))
    assert stop and saved == [2]
    # preempt on the final epoch: save happens, loop just ends normally
    stop = checkpoint_boundary(Always(), epoch=9, epochs=10, interval=10,
                               save=lambda: saved.append(3))
    assert not stop and saved == [2, 3]


def test_sigterm_checkpoints_and_resume_completes(fake_dataset, tmp_path):
    """Real-signal e2e on the DCGAN trainer: SIGTERM mid-run → the loop
    finishes the epoch, force-saves an off-interval snapshot, exits 0
    with the resume message; a --resume-from auto rerun completes the
    full epoch count with a merged history."""
    out = tmp_path / "run"
    args = [sys.executable, "-u", os.path.join(SRC, "train_gan.py"),
            "--cpu", "--data-dir", fake_dataset["data_dir"],
            "--model-dir", str(out / "models"),
            "--output-dir", str(out / "results"),
            "--results-dir", str(out / "results/metrics"),
            "--figures-dir", str(out / "results/figures"),
            "--cache-dir", str(out / "cache"),
            "--image-size", "32", "--feature-maps-g", "8",
            "--feature-maps-d", "8", "--latent-dim", "16",
            "--epochs", "12", "--batch-size", "8",
            "--vis-batch-size", "8", "--save-interval", "1000"]
    p = subprocess.Popen(args, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    sent, lines = False, []
    for ln in p.stdout:
        lines.append(ln)
        if not sent and "Epoch 2/12 Summary" in ln:
            p.send_signal(signal.SIGTERM)
            sent = True
    rc = p.wait(timeout=120)
    text = "".join(lines)
    assert sent, text
    assert rc == 0, text  # clean exit, reference early-return convention
    assert "Received signal" in text and "Preempted" in text, text
    snap = out / "models/gan/snapshot_last.msgpack"
    assert snap.exists(), text
    # checkpoint-interval is the default 10 but the run stopped around
    # epoch 3-4: the preempt save must have been forced off-interval
    hist_path = out / "results/metrics/gan_training_history.json"
    stopped = len(json.loads(hist_path.read_text())["G_losses_epoch"])
    assert 3 <= stopped < 12, stopped

    done = subprocess.run(args + ["--resume-from", "auto"],
                          capture_output=True, text=True, timeout=600)
    assert done.returncode == 0, done.stdout + done.stderr
    assert f"at epoch {stopped}" in done.stdout, done.stdout
    hist = json.loads(hist_path.read_text())
    assert len(hist["G_losses_epoch"]) == 12
    assert (out / "models/gan/generator_final.msgpack").exists()


class _Preempted:
    """Stand-in shutdown whose flag is already raised: deterministic
    (no signal-timing race) driver for the loop-side semantics."""

    requested = True

    def install(self):
        return self

    def restore(self):
        pass


def test_classifier_preempt_fold_semantics(fake_dataset, tmp_path,
                                           monkeypatch):
    """A fold preempted mid-way must NOT look complete: its history
    file is withheld (fold-level resume retrains it — a fold that
    trained fewer epochs would silently bias the CV summary), no
    cv_summary is written, and the run returns cleanly. A later
    resume run completes and writes the summary."""
    import argparse

    from xgan.train import classifier_loop

    def clf_args(**over):
        base = dict(
            data_dir=fake_dataset["data_dir"],
            synthetic_dir=fake_dataset["synthetic_dir"],
            model_dir=str(tmp_path / "models"),
            output_dir=str(tmp_path / "results"),
            results_dir=str(tmp_path / "results/metrics"),
            figures_dir=str(tmp_path / "results/figures"),
            epochs=2, batch_size=8, lr=1e-3, unfreeze=False, k_folds=2,
            workers=0, use_synthetic=False, use_curriculum=False,
            curriculum_schedule="0:0.0, 5:0.25, 10:0.5",
            pretrained_path="", image_size=32, seed=0,
            compute_dtype="f32", cache_dir=str(tmp_path / "cache"),
            limit_batches=2, trace_dir="", cpu=True,
            resnet_stages=(1, 1, 1, 1))
        base.update(over)
        return argparse.Namespace(**base)

    monkeypatch.setattr(classifier_loop, "GracefulShutdown",
                        lambda *a, **k: _Preempted())
    assert classifier_loop.train_classifier(clf_args()) is None
    metrics_dir = tmp_path / "results/metrics"
    # fold 1 broke after epoch 1 of 2: no completion artifacts
    assert not (metrics_dir / "fold_1_baseline_training_history.json"
                ).exists()
    assert not (metrics_dir / "baseline_cv_summary.json").exists()

    monkeypatch.undo()
    summary = classifier_loop.train_classifier(
        clf_args(resume_from="auto"))
    assert summary is not None
    assert (metrics_dir / "baseline_cv_summary.json").exists()
    hist = json.loads((metrics_dir /
                       "fold_1_baseline_training_history.json").read_text())
    assert len(hist["epoch"]) == 2


def test_parallel_folds_preempt_semantics(fake_dataset, tmp_path,
                                          monkeypatch):
    """--parallel-folds preempt: the lockstep program leaves ALL folds
    incomplete at a boundary stop, so run_parallel_cv withholds every
    fold history and the caller writes no cv_summary (incomplete folds
    averaged into the summary would silently bias it); a fresh rerun
    trains from scratch and writes the full artifacts."""
    import argparse

    from xgan.train import classifier_loop, parallel_cv

    def clf_args(**over):
        base = dict(
            data_dir=fake_dataset["data_dir"],
            synthetic_dir=fake_dataset["synthetic_dir"],
            model_dir=str(tmp_path / "models"),
            output_dir=str(tmp_path / "results"),
            results_dir=str(tmp_path / "results/metrics"),
            figures_dir=str(tmp_path / "results/figures"),
            epochs=2, batch_size=8, lr=1e-3, unfreeze=False, k_folds=2,
            workers=0, use_synthetic=False, use_curriculum=False,
            curriculum_schedule="0:0.0, 5:0.25, 10:0.5",
            pretrained_path="", image_size=32, seed=0,
            compute_dtype="f32", cache_dir=str(tmp_path / "cache"),
            limit_batches=2, trace_dir="", cpu=True,
            resnet_stages=(1, 1, 1, 1), parallel_folds=True)
        base.update(over)
        return argparse.Namespace(**base)

    monkeypatch.setattr(parallel_cv, "GracefulShutdown",
                        lambda *a, **k: _Preempted())
    assert classifier_loop.train_classifier(clf_args()) is None
    metrics_dir = tmp_path / "results/metrics"
    assert not (metrics_dir / "fold_1_baseline_training_history.json"
                ).exists()
    assert not (metrics_dir / "fold_2_baseline_training_history.json"
                ).exists()
    assert not (metrics_dir / "baseline_cv_summary.json").exists()

    monkeypatch.undo()
    summary = classifier_loop.train_classifier(clf_args())
    assert summary is not None
    assert (metrics_dir / "baseline_cv_summary.json").exists()
    for f in (1, 2):
        hist = json.loads(
            (metrics_dir /
             f"fold_{f}_baseline_training_history.json").read_text())
        assert len(hist["epoch"]) == 2

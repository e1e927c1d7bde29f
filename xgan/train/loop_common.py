"""Shared pieces of the three GAN epoch drivers.

gan_loop / wgan_loop / cgan_loop intentionally keep their step dispatch
inline (step signatures and metric shapes differ per trainer), but the
resume-history merge, the data-order RNG replay, and the sample-sheet
cadence are identical by contract — drifting copies of those caused the
round-2 --trace-dir gap, so they live here once.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

from xgan.data.pipeline import epoch_batches


class GracefulShutdown:
    """Preemption-safe shutdown: SIGTERM/SIGINT → checkpoint → exit 0.

    TPU pods are preempted with a SIGTERM grace window ahead of
    maintenance/evictions; the reference loop would simply die and lose
    everything since its last write-only checkpoint. Between install()
    and restore() (context-manager form works too; the loops call
    restore() from their existing finally) the FIRST signal only sets a
    flag; the train loops
    poll it at their epoch boundary (the snapshot/RNG-replay resume
    granularity — saving mid-epoch state would break the
    straight==resumed equality the resume tests pin), force a snapshot
    even off --checkpoint-interval, and return cleanly so an
    orchestrator restart with --resume-from auto continues the run. A
    SECOND signal raises KeyboardInterrupt immediately — the loops'
    try/finally still flushes queued async checkpoint bytes on that
    path, so "stop NOW" never silently drops writes already reported.

    Handler installation is a no-op off the main thread (tests drive
    the loops from worker threads; signal.signal raises there), and the
    previous handlers are restored on exit so nested/sequential runs in
    one process (parallel CV folds, the pipeline demo) don't leak them.
    """

    def __init__(self, what: str = "training"):
        self.requested = False
        self._what = what
        self._prev = {}

    def install(self):
        import signal
        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                self._prev[sig] = signal.signal(sig, self._handle)
        except ValueError:  # not the main thread: degrade to inert flag
            self._prev = {}
        return self

    def __enter__(self):
        return self.install()

    def _handle(self, signum, frame):
        if self.requested:  # second signal: unwind now (finally blocks
            raise KeyboardInterrupt  # still flush queued writes)
        self.requested = True
        # os.write, not print(): a signal landing while the main thread
        # is mid-write on buffered stdout makes print() raise "reentrant
        # call inside BufferedWriter" INSIDE the training loop — killing
        # the run mid-epoch with no snapshot, the exact failure this
        # class exists to prevent. Raw fd writes take no buffer lock.
        os.write(2, (f"\nReceived signal {signum}: will checkpoint and "
                     f"stop {self._what} at the end of this epoch "
                     "(signal again to abort immediately).\n").encode())

    def restore(self):
        import signal
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev = {}

    def __exit__(self, *exc):
        self.restore()
        return False


def checkpoint_boundary(shutdown: GracefulShutdown, epoch: int,
                        epochs: int, interval: int, save) -> bool:
    """Epoch-boundary checkpoint gate + preemption decision, shared by
    the three GAN loops.

    Latches ``shutdown.requested`` exactly ONCE so the same value gates
    both the forced off-interval snapshot and the stop decision — two
    separate reads let a signal landing between them break the loop
    WITHOUT the snapshot the preempt notice then promises exists (a
    fresh run with epoch+1 < checkpoint_interval would have NO snapshot
    at all, so --resume-from auto would silently restart from scratch).

    Calls ``save()`` when a checkpoint is due (interval hit, final
    epoch, or preempt); returns True when the loop should stop early —
    the epoch's snapshot is guaranteed queued in that case."""
    stop = bool(shutdown.requested)
    if (epoch + 1) % interval == 0 or (epoch + 1) == epochs or stop:
        save()
    return stop and (epoch + 1) < epochs


def preempt_notice(preempted_epoch: int) -> None:
    """The (single, shared) operator-facing message for a preempted GAN
    run: the epoch-boundary snapshot exists, resume continues it."""
    print(f"Preempted: training stopped after epoch {preempted_epoch} "
          "with a resumable snapshot; re-run with --resume-from auto "
          "to continue.")


def resume_history(history_path: str, history: dict, start_epoch: int):
    """On resume, reload the prior run's history JSON so the final file
    covers every epoch; a fresh run (or a key-set mismatch from an older
    version) keeps the empty template."""
    if start_epoch and os.path.exists(history_path):
        with open(history_path) as f:
            prior = json.load(f)
        if set(prior.keys()) == set(history.keys()):
            return prior
    return history


def replay_data_rng(n: int, batch_size: int, data_rng, start_epoch: int):
    """Advance the numpy data-order RNG past the epochs already trained,
    so a resumed run sees the same batch permutations it would have."""
    for _ in range(start_epoch):
        epoch_batches(n, batch_size, data_rng)


def grid_iters(iters: int, chunk: int, save_interval: int,
               last_epoch: bool, i: int, num_batches: int):
    """Iterations in [iters, iters+chunk) at which a sample sheet is due:
    the reference's every-save_interval cadence (train_gan.py:166-169)
    plus the final iteration of the final epoch. With chunked dispatch
    (--steps-per-call) every due iteration in the chunk would render the
    IDENTICAL post-chunk state, so only the last due one emits a sheet —
    at most one per dispatch, never byte-duplicate files."""
    due = [t for t in range(iters, iters + chunk)
           if t % save_interval == 0
           or (last_epoch and i + (t - iters) == num_batches - 1)]
    return due[-1:]


def export_generator_pth(model_dir: str, kind: str, g_state,
                         filename: str = "generator_final.pth") -> None:
    """Write a ``generator_final.pth`` twin of the msgpack final
    checkpoint in the torch state-dict layout the reference samplers load
    (reference generate_synthetic.py:23-32) — classifier checkpoints
    already get .pth twins; this closes the same interop gap for
    generators. Best-effort: a missing torch prints a warning instead of
    failing the finished training run."""
    import jax

    from xgan.models.pretrained import GENERATOR_TORCH_CODECS
    path = os.path.join(model_dir, filename)
    try:
        host = jax.device_get(g_state.variables())
        GENERATOR_TORCH_CODECS[kind][1](path, host["params"],
                                        host["batch_stats"])
        print(f"Saved torch generator twin to {path}")
    except Exception as e:  # noqa: BLE001 — never fail a finished run
        print(f"Warning: could not write {path}: {e}")


def save_ema_final(model_dir: str, kind: str, g_state, ema) -> None:
    """Persist the generator-weight EMA (``--ema-decay``) as a complete,
    directly-samplable checkpoint pair: ``generator_ema_final.msgpack``
    (EMA params + the live BN running stats — BN stats are already their
    own moving average, so the raw generator's are the right companion)
    and a ``.pth`` twin in the reference layout. No-op when EMA is off."""
    if ema is None:
        return
    from xgan.io_.checkpoint import save_variables
    ema_state = g_state.replace(params=ema)
    save_variables(os.path.join(model_dir, "generator_ema_final.msgpack"),
                   ema_state.variables())
    export_generator_pth(model_dir, kind, ema_state,
                         filename="generator_ema_final.pth")
    print(f"Saved EMA generator to "
          f"{os.path.join(model_dir, 'generator_ema_final.msgpack')}")


def resume_preflight(args) -> bool:
    """Existence check for an EXPLICIT --resume-from path, run before the
    (potentially minutes-long) dataset decode so a typo'd path aborts
    immediately; SnapshotManager.try_resume keeps the authoritative raise
    as a backstop. 'auto' and '' always pass."""
    r = getattr(args, "resume_from", "")
    if r and r != "auto" and not os.path.exists(r):
        print(f"Error: snapshot {r} not found (use --resume-from auto to "
              "start fresh when no snapshot exists)")
        return False
    return True


def batch_tail_mask(n_valid: int, num_batches: int, batch_size: int):
    """0/1 float32 validity mask for the FINAL batch of an epoch, or None
    when that batch is full. pipeline.epoch_batches wrap-pads the last
    batch to the static shape, so padded rows are always its tail; the
    mask gives the jitted steps the reference DataLoader's exact
    smaller-final-batch semantics (drop_last=False,
    reference data_loader.py:189-197) for losses, gradients and BN batch
    statistics. With --limit-batches the kept batches are all full (the
    padded one is the last of the untruncated epoch), so this returns
    None unless the tail batch is actually dispatched."""
    import numpy as np
    pad = num_batches * batch_size - n_valid
    if pad <= 0:
        return None
    return np.concatenate([np.ones(batch_size - pad, np.float32),
                           np.zeros(pad, np.float32)])


def trace_epoch(start_epoch: int, epochs: int) -> int:
    """Epoch index the XLA profiler captures when --trace-dir is set: the
    first post-compile epoch, falling back to the only remaining epoch on
    short runs (accepting compile time inside the trace) so a 1-epoch
    profiling run is never a silent no-op. Generalizes the classifier
    loop's min(1, epochs-1) pattern to resumed runs."""
    return min(start_epoch + 1, epochs - 1)


class EpochProgress:
    """Reference-style in-epoch progress (tqdm bars with a live postfix,
    reference train_gan.py:118,162-163, train_classifier.py:147,223) —
    but SYNC-FREE: the batch counter / enqueue rate never touch device
    values, and the live-loss postfix is OPPORTUNISTIC — it fetches a
    step's metrics only once ``jax.Array.is_ready()`` says the result is
    already materialized, so no update ever blocks on the device. (The
    reference's tqdm postfix forces a device sync every iteration —
    exactly the overhead the fused-epoch design removes; metrics are
    still fetched in bulk once per epoch.) Writes only to a TTY (tqdm's
    own auto-disable behavior on non-interactive streams), so
    piped/driver logs stay clean, and throttles redraws to ~10 Hz so a
    dispatch-bound 64px loop (tens of kHz) isn't slowed by terminal IO.

    ``postfix_fn``: maps the fetched (host numpy) metrics of one step to
    a short display string; each trainer supplies its own layout."""

    def __init__(self, label: str, num_batches: int, postfix_fn=None):
        self.enabled = sys.stdout.isatty()
        self.prefix = label
        self.total = num_batches
        self.t0 = time.time()
        self.postfix_fn = postfix_fn
        self.postfix = ""
        self._last_write = 0.0

    def update(self, i: int, metrics=None) -> None:
        if not self.enabled:
            return
        now = time.time()
        if now - self._last_write < 0.1 and i < self.total:
            return
        if (self.postfix_fn is not None and metrics is not None
                and getattr(metrics, "is_ready", lambda: True)()):
            try:  # display-only: a formatting surprise must not kill
                self.postfix = ", " + self.postfix_fn(  # the epoch loop
                    np.asarray(jax.device_get(metrics)))
            except Exception:
                self.postfix_fn = None
        rate = i / max(now - self.t0, 1e-9)
        sys.stdout.write(f"\r{self.prefix}: {i}/{self.total} batches "
                         f"dispatched ({rate:.1f}/s){self.postfix}")
        sys.stdout.flush()
        self._last_write = now

    def close(self) -> None:
        if self.enabled:
            sys.stdout.write("\r\x1b[2K")
            sys.stdout.flush()

    # Context manager: the line is cleared even when a dispatch raises
    # mid-epoch, so tracebacks never print onto the partial \r line.
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


# Per-trainer live-postfix layouts (the reference tqdm postfix fields,
# train_gan.py:162-163 / train_wggan.py:90-92 / train_classifier.py:154).

def gan_live_postfix(m) -> str:
    """DCGAN/CGAN step metrics: rows of [G, D, D_x, D_G_z1, D_G_z2, ...]
    ((5+,) single step or (K, 5+) per --steps-per-call chunk)."""
    row = np.atleast_2d(m)[-1]
    return (f"Loss_D: {row[1]:.4f}, Loss_G: {row[0]:.4f}, "
            f"D(x): {row[2]:.4f}")


def wgan_live_postfix(m) -> str:
    """WGAN critic losses ((critic_iters,) or (K, critic_iters))."""
    return f"Loss_D: {np.asarray(m).reshape(-1)[-1]:.4f}"


def loss_live_postfix(m) -> str:
    """Classifier per-sample loss vector -> batch mean."""
    return f"loss: {float(np.asarray(m).mean()):.4f}"

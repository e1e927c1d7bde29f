"""Full-state training snapshots (resume capability the reference lacks —
its checkpoints are write-only, SURVEY.md §5).

A snapshot holds every ModelState (params + BN stats + optimizer state)
plus the epoch/iteration counters, serialized as one msgpack file.

``async_io=True`` overlaps the save with training: the states are
copied ON DEVICE (cheap HBM copies — required because the jitted steps
donate their state buffers, so the live state may be deleted by the
next dispatch) and a background thread performs the device→host
transfer and the atomic file write. On this environment's tunneled
backend the D2H relay runs ~2 MB/s, so a synchronous full-state save
blocks the train loop for minutes per epoch; async hides it behind the
next epoch's compute. At most one save is in flight (a new save first
joins the previous one), the final save is joined by ``flush()`` at
loop end, and worker failures re-raise on the next save()/flush() —
the crash-safety contract is unchanged (tmp + atomic rename; a crash
mid-write leaves the previous snapshot intact).
"""
from __future__ import annotations

import os
import threading
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xgan.io_.checkpoint import check_leaf_shapes, save_variables
from xgan.train.common import ModelState


def _host_template(tree):
    """Shape/dtype twin of a (possibly device-resident) state tree,
    built WITHOUT any device->host transfer. Resume needs the template
    only for its structure/shapes/dtypes (msgpack restore target +
    shape check); ``jax.device_get`` of a full fg=64 224px train state
    is ~400 MB, which over this environment's ~10 MB/s D2H relay
    stalled reference-scale resume for 18 minutes and then aborted
    with ResourceExhausted (r5 rehearsal finding). Zero-filled host
    leaves carry the same restore semantics at zero transfer cost."""
    def leaf(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return np.zeros(x.shape, x.dtype)
        return x
    return jax.tree_util.tree_map(leaf, tree)


class AsyncWriter:
    """One background IO thread with a bounded FIFO queue.

    ``submit(job)`` runs jobs strictly in submission order; ``flush()``
    waits for the queue to drain and re-raises the FIRST worker
    failure. Used for checkpoint/snapshot/history writes so the (slow,
    ~2 MB/s through this environment's tunnel relay) device→host
    transfer and file IO overlap the next epoch's device compute."""

    def __init__(self, maxsize: int = 8):
        self._maxsize = maxsize
        self._queue = None  # lazily-started single writer thread
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None

    def _drain(self) -> None:
        while True:
            job = self._queue.get()
            try:
                if job is not None:
                    job()
            except BaseException as e:  # noqa: BLE001 — raised on flush()
                if self._error is None:
                    self._error = e
            finally:
                self._queue.task_done()

    def submit(self, job) -> None:
        # surface a prior worker failure NOW, not hours later at the
        # loop-end flush: a run whose checkpoint writes started failing
        # (disk full, unwritable dir) must stop at the next save instead
        # of training to completion while reporting successful saves
        if self._error is not None:
            err, self._error = self._error, None
            raise err
        if self._queue is None:
            import queue
            # bounded: the producer blocks rather than pile up device
            # copies if training outruns the writer for many epochs
            self._queue = queue.Queue(maxsize=self._maxsize)
            self._thread = threading.Thread(target=self._drain,
                                            name="snapshot-writer",
                                            daemon=True)
            self._thread.start()
        self._queue.put(job)

    def flush(self, reraise: bool = True) -> None:
        """Wait for all queued writes (no-op when idle) and re-raise
        the first worker failure. Call before process exit — daemon
        threads do not survive the interpreter. ``reraise=False`` is
        for exception paths (finally blocks): still drain the queue —
        the crash must not lose bytes for snapshots already taken —
        but keep the worker error from masking the in-flight one."""
        if self._queue is not None:
            self._queue.join()
        if self._error is not None:
            err, self._error = self._error, None
            if reraise:
                raise err
            print(f"Warning: async checkpoint write failed: {err!r}")


def device_copy(tree):
    """On-device copy of a pytree. The jitted steps DONATE their state
    buffers, so live arrays may be deleted by the very next dispatch; a
    cheap HBM copy pins a save's bytes without blocking on the (slow)
    device→host transfer."""
    return jax.tree_util.tree_map(jnp.copy, tree)


def atomic_write(path: str, payload) -> None:
    """msgpack write via tmp + atomic rename: a crash mid-write (OOM
    kill at an epoch boundary) must not destroy the one file resume
    depends on."""
    tmp = f"{path}.tmp{os.getpid()}"
    save_variables(tmp, payload)
    os.replace(tmp, path)


class SnapshotManager:
    def __init__(self, path: str, mesh_ctx=None, async_io: bool = False):
        self.path = path
        self.mesh_ctx = mesh_ctx
        self.async_io = async_io
        self._writer = AsyncWriter()

    def _atomic_write(self, path: str, payload) -> None:
        atomic_write(path, payload)

    def _enqueue(self, job) -> None:
        self._writer.submit(job)

    @staticmethod
    def _device_copy(tree):
        return device_copy(tree)

    # -- public API ---------------------------------------------------

    def save(self, states: Dict[str, ModelState], epoch: int,
             iters: int) -> None:
        def payload_of(states):
            payload = {name: jax.device_get(st)
                       for name, st in states.items()}
            payload["epoch"] = epoch
            payload["iters"] = iters
            return payload

        if not self.async_io:
            self._atomic_write(self.path, payload_of(states))
            return
        copies = {name: self._device_copy(st)
                  for name, st in states.items()}
        self._enqueue(lambda: self._atomic_write(self.path,
                                                 payload_of(copies)))

    def save_file(self, path: str, tree) -> None:
        """Save an arbitrary variables tree (epoch checkpoints ride the
        same writer thread as the snapshot when async)."""
        if not self.async_io:
            self._atomic_write(path, jax.device_get(tree))
            return
        copy = self._device_copy(tree)
        self._enqueue(lambda: self._atomic_write(path,
                                                 jax.device_get(copy)))

    def save_json(self, path: str, obj) -> None:
        """Write a JSON artifact through the SAME writer queue, so the
        'history persists WITH the snapshot' ordering survives async
        mode: the single FIFO worker lands the snapshot before the
        history that references its epochs (a crash between the two
        then leaves history <= snapshot, which resume handles). The
        object is deep-copied NOW — the caller keeps mutating it."""
        import copy

        from xgan.io_.metrics import write_json
        snap = copy.deepcopy(obj)
        if not self.async_io:
            write_json(path, snap)
            return
        self._enqueue(lambda: write_json(path, snap))

    def flush(self, reraise: bool = True) -> None:
        """Wait for all queued async writes (no-op when idle) and
        re-raise the first worker failure. MUST run on every loop exit
        path (the train loops use try/finally): the writer is a daemon
        thread, so an unflushed crash would lose queued bytes for
        snapshots the loop already reported saved. ``reraise=False``
        on exception paths keeps a worker error from masking the
        in-flight exception (it prints a warning instead)."""
        self._writer.flush(reraise)

    def try_resume(self, resume_from: str,
                   states: Dict[str, ModelState]
                   ) -> Tuple[Dict[str, ModelState], int, int]:
        """resume_from: path, or 'auto' (this run's own snapshot), or ''."""
        if resume_from == "auto":
            resume_from = self.path if os.path.exists(self.path) else ""
        if not resume_from:
            return states, 0, 0
        if not os.path.exists(resume_from):
            # 'auto' already degraded to "" above when absent; an EXPLICIT
            # path that doesn't exist is a user error — silently starting
            # fresh would discard the run the user asked to continue.
            raise FileNotFoundError(
                f"snapshot {resume_from} not found (use --resume-from auto "
                "to start fresh when no snapshot exists)")
        like = {name: _host_template(st) for name, st in states.items()}
        like["epoch"] = 0
        like["iters"] = 0
        from flax import serialization
        with open(resume_from, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        # flax from_state_dict silently DROPS state keys the template
        # lacks — and the next save then overwrites the snapshot without
        # them, destroying e.g. hours of accumulated EMA because the
        # flag was dropped on resume. Refuse instead.
        extra = sorted(set(raw) - set(like))
        if extra:
            hint = (" — re-add --ema-decay to resume it (resuming "
                    "without the flag would silently discard the "
                    "accumulated EMA at the next snapshot save)"
                    if "ema" in extra else "")
            raise ValueError(
                f"snapshot {resume_from} carries state the current "
                f"flags do not use: {', '.join(extra)}{hint}")
        try:
            snap = serialization.from_state_dict(like, raw)
        except ValueError as e:
            if "ema" not in str(e):
                hint = ""
            elif "ema" in like:  # template expects EMA, snapshot lacks it
                hint = (" (the snapshot predates --ema-decay; resume "
                        "without the flag or start fresh)")
            else:  # snapshot carries EMA, flag was dropped on resume
                hint = (" (the snapshot carries --ema-decay state; "
                        "re-add the flag to resume it)")
            raise ValueError(
                f"cannot load snapshot {resume_from}: {e}{hint}") from e
        check_leaf_shapes(like, snap,
                          f"snapshot {resume_from} does not match the "
                          "current model flags")
        out = {}
        for name in states:
            st = snap[name]
            out[name] = (self.mesh_ctx.replicate(st)
                         if self.mesh_ctx is not None else st)
        epoch, iters = int(snap["epoch"]), int(snap["iters"])
        print(f"Resumed from {resume_from} at epoch {epoch}, iter {iters}")
        return out, epoch, iters

"""Full-state training snapshots (resume capability the reference lacks —
its checkpoints are write-only, SURVEY.md §5).

A snapshot holds every ModelState (params + BN stats + optimizer state)
plus the epoch/iteration counters, serialized as one msgpack file.
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import jax

from xgan.io_.checkpoint import check_leaf_shapes, load_variables, \
    save_variables
from xgan.train.common import ModelState


class SnapshotManager:
    def __init__(self, path: str, mesh_ctx=None):
        self.path = path
        self.mesh_ctx = mesh_ctx

    def save(self, states: Dict[str, ModelState], epoch: int,
             iters: int) -> None:
        payload = {name: jax.device_get(st) for name, st in states.items()}
        payload["epoch"] = epoch
        payload["iters"] = iters
        # tmp + atomic rename: a crash mid-write (OOM kill at an epoch
        # boundary) must not destroy the one snapshot resume depends on
        tmp = f"{self.path}.tmp{os.getpid()}"
        save_variables(tmp, payload)
        os.replace(tmp, self.path)

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
        like = {name: jax.device_get(st) for name, st in states.items()}
        like["epoch"] = 0
        like["iters"] = 0
        snap = load_variables(resume_from, like)
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

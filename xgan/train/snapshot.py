"""Full-state training snapshots (resume capability the reference lacks —
its checkpoints are write-only, SURVEY.md §5).

A snapshot holds every ModelState (params + BN stats + optimizer state)
plus the epoch/iteration counters, serialized as one msgpack file.
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import numpy as np

from xgan.io_.checkpoint import load_variables, save_variables
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
        save_variables(self.path, payload)

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
        # Shape-check: flax deserialization restores a snapshot written
        # under different model flags without complaint, and the mismatch
        # would otherwise surface as an opaque ScopeParamShapeError at
        # step time.
        want = jax.tree_util.tree_flatten_with_path(like)[0]
        got = jax.tree_util.tree_flatten_with_path(snap)[0]
        for (pa, a), (_, b) in zip(want, got):
            if np.shape(a) != np.shape(b):
                raise ValueError(
                    f"snapshot {resume_from} does not match the current "
                    f"model flags: {jax.tree_util.keystr(pa)} has shape "
                    f"{np.shape(b)}, expected {np.shape(a)}")
        out = {}
        for name in states:
            st = snap[name]
            out[name] = (self.mesh_ctx.replicate(st)
                         if self.mesh_ctx is not None else st)
        epoch, iters = int(snap["epoch"]), int(snap["iters"])
        print(f"Resumed from {resume_from} at epoch {epoch}, iter {iters}")
        return out, epoch, iters

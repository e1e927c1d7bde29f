"""Checkpointing: flax msgpack snapshots with the reference's file roles.

The reference writes write-only torch ``state_dict`` .pth files
(train_gan.py:183-196, train_classifier.py:179-184) and never resumes.
We keep the same file *roles* and naming stems (generator_final,
discriminator_epoch_NNN, fold_N_{strategy}_resnet50, ...) with a
``.msgpack`` extension, and additionally support true resume: a full
TrainSnapshot (params + batch_stats + optimizer state + step counters) can
be round-tripped, which the reference cannot do (SURVEY.md §5
checkpoint/resume gap).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def save_variables(path: str, tree: Dict[str, Any]) -> None:
    """Serialize a pytree of arrays to ``path`` (msgpack)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_tree = jax.tree_util.tree_map(np.asarray, tree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_tree))


def load_variables(path: str, like: Dict[str, Any]) -> Dict[str, Any]:
    """Load a pytree saved by save_variables; ``like`` provides structure."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(like, data)


def check_leaf_shapes(like: Dict[str, Any], loaded: Dict[str, Any],
                      context: str) -> None:
    """Raise ValueError naming the first leaf whose shape differs.

    flax deserialization restores a checkpoint written under different
    model flags without complaint; unchecked, the mismatch surfaces much
    later as an opaque ScopeParamShapeError at apply/step time. Every
    checkpoint-load site shares this one validator."""
    want = jax.tree_util.tree_flatten_with_path(like)[0]
    got = jax.tree_util.tree_flatten_with_path(loaded)[0]
    for (pa, a), (_, b) in zip(want, got):
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"{context}: {jax.tree_util.keystr(pa)} has checkpoint "
                f"shape {np.shape(b)}, expected {np.shape(a)}")


def load_variables_checked(path: str, like: Dict[str, Any],
                           context: str = None) -> Dict[str, Any]:
    """load_variables + per-leaf shape validation (clear early error
    instead of a deferred flax shape crash)."""
    loaded = load_variables(path, like)
    check_leaf_shapes(like, loaded, context or
                      f"checkpoint {path} does not match the current "
                      "model flags")
    return loaded

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

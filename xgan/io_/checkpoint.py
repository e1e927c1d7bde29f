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


def load_classifier_variables(path: str,
                              like: Dict[str, Any]) -> Dict[str, Any]:
    """Extension-aware classifier checkpoint reader.

    ``.msgpack`` is our native format; a ``.pth``/``.pt`` path is read as
    a torchvision ``resnet50`` state dict — the reference's classifier
    checkpoint format (reference train_classifier.py:179-184, loaded back
    by analyze_results.py:455-470) — via the converter in
    xgan.models.pretrained. This mirrors the generator ``.pth`` interop in
    xgan.train.sample.load_generator: a reference-trained classifier can
    be analyzed (Grad-CAM) and served (src/predict.py) directly.

    Stage sizes are derived from ``like`` (the initialized model tree), so
    the importer always targets the exact architecture the caller built.
    Both formats get per-leaf shape validation.
    """
    if path.endswith((".pth", ".pt")):
        from xgan.models.pretrained import load_torch_resnet50
        num_classes = int(np.shape(like["params"]["fc"]["bias"])[0])
        stage_sizes = tuple(
            sum(1 for k in like["params"] if k.startswith(f"layer{s}_"))
            for s in range(1, 5))
        try:
            params, stats = load_torch_resnet50(
                path, num_classes=num_classes, stage_sizes=stage_sizes)
        except KeyError as e:
            raise ValueError(
                f"{path}: state dict is missing {e} — not a torchvision "
                f"resnet50 of stages {stage_sizes}") from e
        if "fc" not in params:
            raise ValueError(
                f"{path}: state dict has no {num_classes}-way fc head — "
                "this looks like a raw ImageNet backbone, not a trained "
                "classifier (backbones go to --pretrained-path)")
        loaded = {"params": params, "batch_stats": stats}
        if (jax.tree_util.tree_structure(like)
                != jax.tree_util.tree_structure(loaded)):
            raise ValueError(
                f"{path}: state-dict layout does not match a torchvision "
                f"resnet50 of stages {stage_sizes}")
        check_leaf_shapes(like, loaded,
                          f"checkpoint {path} does not match the current "
                          "model flags")
        return loaded
    return load_variables_checked(path, like)

"""Parallel k-fold cross-validation: all folds train simultaneously.

The reference trains folds sequentially (train_classifier.py:611-636);
SURVEY.md §2.3 lists fold-parallel execution as the TPU-native upgrade.
Here fold states are STACKED on a leading axis and the per-fold train/eval
steps are vmapped over it, then sharded across the mesh — one fused
program advances every fold by one batch:

- each fold keeps its own parameters, optimizer state and BN statistics
  (vmap semantics: batch stats reduce within a fold's sub-batch only, so
  fold isolation is exact);
- on a single chip this lifts MXU utilization at the reference's small
  batch (32) by effectively batching k folds together; on a multi-chip
  mesh the fold axis shards across device groups;
- per-fold epochs are index matrices (k, B) built from each fold's own
  KFold split; wall-clock per CV run ≈ one fold's time.

Enabled by --parallel-folds on src/train_classifier.py; artifacts
(histories, checkpoints, cv_summary) are identical in shape to the
sequential path.
"""
from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from xgan.train.classifier import make_eval_step, make_train_step
from xgan.train.common import ModelState


def fold_mesh(devices, k: int) -> Mesh:
    """A ('fold', 'data') mesh for parallel CV (VERDICT r1 #9).

    The fold axis takes gcd(k, n_devices) shards — each device group owns
    k/f folds' parameters, optimizer state, BN statistics and batch rows
    (state memory per device drops by f; BN/grad reductions span only the
    group's n/f devices instead of the whole mesh). The remaining factor
    splits each fold's batch (plain DP). gcd == 1 (e.g. 3 folds on 8
    devices) degenerates to pure batch sharding, the round-1 layout.
    """
    devices = list(devices)
    n = len(devices)
    f = math.gcd(k, n)
    arr = np.asarray(devices).reshape(f, n // f)
    return Mesh(arr, ("fold", "data"))


def stack_states(states: List[ModelState]) -> ModelState:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_state(stacked: ModelState, fold: int):
    return jax.tree_util.tree_map(lambda x: x[fold], stacked)


def make_parallel_steps(model, tx, *, mode: str, n_folds: int,
                        dtype=jnp.float32, fold_sharding=None,
                        pmesh=None, pooled_synth: bool = False,
                        grad_accum: int = 1):
    """Returns (train_step, eval_step) vmapped over the fold axis.

    train_step(stacked_state, real_u8, real_labels, synth_u8, synth_labels,
               idx (k,B), ratio, keys (k,), mask (k,B)) ->
        (stacked_state, losses (k,B), preds (k,B), labels (k,B))

    ``mask`` is the per-fold sample-validity matrix (tail exactness,
    xgan/ops/norm.py): positions past a fold's true epoch length are 0 —
    the fold's own wrap-padded tail AND the whole lockstep batches a
    shorter fold re-visits to stay aligned with the longest fold. A
    fully-zero fold row makes that fold's update a NO-OP (classifier
    step empty-batch freeze), so every fold trains on exactly the
    reference's sequential-fold batch set.
    eval_step(stacked_variables, images_u8, idx (k,B), labels_all) ->
        (losses (k,B), preds (k,B), labels (k,B))

    Stores are shared (not vmapped); ratio is shared (the curriculum
    schedule is the same for every fold, train_classifier.py:126-128).
    ``pooled_synth`` (mix mode, empty-synthetic fallback): train_step
    takes an extra per-fold ``synth_pools (k, P)`` int32 argument after
    ``synth_labels`` — each fold's synthetic draws pick from its own
    pool of real rows (see classifier.make_train_step).

    ``pmesh`` (a :func:`fold_mesh`) picks the layout: with >1 fold shard,
    the whole step runs under ``jax.shard_map`` MANUAL over the "fold"
    axis — each device group owns its folds' states/batches outright,
    while the "data" axis stays auto (GSPMD inserts the per-fold BN and
    gradient reductions, exactly the single-run DP semantics). Manual
    fold sharding is required for correctness, not just layout: letting
    GSPMD shard the fold axis of the vmapped convs (= the group axis of
    grouped convolutions) miscompiles on this XLA version (chained
    grouped convs return wrong values; see tests/test_parallel_cv.py).
    With one fold shard, ``fold_sharding`` (or pmesh's P(None, 'data'))
    constrains the index matrices so batches shard over data — the
    round-1 layout.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    # grad_accum composes under the fold vmap (r5, VERDICT r4 weak #5):
    # the microbatch lax.scan lives inside the raw step, each fold's
    # (B,) mask slices into per-microbatch masks the scan already
    # handles (fully-padded microbatch stats-freeze + gradient
    # select-zero), and the all-invalid-fold state freeze wraps OUTSIDE
    # the scan — so a short fold past its epoch end stays bitwise
    # frozen at any K. Pinned against the sequential per-fold
    # grad-accum steps in tests/test_parallel_cv.py.
    raw_train = make_train_step(model, tx, mode=mode, dtype=dtype,
                                batch_sharding=None, jit_compile=False,
                                pooled_synth=pooled_synth,
                                grad_accum=grad_accum)
    raw_eval = make_eval_step(model, dtype=dtype, batch_sharding=None,
                              jit_compile=False)

    def raw_train_masked(*args):
        # mask rides as the LAST positional arg (vmap maps positionals)
        *pos, mask = args
        return raw_train(*pos, mask=mask)

    # pooled variant inserts the per-fold (k, P) pool after synth_labels
    base_axes = ((0, None, None, None, None, 0, 0, None, 0)
                 if pooled_synth else
                 (0, None, None, None, None, 0, None, 0))
    vtrain_masked = jax.vmap(raw_train_masked, in_axes=base_axes + (0,))
    # unmasked variant: raw step gets NO mask kwarg at all, so
    # mask-unaware custom models keep working through the parallel path
    vtrain_plain = jax.vmap(raw_train, in_axes=base_axes)

    def vtrain(stacked, *args):
        *pos, mask = args
        if mask is None:
            return vtrain_plain(stacked, *pos)
        return vtrain_masked(stacked, *pos, mask)
    veval = jax.vmap(raw_eval, in_axes=(0, None, 0, None))

    def _split_rest(rest):
        """(pools..., idx, ratio, keys[, mask]) — mask is None (no fold
        padding, plain unmasked steps) for callers that omit it."""
        n_no_mask = 4 if pooled_synth else 3
        if len(rest) == n_no_mask:
            *pools, idx, ratio, keys = rest
            mask = None
        else:
            *pools, idx, ratio, keys, mask = rest
        return pools, idx, ratio, keys, mask

    if pmesh is not None and pmesh.shape["fold"] > 1:
        data_sh = NamedSharding(pmesh, P(None, "data"))

        def train_body(stacked, real_u8, real_labels, synth_u8,
                       synth_labels, *rest):
            pools, idx, ratio, keys, mask = _split_rest(rest)
            idx = jax.lax.with_sharding_constraint(idx, data_sh)
            return vtrain(stacked, real_u8, real_labels, synth_u8,
                          synth_labels, *pools, idx, ratio, keys, mask)

        def eval_body(stacked_vars, images_u8, idx, labels_all):
            idx = jax.lax.with_sharding_constraint(idx, data_sh)
            return veval(stacked_vars, images_u8, idx, labels_all)

        pool_specs = (P("fold"),) if pooled_synth else ()

        def _shmapped(*args):
            # specs must match the actual arg count: mask present or not
            n_base = 5 + len(pool_specs) + 3
            has_mask = len(args) > n_base
            specs = ((P("fold"), P(), P(), P(), P()) + pool_specs
                     + (P("fold"), P(), P("fold"))
                     + ((P("fold"),) if has_mask else ()))
            return jax.shard_map(
                train_body, mesh=pmesh, in_specs=specs,
                out_specs=(P("fold"), P("fold"), P("fold"), P("fold")),
                axis_names={"fold"}, check_vma=False)(*args)

        eval_step = jax.shard_map(
            eval_body, mesh=pmesh,
            in_specs=(P("fold"), P(), P("fold"), P()),
            out_specs=(P("fold"),) * 4,
            axis_names={"fold"}, check_vma=False)
        return (jax.jit(_shmapped, donate_argnums=(0,)),
                jax.jit(eval_step))

    if fold_sharding is None and pmesh is not None:
        fold_sharding = NamedSharding(pmesh, P(None, "data"))

    def train_step(stacked, real_u8, real_labels, synth_u8, synth_labels,
                   *rest):
        pools, idx, ratio, keys, mask = _split_rest(rest)
        if fold_sharding is not None:
            idx = jax.lax.with_sharding_constraint(idx, fold_sharding)
        return vtrain(stacked, real_u8, real_labels, synth_u8,
                      synth_labels, *pools, idx, ratio, keys, mask)

    def eval_step(stacked_vars, images_u8, idx, labels_all):
        if fold_sharding is not None:
            idx = jax.lax.with_sharding_constraint(idx, fold_sharding)
        return veval(stacked_vars, images_u8, idx, labels_all)

    return (jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step))


def fold_epoch_batches(fold_indices: List[np.ndarray], batch_size: int,
                       rng: np.random.Generator,
                       shuffle: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Per-fold index matrices aligned to a common batch count.

    Returns (batches (num_batches, k, B) int32, n_valid (k,)): folds with
    fewer samples wrap around; n_valid marks how many flattened entries
    per fold are real. The padding duplicates are dropped from metrics
    AND masked out of gradients/BN stats (fold_masks + the classifier
    step's empty-batch freeze), so lockstep execution trains each fold
    on exactly its own epoch.
    """
    from xgan.data.pipeline import epoch_batches
    per_fold = [epoch_batches(len(fi), batch_size, rng, shuffle=shuffle,
                              indices=fi) for fi in fold_indices]
    num_batches = max(pb.shape[0] for pb in per_fold)
    k = len(per_fold)
    out = np.zeros((num_batches, k, batch_size), np.int32)
    n_valid = np.zeros((k,), np.int64)
    for f, pb in enumerate(per_fold):
        reps = int(np.ceil(num_batches / pb.shape[0]))
        tiled = np.concatenate([pb] * reps, axis=0)[:num_batches]
        out[:, f, :] = tiled
        n_valid[f] = min(len(fold_indices[f]), num_batches * batch_size)
    return out, n_valid


def fold_masks(num_batches: int, batch_size: int,
               n_valid: np.ndarray) -> np.ndarray:
    """(num_batches, k, B) float32 validity masks for fold_epoch_batches
    output: position i*B + r of fold f is valid iff it is below the
    fold's true epoch length (fold tails and lockstep wrap batches are
    0 — see make_parallel_steps docstring)."""
    pos = (np.arange(batch_size)[None, None, :]
           + batch_size * np.arange(num_batches)[:, None, None])
    return (pos < np.asarray(n_valid)[None, :, None]).astype(np.float32)

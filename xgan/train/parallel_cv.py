"""Orchestration for parallel k-fold CV (see xgan/train/parallel_folds.py).

Produces artifacts identical in schema/filenames to the sequential path:
fold_N_{strategy}_training_history.json, fold_N_{strategy}_resnet50.msgpack,
{strategy}_cv_summary.json and the figures.
"""
from __future__ import annotations

import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from sklearn.metrics import accuracy_score

from xgan.io_.checkpoint import save_variables
from xgan.io_.metrics import write_json
from xgan.train.classifier import classifier_optimizer
from xgan.train.common import ModelState
from xgan.train.curriculum import get_current_synthetic_ratio
from xgan.train.loop_common import GracefulShutdown, trace_epoch
from xgan.utils.timer import maybe_trace
from xgan.train.parallel_folds import (fold_epoch_batches, fold_masks,
                                       fold_mesh,
                                       make_parallel_steps, stack_states,
                                       unstack_state)


def _fold_metrics(acc_list, n_valid):
    """(nb, k, B) device arrays -> per-fold flat arrays with padding
    dropped (flattened[:n_valid] is the full permutation, see
    fold_epoch_batches)."""
    stacked = np.asarray(jax.device_get(jnp.stack(acc_list)))  # (nb,k,B)
    k = stacked.shape[1]
    return [stacked[:, f, :].reshape(-1)[:int(n_valid[f])]
            for f in range(k)]


def run_parallel_cv(args, mesh_ctx, dtype, stores, splits, *, strategy,
                    schedule, init_resnet, synth_fallback=False):
    """splits: list of (train_idx, val_idx) per fold. Returns
    (best_vars_per_fold, histories), or None when preempted (SIGTERM/
    SIGINT): the lockstep program trains every fold simultaneously, so
    a preempt at an epoch boundary leaves ALL folds incomplete — the
    per-fold history JSONs (the fold-completion markers the sequential
    path's --resume-from auto reads) are withheld and no summary is
    written, so a re-run retrains from scratch instead of averaging
    fewer-epoch folds into the CV summary.

    ``synth_fallback``: the synthetic dir exists but is empty — same
    reference semantics as the sequential path (classifier_loop): the
    curriculum mixer substitutes random real positives from each fold's
    OWN train split (per-fold pools, no cross-fold/val leakage), and the
    augmented concat adds nothing."""
    real_dev, synth_dev, _ = stores
    k = len(splits)
    mode = {"baseline": "real", "augmented": "concat",
            "curriculum": "mix"}[strategy]
    n_real = len(real_dev)

    synth_pools = None
    if synth_fallback and mode == "mix":
        from xgan.train.classifier_loop import fallback_pool
        pools = [np.asarray(fallback_pool(real_dev, tr), np.int64)
                 for tr, _ in splits]
        # wrap-pad to a common length so pools stack on the fold axis
        # (KFold split sizes differ by <=1; the duplicated row's draw
        # weight skews by O(1/P) — negligible against the reference's
        # uniform-with-replacement sampling)
        m = max(p.size for p in pools)
        synth_pools = jnp.asarray(
            np.stack([np.resize(p, m) for p in pools]).astype(np.int32))
        synth_dev = real_dev  # alias: pool values index the real store

    tx = classifier_optimizer(args.lr, freeze_base=not args.unfreeze)
    states, model = [], None
    for f in range(k):
        model, params, stats = init_resnet(
            args, dtype, jax.random.key(args.seed + f))
        states.append(ModelState(params=params, batch_stats=stats,
                                 opt_state=tx.init(params)))
    # ('fold','data') mesh over the same devices: device groups own
    # disjoint folds where gcd(k, n_devices) > 1 (shard_map manual over
    # the fold axis), and split each fold's batch otherwise (see
    # parallel_folds.fold_mesh / make_parallel_steps).
    pmesh = fold_mesh(mesh_ctx.mesh.devices.flatten(), k)
    state_sharding = NamedSharding(pmesh, P("fold"))
    stacked = jax.device_put(stack_states(states), state_sharding)
    del states
    print(f"Parallel CV mesh: {dict(pmesh.shape)}")

    batch_size = mesh_ctx.pad_batch(args.batch_size)
    ga = int(getattr(args, "grad_accum", 1) or 1)
    if ga > 1 and batch_size % ga:
        print(f"Note: --grad-accum {ga} does not divide the "
              f"(device-padded) batch size {batch_size}; running "
              "without accumulation.")
        ga = 1
    train_step, eval_step = make_parallel_steps(
        model, tx, mode=mode, n_folds=k, dtype=dtype, pmesh=pmesh,
        pooled_synth=synth_pools is not None, grad_accum=ga)
    if strategy == "augmented" and not synth_fallback:
        train_spaces = [np.concatenate([
            np.asarray(tr, np.int64),
            n_real + np.arange(len(synth_dev), dtype=np.int64)])
            for tr, _ in splits]
    else:
        # empty synthetic store concatenates nothing
        # (reference data_loader.py:575 with a 0-length SyntheticDataset)
        train_spaces = [np.asarray(tr, np.int64) for tr, _ in splits]
    val_spaces = [np.asarray(va, np.int64) for _, va in splits]

    data_rng = np.random.default_rng(args.seed)
    k_train = jax.random.key(args.seed + 1000)
    histories: List[Dict] = [
        {"epoch": [], "train_loss": [], "train_acc": [], "val_loss": [],
         "val_acc": [], "synthetic_ratio": []} for _ in range(k)]
    best_acc = [0.0] * k
    best_vars = [jax.device_get(
        {"params": unstack_state(stacked, f).params,
         "batch_stats": unstack_state(stacked, f).batch_stats})
        for f in range(k)]
    preempted = 0
    # SIGTERM/SIGINT → finish the in-flight epoch (all folds advance in
    # lockstep), stop at the boundary. Same epoch-granular discipline as
    # the sequential path; see the preempt contract in the docstring.
    shutdown = GracefulShutdown("parallel cross-validation")
    shutdown.install()
    try:
        preempted = _epoch_loop(
            args, strategy, schedule, synth_pools, synth_dev, real_dev,
            train_spaces, val_spaces, batch_size, data_rng, k_train,
            train_step, eval_step, stacked, histories, best_acc,
            best_vars, k, shutdown)
    finally:
        shutdown.restore()
    if preempted:
        print(f"Preempted: parallel {k}-fold CV stopped after epoch "
              f"{preempted}/{args.epochs}; fold histories and the CV "
              "summary are withheld (lockstep folds are all incomplete) "
              "— re-run to train from scratch.")
        return None

    for f in range(k):
        write_json(os.path.join(
            args.results_dir,
            f"fold_{f + 1}_{strategy}_training_history.json"),
            histories[f])
        print(f"Fold {f + 1} best val acc: {best_acc[f]:.4f}")
    return best_vars, histories


def _epoch_loop(args, strategy, schedule, synth_pools, synth_dev,
                real_dev, train_spaces, val_spaces, batch_size, data_rng,
                k_train, train_step, eval_step, stacked, histories,
                best_acc, best_vars, k, shutdown):
    """The lockstep epoch loop; returns the preempting epoch (0 = ran to
    completion). Mutates histories/best_acc/best_vars in place."""
    step_counter = 0

    for epoch in range(args.epochs):
        t0 = time.time()
        ratio = 0.0
        if strategy == "curriculum" and schedule:
            ratio = get_current_synthetic_ratio(epoch, schedule)

        batches, n_valid = fold_epoch_batches(train_spaces, batch_size,
                                              data_rng)
        if args.limit_batches:
            batches = batches[:args.limit_batches]
            n_valid = np.minimum(n_valid, batches.shape[0] * batch_size)
        epoch_masks = fold_masks(batches.shape[0], batch_size, n_valid)
        loss_acc, pred_acc, lab_acc = [], [], []
        # Optional XLA profiler capture of one post-compile train phase;
        # exception-safe via the with-block.
        with maybe_trace(getattr(args, "trace_dir", "")
                         if epoch == trace_epoch(0, args.epochs)
                         else None):
            for i in range(batches.shape[0]):
                keys = jax.random.split(
                    jax.random.fold_in(k_train, step_counter), k)
                step_counter += 1
                pool_arg = () if synth_pools is None else (synth_pools,)
                stacked, losses, preds, labels = train_step(
                    stacked, real_dev.images, real_dev.labels,
                    synth_dev.images, synth_dev.labels, *pool_arg,
                    jnp.asarray(batches[i]), jnp.float32(ratio), keys,
                    jnp.asarray(epoch_masks[i]))
                loss_acc.append(losses)
                pred_acc.append(preds)
                lab_acc.append(labels)

            tr_losses = _fold_metrics(loss_acc, n_valid)
            tr_preds = _fold_metrics(pred_acc, n_valid)
            tr_labels = _fold_metrics(lab_acc, n_valid)

        # --- validation (all folds in one vmapped pass per batch)
        val_batches, val_valid = fold_epoch_batches(
            val_spaces, batch_size, data_rng, shuffle=False)
        if args.limit_batches:
            val_batches = val_batches[:args.limit_batches]
            val_valid = np.minimum(val_valid,
                                   val_batches.shape[0] * batch_size)
        stacked_vars = {"params": stacked.params,
                        "batch_stats": stacked.batch_stats}
        vl_acc, vp_acc, vlab_acc = [], [], []
        for i in range(val_batches.shape[0]):
            losses, preds, labels, _ = eval_step(
                stacked_vars, real_dev.images, jnp.asarray(val_batches[i]),
                real_dev.labels)
            vl_acc.append(losses)
            vp_acc.append(preds)
            vlab_acc.append(labels)
        v_losses = _fold_metrics(vl_acc, val_valid)
        v_preds = _fold_metrics(vp_acc, val_valid)
        v_labels = _fold_metrics(vlab_acc, val_valid)

        for f in range(k):
            h = histories[f]
            h["epoch"].append(epoch + 1)
            h["synthetic_ratio"].append(
                ratio if strategy == "curriculum" else
                (1.0 if strategy == "augmented" else 0.0))
            h["train_loss"].append(float(tr_losses[f].mean()))
            h["train_acc"].append(
                float(accuracy_score(tr_labels[f], tr_preds[f])))
            val_loss = float(v_losses[f].mean())
            val_acc = float(accuracy_score(v_labels[f], v_preds[f]))
            h["val_loss"].append(val_loss)
            h["val_acc"].append(val_acc)
            if val_acc > best_acc[f]:
                best_acc[f] = val_acc
                st = unstack_state(stacked, f)
                best_vars[f] = jax.device_get(
                    {"params": st.params, "batch_stats": st.batch_stats})
                ckpt = os.path.join(
                    args.model_dir,
                    f"fold_{f + 1}_{strategy}_resnet50.msgpack")
                save_variables(ckpt, best_vars[f])
                # torchvision-format twin (reference
                # train_classifier.py:182 writes the same name per fold)
                from xgan.models.pretrained import save_torch_resnet50
                from xgan.train.classifier_loop import _resnet_stages
                save_torch_resnet50(
                    os.path.join(
                        args.model_dir,
                        f"fold_{f + 1}_{strategy}_resnet50.pth"),
                    best_vars[f]["params"], best_vars[f]["batch_stats"],
                    stage_sizes=_resnet_stages(args))

        mean_val = float(np.mean([h["val_acc"][-1] for h in histories]))
        print(f"Epoch {epoch + 1}/{args.epochs} [parallel {k}-fold "
              f"{strategy}] ratio={ratio:.2f} "
              f"mean val acc {mean_val:.4f} ({time.time() - t0:.1f}s)")

        # Epoch-boundary preempt poll (single read; a final-epoch signal
        # just lets the run complete normally).
        if shutdown.requested and (epoch + 1) < args.epochs:
            return epoch + 1
    return 0

"""ResNet-50 fine-tuning orchestration: strategies x k-fold CV
(role of reference train_classifier.py:66-203 and :515-694).

Strategies (naming parity with train_classifier.py:108,:547):
- baseline    real data only
- augmented   real + all synthetic, concatenated (ConcatDataset semantics)
- curriculum  real-length epochs with per-item Bernoulli(ratio) synthetic
              substitution, ratio stepped per epoch by the schedule

K-fold splits use sklearn KFold(shuffle=True, random_state=42) — the same
splitter and seed as data_loader.py:239 — so fold membership matches the
reference exactly. Best-val-accuracy checkpointing, history JSON, the CV
summary and all figures keep the reference filenames and schemas.

Known reference bug NOT reproduced: its single-run --use-synthetic path
crashes with a NameError (train_classifier.py:670 uses an undefined
``dataloaders``); here the single augmented run trains on real+synthetic
with the test set as validation.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.metrics import accuracy_score
from sklearn.model_selection import KFold

from xgan.data import rsna
from xgan.data.pipeline import DeviceStore, epoch_batches
from xgan.data.store import ImageStore, decode_folder_store
from xgan.io_.checkpoint import save_variables
from xgan.io_.figures_classifier import generate_plots
from xgan.io_.metrics import cv_summary, write_json
from xgan.models.resnet import ResNet50
from xgan.parallel import create_mesh
from xgan.parallel.tp import (model_parallel_from_args, shard_opt_state,
                              shard_over_model)
from xgan.train.classifier import (classifier_optimizer, make_eval_step,
                                   make_train_step, weighted_prf)
from xgan.train.common import ModelState
from xgan.train.curriculum import (get_current_synthetic_ratio,
                                   parse_curriculum_schedule)
from xgan.train.gan_loop import load_train_store, resolve_dtype
from xgan.train.loop_common import EpochProgress, GracefulShutdown, \
    batch_tail_mask, loss_live_postfix, trace_epoch
from xgan.utils import check_create_dir
from xgan.utils.timer import maybe_trace

KFOLD_SEED = 42  # split parity with reference data_loader.py:239


def _resnet_stages(args):
    """Hidden override for tests/debug: shrinks the bottleneck stage sizes
    (full ResNet-50 = (3, 4, 6, 3)). Long single-process CPU test runs can
    hit an XLA abort compiling many full-size vmapped programs."""
    return tuple(getattr(args, "resnet_stages", ()) or (3, 4, 6, 3))


def _init_resnet(args, dtype, rng):
    scope = getattr(args, "remat_scope", "block") or "block"
    if getattr(args, "remat", False) and scope == "block":
        # measured three ways (224px, 448px, ResNet-101 depth):
        # block-scope remat never buys max-batch on this chip —
        # boundary activations dominate (BENCH_DETAIL remat_*_ab)
        print("Note: --remat (block scope) costs ~1.2x step time and "
              "measured ZERO max-batch gain on this hardware at "
              "224/448px and ResNet-101 depth; try --remat-scope "
              "stage, or --grad-accum (measured 4x) for effective "
              "batch size.")
    model = ResNet50(num_classes=2, dtype=dtype,
                     stage_sizes=_resnet_stages(args),
                     remat=getattr(args, "remat", False),
                     remat_scope=scope)
    variables = model.init(
        rng, jnp.zeros((2, args.image_size, args.image_size, 3)),
        train=False)
    params, stats = variables["params"], variables["batch_stats"]
    pretrained = getattr(args, "pretrained_path", "")
    if pretrained:
        from xgan.models.pretrained import load_torch_resnet50
        # stage_sizes must match the model being initialized — a
        # checkpoint converted at the default (3,4,6,3) against a
        # shrunken --resnet-stages model (or vice versa) replaces the
        # params tree with a mismatched structure and fails much later
        # with an opaque flax error.
        loaded_p, loaded_s = load_torch_resnet50(
            pretrained, stage_sizes=_resnet_stages(args))
        fc = params["fc"]
        params = jax.tree_util.tree_map(jnp.asarray, loaded_p)
        if "fc" not in params:
            params["fc"] = fc
        stats = jax.tree_util.tree_map(jnp.asarray, loaded_s)
        print(f"Loaded ImageNet weights from {pretrained}")
    else:
        print("WARNING: no --pretrained-path given and torchvision weights "
              "cannot be downloaded here; training ResNet-50 from random "
              "init (throughput is unaffected; accuracy parity with the "
              "reference requires the ImageNet checkpoint).")
    return model, params, stats


def _epoch_pass(step_fn, state, device_stores, batches, ratio, key,
                n_samples, synth_pool=None, label="Train"):
    """Run one train phase; returns (state, loss, acc) with the wrap-around
    padding rows dropped (flattened[:n] is exactly the epoch permutation).
    ``synth_pool`` is forwarded when the step was built with
    ``pooled_synth=True`` (empty-synthetic fallback)."""
    losses_acc, preds_acc, labels_acc = [], [], []
    real, synth = device_stores
    extra = () if synth_pool is None else (synth_pool,)
    num_batches, batch_size = batches.shape
    t_mask = batch_tail_mask(n_samples, num_batches, batch_size)
    with EpochProgress(label, num_batches,
                       postfix_fn=loss_live_postfix) as progress:
        for i in range(batches.shape[0]):
            is_tail = t_mask is not None and i == num_batches - 1
            state, losses, preds, labels = step_fn(
                state, real.images, real.labels, synth.images, synth.labels,
                *extra, jnp.asarray(batches[i]), ratio,
                jax.random.fold_in(key, i),
                mask=jnp.asarray(t_mask) if is_tail else None)
            losses_acc.append(losses)
            preds_acc.append(preds)
            labels_acc.append(labels)
            progress.update(i + 1, losses)
    losses = np.concatenate(jax.device_get(losses_acc))[:n_samples]
    preds = np.concatenate(jax.device_get(preds_acc))[:n_samples]
    labels = np.concatenate(jax.device_get(labels_acc))[:n_samples]
    return state, float(losses.mean()), float(accuracy_score(labels, preds))


def _eval_pass(eval_fn, variables, store: DeviceStore, batches, n_samples,
               label="Evaluating"):
    losses_acc, preds_acc, labels_acc, probs_acc = [], [], [], []
    with EpochProgress(label, batches.shape[0],
                       postfix_fn=loss_live_postfix) as progress:
        for i in range(batches.shape[0]):
            losses, preds, labels, probs = eval_fn(variables, store.images,
                                                   jnp.asarray(batches[i]),
                                                   store.labels)
            losses_acc.append(losses)
            preds_acc.append(preds)
            labels_acc.append(labels)
            probs_acc.append(probs)
            progress.update(i + 1, losses)
    losses = np.concatenate(jax.device_get(losses_acc))[:n_samples]
    preds = np.concatenate(jax.device_get(preds_acc))[:n_samples]
    labels = np.concatenate(jax.device_get(labels_acc))[:n_samples]
    probs = np.concatenate(jax.device_get(probs_acc))[:n_samples]
    return losses, preds, labels, probs


def evaluate_model(eval_fn, variables, store: DeviceStore, batch_size):
    """Test-set metrics dict: the reference's keys
    (train_classifier.py:241-247) plus ``auroc`` (the BASELINE.json
    north-star quality metric; extra JSON keys are schema-compatible)."""
    n = len(store)
    batches = epoch_batches(n, batch_size, np.random.default_rng(0),
                            shuffle=False)
    losses, preds, labels, probs = _eval_pass(eval_fn, variables, store,
                                              batches, n)
    p, r, f = weighted_prf(labels, preds)
    try:
        from sklearn.metrics import roc_auc_score
        auroc = float(roc_auc_score(labels, probs))
    except ValueError:  # single-class eval set (tiny fixtures)
        auroc = 0.5
    metrics = {
        "loss": float(losses.mean()),
        "accuracy": float(accuracy_score(labels, preds)),
        "weighted_precision": p,
        "weighted_recall": r,
        "weighted_f1_score": f,
        "auroc": auroc,
    }
    print(f"Evaluation Results - Loss: {metrics['loss']:.4f}, "
          f"Accuracy: {metrics['accuracy']:.4f}, "
          f"Weighted F1: {metrics['weighted_f1_score']:.4f}, "
          f"AUROC: {metrics['auroc']:.4f}")
    return metrics


def fallback_pool(real_dev, train_indices):
    """The reference PhasedAugmentedDataset empty-synthetic fallback
    (data_loader.py:527-536): a synthetic draw substitutes a random real
    POSITIVE from the run's train split (any real row if the split has
    no positives), with its own label. Returns the (P,) int32 row pool
    into the REAL store — the mixer draws through it with zero image
    copies (mix_batch synth_pool)."""
    tr = np.asarray(train_indices, np.int64)
    pos = tr[real_dev.labels_host[tr] == 1]
    pool = pos if pos.size else tr
    print("Curriculum fallback: substituting random real "
          f"{'positives' if pos.size else 'samples'} for the empty "
          "synthetic store.")
    return jnp.asarray(pool.astype(np.int32))


def train_one_run(args, mesh_ctx, dtype, stores, train_indices, val_spec,
                  *, fold, strategy, schedule, seed_offset=0,
                  synth_fallback=False, shutdown=None):
    """Train one model (one fold or the single run).

    val_spec: (DeviceStore, indices or None) evaluated with eval transforms.
    Returns (best_variables, history).

    shutdown: optional GracefulShutdown polled at each epoch boundary.
    A preempted FOLD skips its history write so fold-level resume sees
    it as incomplete and retrains it (a fold that looks complete but
    trained fewer epochs would silently bias the CV summary); the
    single run keeps its history — it has no resume path, so its
    partial artifacts are the only record of the training that ran.
    """
    real_dev, synth_dev, _ = stores
    mode = {"baseline": "real", "augmented": "concat",
            "curriculum": "mix"}[strategy]

    synth_pool = None
    if mode == "mix" and synth_fallback:
        synth_pool = fallback_pool(real_dev, train_indices)
        synth_dev = real_dev  # alias: pool values index the real store

    rng = jax.random.key(args.seed + seed_offset)
    k_init, k_train = jax.random.split(rng)
    model, params, stats = _init_resnet(args, dtype, k_init)
    tx = classifier_optimizer(args.lr, freeze_base=not args.unfreeze)
    state = ModelState(params=params, batch_stats=stats,
                       opt_state=tx.init(params))
    # With --model-parallel N the wide layers' params/moments/BN stats
    # shard over the mesh's 'model' axis (xgan/parallel/tp.py); N=1 is
    # exactly replicate(). Equality with the replicated run is pinned by
    # tests/test_tp.py and the driver's dryrun_multichip.
    state = shard_over_model(mesh_ctx, state)
    if getattr(args, "shard_opt_state", False):  # ZeRO-1 Adam moments
        state = shard_opt_state(mesh_ctx, state)

    bsh = mesh_ctx.batch_sharding(4)
    # SPMD-safe since round 2: the kernel shard_maps over the batch axis
    # (xgan/ops/pallas/gather.py:mixed_gather_spmd), so multi-device
    # meshes keep the single-DMA-per-sample path too.
    # the Pallas kernel DMAs rows from locally-complete stores, so a
    # sharded store (--shard-store) falls back to the psum gather
    use_pallas = (jax.default_backend() == "tpu" and mode != "real"
                  and not real_dev.sharded)
    n_real = len(real_dev)  # LOGICAL length: a sharded store is padded,
    # so the steps must not read the real/synth boundary off .shape[0]
    ga = int(getattr(args, "grad_accum", 1) or 1)
    if ga > 1 and mesh_ctx.pad_batch(args.batch_size) % ga:
        print(f"Note: --grad-accum {ga} does not divide the "
              f"(device-padded) batch size "
              f"{mesh_ctx.pad_batch(args.batch_size)}; running without "
              "accumulation.")
        ga = 1
    train_step = make_train_step(model, tx, mode=mode, dtype=dtype,
                                 batch_sharding=bsh,
                                 use_pallas_gather=use_pallas,
                                 pooled_synth=synth_pool is not None,
                                 real_take=real_dev.take,
                                 synth_take=synth_dev.take,
                                 n_real=n_real, grad_accum=ga)
    # eval gathers from THIS run's val store (real folds or the test
    # store) — its take closure carries that store's shard geometry
    eval_step = make_eval_step(model, dtype=dtype, batch_sharding=bsh,
                               take=val_spec[0].take)

    batch_size = mesh_ctx.pad_batch(args.batch_size)
    if strategy == "augmented" and not synth_fallback:
        epoch_space = np.concatenate([
            np.asarray(train_indices, np.int64),
            n_real + np.arange(len(synth_dev), dtype=np.int64)])
    elif strategy == "augmented":
        # empty synthetic store: ConcatDataset([real, []]) == real
        # (reference data_loader.py:575 with a 0-length SyntheticDataset)
        epoch_space = np.asarray(train_indices, np.int64)
    else:
        epoch_space = np.asarray(train_indices, np.int64)

    val_store, val_indices = val_spec
    n_val = len(val_indices) if val_indices is not None else len(val_store)

    fold_prefix = f"fold_{fold}_" if fold is not None else ""
    run_prefix = f"{fold_prefix}{strategy}_"
    history = {"epoch": [], "train_loss": [], "train_acc": [],
               "val_loss": [], "val_acc": [], "synthetic_ratio": []}
    best_acc, best_vars = 0.0, jax.device_get(
        {"params": state.params, "batch_stats": state.batch_stats})
    data_rng = np.random.default_rng(args.seed + seed_offset)

    for epoch in range(args.epochs):
        t0 = time.time()
        ratio = 0.0
        if strategy == "curriculum" and schedule:
            ratio = get_current_synthetic_ratio(epoch, schedule)
        elif strategy == "augmented":
            ratio = 1.0  # flag value mirroring train_classifier.py:130
        history["epoch"].append(epoch + 1)
        history["synthetic_ratio"].append(
            ratio if strategy == "curriculum" else
            (1.0 if strategy == "augmented" else 0.0))

        batches = epoch_batches(len(epoch_space), batch_size, data_rng,
                                indices=epoch_space)
        if args.limit_batches:
            batches = batches[:args.limit_batches]
        n_seen = min(len(epoch_space), batches.size)
        # Optional XLA profiler capture of one post-compile train phase
        # (epoch 1 when there is one, else the only epoch).
        with maybe_trace(getattr(args, "trace_dir", "")
                         if epoch == trace_epoch(0, args.epochs)
                         else None):
            state, tr_loss, tr_acc = _epoch_pass(
                train_step, state, (real_dev, synth_dev), batches,
                jnp.float32(ratio), jax.random.fold_in(k_train, epoch),
                n_seen, synth_pool=synth_pool,
                label=f"Train Epoch {epoch + 1}")
        history["train_loss"].append(tr_loss)
        history["train_acc"].append(tr_acc)

        val_batches = epoch_batches(
            n_val, batch_size, data_rng, shuffle=False,
            indices=val_indices)
        if args.limit_batches:
            val_batches = val_batches[:args.limit_batches]
            n_val_seen = min(n_val, val_batches.size)
        else:
            n_val_seen = n_val
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        v_losses, v_preds, v_labels, _ = _eval_pass(
            eval_step, variables, val_store, val_batches, n_val_seen,
            label=f"Val Epoch {epoch + 1}")
        val_loss = float(v_losses.mean())
        val_acc = float(accuracy_score(v_labels, v_preds))
        history["val_loss"].append(val_loss)
        history["val_acc"].append(val_acc)

        print(f"Epoch {epoch + 1}/{args.epochs} "
              f"[{run_prefix[:-1]}] ratio={ratio:.2f} "
              f"train {tr_loss:.4f}/{tr_acc:.4f} "
              f"val {val_loss:.4f}/{val_acc:.4f} "
              f"({time.time() - t0:.1f}s)")

        if val_acc > best_acc:
            best_acc = val_acc
            best_vars = jax.device_get(variables)
            ckpt = os.path.join(args.model_dir, f"{run_prefix}resnet50.msgpack")
            save_variables(ckpt, best_vars)
            print(f"Saved best model checkpoint to {ckpt}")
            # torchvision-format twin so the reference analyzer's Grad-CAM
            # loads our runs unchanged (analyze_results.py:455-470; the
            # reference trainer writes the same name, train_classifier.py:182)
            from xgan.models.pretrained import save_torch_resnet50
            save_torch_resnet50(
                os.path.join(args.model_dir, f"{run_prefix}resnet50.pth"),
                best_vars["params"], best_vars["batch_stats"],
                stage_sizes=_resnet_stages(args))

        if (shutdown is not None and shutdown.requested
                and (epoch + 1) < args.epochs):
            break  # preempted: the caller reads completion off history

    if not (shutdown is not None and shutdown.requested
            and len(history["epoch"]) < args.epochs and fold is not None):
        write_json(os.path.join(args.results_dir,
                                f"{run_prefix}training_history.json"),
                   history)
    print(f"Best val Acc: {best_acc:.4f}")
    return best_vars, history


def _load_completed_fold(args, fold, strategy, dtype):
    """Fold-level resume: if a fold's history JSON and best checkpoint
    already exist (a prior interrupted CV run), load them instead of
    retraining. Returns (variables, history) or None."""
    import json
    hist_path = os.path.join(
        args.results_dir, f"fold_{fold}_{strategy}_training_history.json")
    ckpt_path = os.path.join(args.model_dir,
                             f"fold_{fold}_{strategy}_resnet50.msgpack")
    if not (os.path.exists(hist_path) and os.path.exists(ckpt_path)):
        return None
    with open(hist_path) as f:
        history = json.load(f)
    if len(history.get("epoch", [])) < args.epochs:
        return None  # fold was itself interrupted; retrain it
    from xgan.io_.checkpoint import load_variables_checked
    model = ResNet50(num_classes=2, dtype=dtype,
                     stage_sizes=_resnet_stages(args))
    like = model.init(jax.random.key(0),
                      jnp.zeros((1, args.image_size, args.image_size, 3)),
                      train=False)
    like = {"params": like["params"], "batch_stats": like["batch_stats"]}
    # A mismatched/corrupt fold checkpoint must NOT fall through to a
    # silent retrain (the silent-restart trap): the raised ValueError is
    # reported by the caller with the early-return convention.
    return load_variables_checked(
        ckpt_path, like,
        f"fold checkpoint {ckpt_path} does not match the current model "
        "flags"), history


def train_classifier(args):
    """Top-level flow (reference train_classifier.py:515-694)."""
    check_create_dir(args.model_dir)
    check_create_dir(args.results_dir)
    check_create_dir(args.figures_dir)

    schedule = None
    if args.use_curriculum:
        if not args.use_synthetic:
            print("Warning: --use-curriculum specified without "
                  "--use-synthetic. Curriculum schedule ignored.")
            args.use_curriculum = False
        else:
            schedule = parse_curriculum_schedule(args.curriculum_schedule)
            print(f"Parsed curriculum schedule: {schedule}")
            if not schedule:
                print("Warning: empty schedule; using simple augmentation.")
                args.use_curriculum = False

    strategy = ("curriculum" if args.use_synthetic and args.use_curriculum
                and schedule else
                ("augmented" if args.use_synthetic else "baseline"))
    run_prefix = f"{strategy}_"
    is_cv = args.k_folds > 1

    # Fail fast on explicit-path user errors (before any compile/decode):
    # a typo'd checkpoint path should not burn a training run.
    pretrained = getattr(args, "pretrained_path", "")
    if pretrained and not os.path.exists(pretrained):
        print(f"Error: pretrained checkpoint {pretrained} not found.")
        return None
    resume = getattr(args, "resume_from", "")
    if resume and resume != "auto":
        print("Error: the classifier supports only --resume-from auto "
              f"(fold-level resume); got {resume!r}.")
        return None
    if resume == "auto" and not is_cv:
        # Not silently a no-op: fold-level resume exists only under CV.
        print("Note: --resume-from auto has no effect on single (non-CV) "
              "classifier runs; training from scratch.")
    if resume == "auto" and is_cv and getattr(args, "parallel_folds",
                                              False):
        # Same convention: fold-level resume skips COMPLETED folds, which
        # only exists on the sequential path (parallel folds train in
        # lockstep — there is no per-fold completion to resume from).
        print("Note: --resume-from auto has no effect with "
              "--parallel-folds (folds train in lockstep); "
              "training all folds from scratch.")

    # --- Data ---
    try:
        train_store = load_train_store(args.data_dir, args.image_size,
                                       args.cache_dir)
    except FileNotFoundError as e:
        print(f"Error loading data: {e}")
        return None
    test_ids, test_labels = rsna.load_test_metadata(
        os.path.join(args.data_dir, "stage2_test_metadata.csv"))
    test_store = ImageStore.build(
        rsna.test_paths(args.data_dir, test_ids), test_labels,
        args.image_size, cache_dir=args.cache_dir,
        name=f"test{args.image_size}")

    synth_fallback = False
    if args.use_synthetic:
        if not os.path.isdir(args.synthetic_dir):
            print(f"Error loading data: synthetic dir {args.synthetic_dir} "
                  "is missing. Generate images first.")
            return None
        has_pngs = any(f.endswith(".png")
                       for f in os.listdir(args.synthetic_dir))
        if not has_pngs:
            # reference parity (data_loader.py:509-510, 527-536): an
            # existing-but-empty synthetic dir is a warning, not an error;
            # curriculum substitutes random real positives per draw and
            # plain augmentation concatenates nothing.
            print("Warning: Synthetic dataset is empty or None.")
            synth_fallback = True
    if args.use_synthetic and not synth_fallback:
        synth_store = decode_folder_store(
            args.synthetic_dir, args.image_size, label=1,
            cache_dir=args.cache_dir, name=f"synth{args.image_size}")
    else:  # 1-image dummy store keeps step signatures static
        synth_store = ImageStore(
            images=np.zeros((1, args.image_size, args.image_size, 3),
                            np.uint8),
            labels=np.ones((1,), np.int32), size=args.image_size)

    model_parallel = model_parallel_from_args(args)
    if model_parallel > 1 and getattr(args, "parallel_folds", False):
        # the fold axis owns the mesh in that mode (parallel_folds.py
        # builds its own ('fold','data') mesh); composing TP under it is
        # a different program — run one or the other.
        print("Note: --model-parallel is ignored with --parallel-folds "
              "(the fold axis owns the mesh); training with replicated "
              "params.")
        model_parallel = 1
    mesh_ctx = create_mesh(model_parallel=model_parallel)
    dtype = resolve_dtype(args.compute_dtype)
    print(f"Mesh: {dict(mesh_ctx.mesh.shape)}; compute dtype "
          f"{dtype.__name__}; strategy {strategy}; k_folds {args.k_folds}")
    if (getattr(args, "steps_per_call", 1) or 1) > 1:
        # Measured: the 224px classifier step (~13 ms) fully hides
        # dispatch, so multi-step scan buys ~nothing here (BENCH_DETAIL
        # multistep_dispatch_ab); the flag is a GAN-trainer optimization.
        print("Note: --steps-per-call applies to the GAN trainers; "
              "ignored for classifier training.")
    # --grad-accum composes with --parallel-folds since r5: the
    # microbatch scan rides inside the vmapped fold step
    # (parallel_folds.make_parallel_steps grad_accum; equality vs the
    # sequential per-fold grad-accum steps in tests/test_parallel_cv.py)
    shard_store = getattr(args, "shard_store", False)
    if shard_store and getattr(args, "parallel_folds", False):
        # parallel folds owns a different ('fold','data') mesh and its
        # steps gather locally per fold-group — composing a store shard
        # under it is a different program; run one or the other.
        print("Note: --shard-store is ignored with --parallel-folds; "
              "replicating the stores.")
        shard_store = False
    if (getattr(args, "shard_opt_state", False)
            and getattr(args, "parallel_folds", False)):
        # same mesh-ownership conflict as --model-parallel above: the
        # fold program owns the ('fold','data') mesh, so ZeRO-1 moment
        # sharding never runs there — say so instead of silently doing
        # nothing (the user is reasoning about HBM headroom)
        print("Note: --shard-opt-state is ignored with --parallel-folds "
              "(the fold axis owns the mesh); Adam moments stay "
              "replicated.")
        args.shard_opt_state = False
    # real + test stores carry the dataset memory; the synthetic store
    # stays replicated (it is generated, typically far smaller, and the
    # curriculum fallback aliases it to the real store — which IS
    # sharded then, via the aliased take).
    real_dev = DeviceStore(train_store, mesh_ctx, shard=shard_store)
    synth_dev = DeviceStore(synth_store, mesh_ctx)
    test_dev = DeviceStore(test_store, mesh_ctx, shard=shard_store)
    stores = (real_dev, synth_dev, test_dev)

    eval_model = ResNet50(num_classes=2, dtype=dtype,
                          stage_sizes=_resnet_stages(args))
    eval_step = make_eval_step(eval_model, dtype=dtype,
                               batch_sharding=mesh_ctx.batch_sharding(4),
                               take=test_dev.take)
    batch_size = mesh_ctx.pad_batch(args.batch_size)

    if is_cv and getattr(args, "parallel_folds", False):
        from xgan.train.parallel_cv import run_parallel_cv
        kf = KFold(n_splits=args.k_folds, shuffle=True,
                   random_state=KFOLD_SEED)
        splits = list(kf.split(range(len(train_store))))
        result = run_parallel_cv(
            args, mesh_ctx, dtype, stores, splits, strategy=strategy,
            schedule=schedule, init_resnet=_init_resnet,
            synth_fallback=synth_fallback)
        if result is None:  # preempted: notice already printed; no
            return None     # summary from incomplete lockstep folds
        best_vars, fold_histories = result
        fold_metrics = []
        for fold, bv in enumerate(best_vars):
            print(f"--- Evaluating Fold {fold + 1} Model on Test Set ---")
            fold_metrics.append(
                evaluate_model(eval_step, bv, test_dev, batch_size))
        summary = cv_summary(fold_metrics)
        print("\n===== Cross-Validation Summary (parallel folds) =====")
        for key, v in summary["average"].items():
            print(f"Average {key}: {v:.4f} +/- {summary['std_dev'][key]:.4f}")
        write_json(os.path.join(args.results_dir,
                                f"{run_prefix}cv_summary.json"), summary)
        generate_plots(fold_histories, args.figures_dir, run_prefix,
                       cv_results=summary)
        return summary

    if is_cv:
        kf = KFold(n_splits=args.k_folds, shuffle=True,
                   random_state=KFOLD_SEED)
        fold_metrics, fold_histories = [], []
        resume = getattr(args, "resume_from", "") == "auto"
        # SIGTERM/SIGINT → finish the current epoch, stop cleanly. A
        # completed fold's artifacts are already on disk, so
        # --resume-from auto skips it; an incomplete fold retrains.
        shutdown = GracefulShutdown("cross-validation")
        shutdown.install()
        try:
            for fold, (tr_idx, val_idx) in enumerate(
                    kf.split(range(len(train_store)))):
                print(f"\n===== Fold {fold + 1} / {args.k_folds} =====")
                try:
                    done = _load_completed_fold(args, fold + 1, strategy,
                                                dtype) if resume else None
                except ValueError as e:
                    print(f"Error: {e}")
                    return None
                if done is not None:
                    print(f"Resuming: fold {fold + 1} already trained; "
                          "loading its checkpoint and history.")
                    best_vars, history = done
                else:
                    best_vars, history = train_one_run(
                        args, mesh_ctx, dtype, stores, tr_idx,
                        (real_dev, val_idx), fold=fold + 1,
                        strategy=strategy, schedule=schedule,
                        seed_offset=fold, synth_fallback=synth_fallback,
                        shutdown=shutdown)
                if (shutdown.requested
                        and len(history["epoch"]) < args.epochs):
                    print(f"Preempted: fold {fold + 1} is incomplete "
                          "and will retrain on --resume-from auto; no "
                          "summary written.")
                    return None
                fold_histories.append(history)
                print(f"--- Evaluating Fold {fold + 1} Model on Test "
                      "Set ---")
                metrics = evaluate_model(eval_step, best_vars, test_dev,
                                         batch_size)
                fold_metrics.append(metrics)
                if shutdown.requested and fold + 1 < args.k_folds:
                    print(f"Preempted: stopping after completed fold "
                          f"{fold + 1}; re-run with --resume-from auto "
                          "to train the remaining folds (no summary "
                          "written).")
                    return None
        finally:
            shutdown.restore()

        summary = cv_summary(fold_metrics)
        print("\n===== Cross-Validation Summary =====")
        for k, v in summary["average"].items():
            print(f"Average {k}: {v:.4f} +/- {summary['std_dev'][k]:.4f}")
        write_json(os.path.join(args.results_dir,
                                f"{run_prefix}cv_summary.json"), summary)
        generate_plots(fold_histories, args.figures_dir, run_prefix,
                       cv_results=summary)
        return summary

    # Single run: test set doubles as validation (reference behavior,
    # train_classifier.py:592-594).
    print("Warning: using test set as validation for non-CV run.")
    shutdown = GracefulShutdown()
    shutdown.install()
    try:
        best_vars, history = train_one_run(
            args, mesh_ctx, dtype, stores, np.arange(len(train_store)),
            (test_dev, None), fold=None, strategy=strategy,
            schedule=schedule, synth_fallback=synth_fallback,
            shutdown=shutdown)
    finally:
        shutdown.restore()
    if shutdown.requested and len(history["epoch"]) < args.epochs:
        # no resume path for single runs: keep the partial artifacts
        # (best checkpoint + history) and say what the metrics mean
        print(f"Note: run preempted after epoch {len(history['epoch'])}"
              f"/{args.epochs}; metrics below reflect the best "
              "checkpoint reached so far.")
    metrics = evaluate_model(eval_step, best_vars, test_dev, batch_size)
    write_json(os.path.join(args.results_dir,
                            f"{run_prefix}final_metrics.json"),
               {"config": vars(args), "metrics": metrics})
    generate_plots([history], args.figures_dir, run_prefix)
    return metrics

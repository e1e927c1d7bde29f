"""Classifier train/eval steps: jitted cross-entropy fine-tuning of
ResNet-50 with the three augmentation strategies as on-device batch sources.

Replaces the reference hot loop (train_classifier.py:136-166): a single
jitted step fuses gather (real store / virtual-concat real+synthetic /
curriculum Bernoulli mix), flip+normalize, the forward/backward and the
optimizer update. Per-sample losses and predictions stay on device and are
fetched once per epoch.

Base-freezing (reference classifier.py:19-21 via --unfreeze) is an
optax.multi_transform: only ``fc`` receives updates; BatchNorm running
statistics still advance in train mode, exactly like a frozen torch
backbone in ``model.train()``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from xgan.data.mixer import mix_batch
from xgan.data.pipeline import normalize_images, random_flip, take_rows
from xgan.train.common import ModelState, apply_updates, weighted_mean


def classifier_optimizer(lr: float, freeze_base: bool):
    """Adam over all params, or fc-only when the base is frozen."""
    inner = optax.adam(lr, eps=1e-8)
    if not freeze_base:
        return inner

    def label_fn(params):
        return {k: ("train" if k == "fc" else "freeze") for k in params}
    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, label_fn)


def softmax_ce(logits, labels):
    """Per-sample CE, matching torch nn.CrossEntropyLoss reduction='none'."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels)


def gather_concat(real_u8, real_labels, synth_u8, synth_labels, idx,
                  *, use_pallas: bool = False, sharding=None,
                  pallas_interpret: bool = False, real_take=None,
                  synth_take=None, n_real=None):
    """Virtual ConcatDataset gather: idx < n_real -> real, else synthetic.

    Mirrors ConcatDataset([real_subset, synthetic]) ordering
    (data_loader.py:575,:642) without materializing a combined array.
    ``use_pallas`` switches to the single-DMA-per-sample kernel
    (xgan.ops.pallas.gather); with ``sharding`` set it runs shard_mapped
    over the batch axis, so it also works under SPMD.
    ``real_take``/``synth_take`` override the row gathers (sharded
    stores); ``n_real`` must then be the LOGICAL real count — a sharded
    store's array is padded, so real_u8.shape[0] would misplace the
    real/synthetic boundary.
    """
    if n_real is None:
        n_real = real_u8.shape[0]
    is_real = idx < n_real
    r_idx = jnp.where(is_real, idx, 0)
    s_idx = jnp.where(is_real, 0, idx - n_real)
    if use_pallas:
        # the Pallas kernel DMAs rows from locally-complete stores;
        # loops disable it under --shard-store
        from xgan.ops.pallas.gather import mixed_gather_spmd
        imgs = mixed_gather_spmd(real_u8, synth_u8, r_idx, s_idx,
                                 jnp.logical_not(is_real),
                                 sharding=sharding,
                                 interpret=pallas_interpret)
    else:
        imgs = jnp.where(is_real[:, None, None, None],
                         (real_take or take_rows)(real_u8, r_idx),
                         (synth_take or take_rows)(synth_u8, s_idx))
    labels = jnp.where(is_real, jnp.take(real_labels, r_idx, axis=0),
                       jnp.take(synth_labels, s_idx, axis=0))
    return imgs, labels


def _microbatch_grads(model, state, imgs, labels, mask, k: int,
                      batch_sharding):
    """Gradient accumulation over ``k`` microbatches in one program.

    A lax.scan walks (k, B/k, ...) slices of the assembled batch: each
    iteration runs forward+backward on ONE microbatch (so only its
    activations are live — ~k× less activation memory than the fused
    full-batch backward), accumulates the gradient of the valid-row
    loss SUM, and advances BN running statistics sequentially. After
    the scan the summed gradient is divided by the full batch's valid
    count, yielding the same valid-row-weighted loss mean the K=1 path
    differentiates. This is torch gradient-accumulation semantics
    (loss.backward() per microbatch, one optimizer.step()): BN batch
    statistics are per-microbatch, not full-batch.

    Returns (per-sample losses (B,), logits (B,C), new_batch_stats,
    grads). Raises if k does not divide the batch.
    """
    B = imgs.shape[0]
    if B % k:
        raise ValueError(f"grad_accum={k} must divide batch size {B}")
    mb = B // k

    def split(x):
        return x.reshape((k, mb) + x.shape[1:])

    imgs_k, labels_k = split(imgs), split(labels)
    mask_k = None if mask is None else split(mask)
    if batch_sharding is not None:
        # keep each microbatch row-sharded over the data axis: the
        # leading scan axis is unsharded, rows shard as before
        from jax.sharding import NamedSharding, PartitionSpec
        imgs_k = jax.lax.with_sharding_constraint(
            imgs_k, NamedSharding(batch_sharding.mesh,
                                  PartitionSpec(None,
                                                *batch_sharding.spec)))

    def micro(carry, xs):
        stats, gsum = carry
        if mask_k is None:
            imgs_mb, labels_mb = xs
            mask_mb = None
            mkw = {}
        else:
            imgs_mb, labels_mb, mask_mb = xs
            mkw = {"mask": mask_mb}

        def loss_fn(params):
            logits, upd = model.apply(
                {"params": params, "batch_stats": stats}, imgs_mb,
                train=True, mutable=["batch_stats"], **mkw)
            losses = softmax_ce(logits, labels_mb)
            if mask_mb is None:
                wsum = jnp.sum(losses)
            else:
                # where-guard: a FULLY-padded microbatch (tail batch
                # shorter than (k-1) microbatches) can carry NaN
                # per-sample losses; select-then-sum keeps the forward
                # AND the cotangent clean (jnp.where backward routes 0
                # to the untaken branch)
                wsum = jnp.sum(jnp.where(
                    mask_mb > 0,
                    losses * mask_mb.astype(jnp.float32), 0.0))
            return wsum, (losses, logits, upd["batch_stats"])

        (_, (losses, logits, new_stats)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if mask_mb is not None:
            # A FULLY-padded microbatch must contribute nothing: its
            # masked BN statistics are the 0-mean/0-var placeholder,
            # whose scale/sqrt(eps) amplification overflows through
            # depth to NaN logits — and a zero COTANGENT does not kill
            # a NaN jacobian (0*NaN=NaN), so its gradient is
            # NaN-poisoned no matter how the loss masks it. Freeze the
            # running stats and select-zero the gradient (jnp.where is
            # a select: NaN in the untaken branch is discarded).
            ok = jnp.sum(mask_mb) > 0
            new_stats = jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new_stats, stats)
            g = jax.tree_util.tree_map(
                lambda t: jnp.where(ok, t, jnp.zeros_like(t)), g)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        return (new_stats, gsum), (losses, logits)

    xs = ((imgs_k, labels_k) if mask_k is None
          else (imgs_k, labels_k, mask_k))
    zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    (new_stats, gsum), (losses_k, logits_k) = jax.lax.scan(
        micro, (state.batch_stats, zeros), xs)
    total_w = (jnp.float32(B) if mask is None
               else jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1e-9))
    grads = jax.tree_util.tree_map(lambda g: g / total_w, gsum)
    return (losses_k.reshape(B),
            logits_k.reshape((B,) + logits_k.shape[2:]), new_stats, grads)


def make_train_step(model, tx, *, mode: str, dtype=jnp.float32,
                    batch_sharding=None, use_pallas_gather: bool = False,
                    jit_compile: bool = True, pooled_synth: bool = False,
                    pallas_interpret: bool = False, real_take=None,
                    synth_take=None, n_real=None, grad_accum: int = 1):
    """mode: 'real' | 'concat' | 'mix'.

    step(state, real_u8, real_labels, synth_u8, synth_labels, idx, ratio,
    key) -> (state, per_sample_loss (B,), preds (B,), labels (B,)).
    For 'real' and 'concat' the ratio argument is ignored.
    ``use_pallas_gather`` enables the single-DMA mixed-source gather
    kernel (TPU backend; under SPMD it is shard_mapped over the batch
    axis of ``batch_sharding`` — each device gathers its local rows).
    ``jit_compile=False`` returns the raw traceable function (for the
    parallel-folds vmap wrapper).
    ``pooled_synth`` (mix mode): the step takes an extra ``synth_pool``
    (P,) int32 argument after ``synth_labels``; synthetic draws pick
    from the pool, whose VALUES index the synthetic store. This is the
    reference's empty-synthetic-dir fallback (data_loader.py:527-536)
    with the store aliased to the real store — no image copies.
    ``grad_accum`` K>1: the batch is processed as K sequential
    microbatches inside one program (lax.scan) — gradients accumulate
    and one optimizer update fires, so only ONE microbatch's
    activations are live at a time (~K× activation-memory reduction;
    the real max-effective-batch lever where --remat measured none).
    Semantics are torch gradient accumulation: BN batch statistics are
    per-microbatch and running stats update sequentially, the gradient
    is the valid-row-weighted mean over the FULL batch. Exactly equal
    to the full-batch step for BN-free models; for BN models it equals
    the sequential small-batch reference computation (pinned in
    tests/test_grad_accum.py).
    """
    def assemble(real_u8, real_labels, synth_u8, synth_labels, synth_pool,
                 idx, ratio, key):
        if mode == "real":
            imgs = (real_take or take_rows)(real_u8, idx)
            labels = jnp.take(real_labels, idx, axis=0)
        elif mode == "concat":
            imgs, labels = gather_concat(real_u8, real_labels, synth_u8,
                                         synth_labels, idx,
                                         use_pallas=use_pallas_gather,
                                         sharding=batch_sharding,
                                         pallas_interpret=pallas_interpret,
                                         real_take=real_take,
                                         synth_take=synth_take,
                                         n_real=n_real)
        elif mode == "mix":
            imgs, labels = mix_batch(real_u8, real_labels, idx, synth_u8,
                                     synth_labels, ratio, key,
                                     synth_pool=synth_pool,
                                     use_pallas=use_pallas_gather,
                                     sharding=batch_sharding,
                                     pallas_interpret=pallas_interpret,
                                     real_take=real_take,
                                     synth_take=synth_take)
        else:
            raise ValueError(mode)
        return imgs, labels

    def step(state: ModelState, real_u8, real_labels, synth_u8,
             synth_labels, *rest, mask=None):
        # ``mask`` (None or (B,) 0/1 float): tail-exact semantics — the
        # wrap-padded rows of a short final batch are excluded from the
        # gradient's loss mean and from BN batch statistics, reproducing
        # the reference DataLoader's smaller last batch
        # (data_loader.py:189-197). Per-sample losses/preds still cover
        # all rows; the epoch loops already drop padded rows from
        # metrics.
        if pooled_synth:
            synth_pool, idx, ratio, key = rest
        else:
            synth_pool = None
            idx, ratio, key = rest
        k_mix, k_flip = jax.random.split(key)
        imgs_u8, labels = assemble(real_u8, real_labels, synth_u8,
                                   synth_labels, synth_pool, idx, ratio,
                                   k_mix)
        if batch_sharding is not None:
            imgs_u8 = jax.lax.with_sharding_constraint(imgs_u8,
                                                       batch_sharding)
        imgs_u8 = random_flip(imgs_u8, k_flip)
        imgs = normalize_images(imgs_u8, dtype=dtype)

        # pass mask only when set, so mask-unaware models (test doubles,
        # custom backbones) keep working on the unmasked path
        mkw = {} if mask is None else {"mask": mask}

        if grad_accum == 1:
            def loss_fn(params):
                logits, upd = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    imgs, train=True, mutable=["batch_stats"], **mkw)
                losses = softmax_ce(logits, labels)
                return weighted_mean(losses, mask), (losses, logits,
                                                     upd["batch_stats"])

            (_, (losses, logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        else:
            losses, logits, new_stats, grads = _microbatch_grads(
                model, state, imgs, labels, mask, grad_accum,
                batch_sharding)
        new_state = apply_updates(tx, state, grads, new_stats)
        if mask is not None:
            # A fully-padded batch (parallel folds in lockstep: a short
            # fold past its epoch end) must be a NO-OP — params, BN
            # running stats AND optimizer moments/count stay frozen, as
            # if the reference's sequential fold loop had simply ended.
            any_valid = jnp.sum(mask) > 0
            new_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(any_valid, new, old),
                new_state, state)
        state = new_state
        preds = jnp.argmax(logits, axis=-1)
        return state, losses, preds, labels

    if not jit_compile:
        return step
    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model, *, dtype=jnp.float32, batch_sharding=None,
                   jit_compile: bool = True, take=None):
    """Eval: running-stats BN, no flip. Returns (per-sample loss, preds,
    labels, positive-class probability). ``take`` overrides the row
    gather (sharded stores)."""
    def step(variables, images_u8, idx, labels_all):
        imgs_u8 = (take or take_rows)(images_u8, idx)
        labels = jnp.take(labels_all, idx, axis=0)
        if batch_sharding is not None:
            imgs_u8 = jax.lax.with_sharding_constraint(imgs_u8,
                                                       batch_sharding)
        imgs = normalize_images(imgs_u8, dtype=dtype)
        logits = model.apply(variables, imgs, train=False)
        # positive-class probability, for AUROC (north-star metric; the
        # reference computes only acc/P/R/F1, train_classifier.py:239)
        prob1 = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]
        return (softmax_ce(logits, labels), jnp.argmax(logits, -1),
                labels, prob1)

    if not jit_compile:
        return step
    return jax.jit(step)


def weighted_prf(labels, preds) -> Tuple[float, float, float]:
    """Weighted precision/recall/F1 via sklearn (host-side, tiny) —
    bit-identical to the reference's metric call
    (train_classifier.py:239)."""
    from sklearn.metrics import precision_recall_fscore_support
    p, r, f, _ = precision_recall_fscore_support(
        labels, preds, average="weighted", zero_division=0)
    return float(p), float(r), float(f)

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


def make_train_step(model, tx, *, mode: str, dtype=jnp.float32,
                    batch_sharding=None, use_pallas_gather: bool = False,
                    jit_compile: bool = True, pooled_synth: bool = False,
                    pallas_interpret: bool = False, real_take=None,
                    synth_take=None, n_real=None):
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

        def loss_fn(params):
            logits, upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"], **mkw)
            losses = softmax_ce(logits, labels)
            return weighted_mean(losses, mask), (losses, logits,
                                                 upd["batch_stats"])

        (_, (losses, logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
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

"""Validity-weighted reductions shared by the trainer losses.

These implement the reference's reduction semantics over a SMALLER final
batch (torch DataLoader drop_last=False, reference data_loader.py:189-197)
on wrap-padded static-shape batches: padded rows carry weight 0 and the
mean covers only valid rows. Lives in ops/ (not train/) so model-level
losses (xgan/models/vgg.py) can share the exact same guard without a
models->train import.
"""
from __future__ import annotations

import jax.numpy as jnp


def weighted_mean(values: jnp.ndarray, weights=None) -> jnp.ndarray:
    """Mean of ``values``, or the weights-weighted mean — the reduction
    the reference applies over its SMALLER final batch (tail-batch
    exactness: padded rows carry weight 0)."""
    values = values.astype(jnp.float32)
    if weights is None:
        return jnp.mean(values)
    w = weights.astype(jnp.float32)
    # max(sum, eps): an ALL-ZERO mask (a fully-padded lockstep batch in
    # parallel folds) avoids a 0/0. The result is 0 only for FINITE
    # values; NaN per-sample values in masked rows (which fully-padded
    # batches do produce) still propagate through sum(values * w) — by
    # design: consumers must freeze the state / drop the metric for such
    # batches (classifier step empty-batch freeze), not trust this
    # reduction to launder them.
    return jnp.sum(values * w) / jnp.maximum(jnp.sum(w), 1e-9)


def per_sample_mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(B,) mean-squared error per sample, reduced over all other dims."""
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(jnp.square(d).reshape(d.shape[0], -1), axis=1)


def layerwise_mse(feats_a, feats_b, weights=None) -> jnp.ndarray:
    """Sum over layers of the (validity-weighted) per-layer MSE — the
    shape of both the CGAN feature-matching loss (reference
    train_cgan.py:75-76) and the VGG perceptual loss (train_cgan.py:66-73):
    torch's F.mse_loss per layer, summed."""
    total = jnp.float32(0.0)
    for a, b in zip(feats_a, feats_b):
        total = total + weighted_mean(per_sample_mse(a, b), weights)
    return total

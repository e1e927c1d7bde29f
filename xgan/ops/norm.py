"""BatchNorm with torch semantics, as pure functions.

Semantics mirrored from ``torch.nn.BatchNorm2d`` (used throughout the
reference models, e.g. reference src/dcgan.py:27-81):

- train mode: normalize with *biased* batch variance, update running stats
  with momentum 0.1 where ``running = (1-m)*running + m*batch_stat`` and the
  running variance uses the *unbiased* estimator.
- eval mode: normalize with running statistics.

Under jit with a batch sharded across a device mesh, ``jnp.mean`` over the
batch axis is a global reduction, so this is cross-replica sync-BN — a
deliberate upgrade over per-device BN (documented in SURVEY.md §7 hard part
No.2): statistics are identical to the reference's single-device run.

``mask`` (a (B,) 0/1 sample-validity vector) makes the statistics those of
the torch run's SMALLER final batch: the reference DataLoader's last batch
per epoch has B_t = N mod B rows (drop_last=False,
reference data_loader.py:189-197), while our batches are wrap-padded to a
static shape (pipeline.epoch_batches). Masked rows contribute nothing to
the batch mean/var or the running-stat update; they are still normalized
(with the masked statistics) so shapes stay static — their outputs are
garbage by contract and every downstream loss masks them too.

Statistics are always computed in float32 even when activations are bf16.
"""
from __future__ import annotations

import jax.numpy as jnp


def batch_norm_train(x, scale, bias, running_mean, running_var, *,
                     momentum: float = 0.1, eps: float = 1e-5, mask=None):
    """Train-mode BN over a NHWC (or N...C) tensor.

    Returns (y, new_running_mean, new_running_var); y has x.dtype.
    ``mask``: optional (B,) validity weights (see module docstring).
    """
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    if mask is None:
        mean = jnp.mean(x32, axis=axes)
        var = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean)
        n = 1
        for a in axes:
            n *= x.shape[a]
        n = jnp.float32(n)
    else:
        w = mask.astype(jnp.float32).reshape(
            (x.shape[0],) + (1,) * (x.ndim - 1))
        spatial = 1
        for a in axes[1:]:
            spatial *= x.shape[a]
        n = jnp.sum(w) * spatial  # valid elements per channel
        # max(n, 1): an all-zero mask (fully-padded lockstep batch in
        # parallel folds) must not produce NaN statistics; the caller
        # freezes running stats for such batches.
        denom = jnp.maximum(n, 1.0)
        mean = jnp.sum(x32 * w, axis=axes) / denom
        var = (jnp.sum(jnp.square(x32) * w, axis=axes) / denom
               - jnp.square(mean))
    var = jnp.maximum(var, 0.0)

    unbiased = var * (n / jnp.maximum(n - 1, 1))
    new_mean = (1.0 - momentum) * running_mean + momentum * mean
    new_var = (1.0 - momentum) * running_var + momentum * unbiased

    inv = scale.astype(jnp.float32) / jnp.sqrt(var + eps)
    y = (x32 - mean) * inv + bias.astype(jnp.float32)
    return y.astype(x.dtype), new_mean, new_var


def batch_norm_infer(x, scale, bias, running_mean, running_var, *,
                     eps: float = 1e-5):
    """Eval-mode BN using running statistics."""
    x32 = x.astype(jnp.float32)
    inv = scale.astype(jnp.float32) / jnp.sqrt(running_var + eps)
    y = (x32 - running_mean) * inv + bias.astype(jnp.float32)
    return y.astype(x.dtype)

"""Shared training-state plumbing for the GAN and classifier trainers."""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from xgan.ops.reduce import weighted_mean  # noqa: F401  (canonical home)


@flax.struct.dataclass
class ModelState:
    """Params + BN running stats + optimizer state for one network."""
    params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def adam(lr: float, beta1: float, beta2: float = 0.999) -> optax.GradientTransformation:
    """torch.optim.Adam-equivalent (eps 1e-8, bias correction)."""
    return optax.adam(lr, b1=beta1, b2=beta2, eps=1e-8)


def create_state(model, tx: optax.GradientTransformation, rng,
                 *example_args, **example_kwargs) -> ModelState:
    variables = model.init(rng, *example_args, **example_kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return ModelState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params))


def bce_with_logits(logits: jnp.ndarray, targets, weights=None) -> jnp.ndarray:
    """Mean binary cross-entropy on logits.

    Numerically-stable equivalent of the reference's Sigmoid+BCELoss
    (train_gan.py:90) and BCEWithLogitsLoss (train_cgan.py:111).
    ``targets`` may be a scalar (broadcast) or per-sample array;
    ``weights`` (optional, (B,)) makes the reduction a weighted mean for
    tail-exact smaller final batches.
    """
    logits = logits.astype(jnp.float32)
    targets = jnp.broadcast_to(jnp.asarray(targets, jnp.float32),
                               logits.shape)
    return weighted_mean(
        optax.sigmoid_binary_cross_entropy(logits, targets), weights)


def apply_updates(tx: optax.GradientTransformation, state: ModelState,
                  grads, new_batch_stats) -> ModelState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return ModelState(params=new_params, batch_stats=new_batch_stats,
                      opt_state=new_opt)

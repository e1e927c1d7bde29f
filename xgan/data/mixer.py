"""On-device curriculum mixer (the PhasedAugmentedDataset, TPU-style).

Reference semantics (data_loader.py:447-539): epoch length = len(real);
for each item an independent Bernoulli(ratio) draw decides whether to
substitute a uniformly-random synthetic image (always labeled positive);
``set_synthetic_ratio`` is called by the trainer each epoch
(train_classifier.py:126-128).

Here the same distribution is produced as one fused on-device select over
a whole batch: a (B,) Bernoulli mask chooses between the real gather and a
uniform gather from the synthetic store. ``ratio`` is a traced scalar, so
changing it per epoch does NOT recompile the step.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mix_batch(real_images_u8: jnp.ndarray, real_labels: jnp.ndarray,
              real_idx: jnp.ndarray,
              synth_images_u8: jnp.ndarray, synth_labels: jnp.ndarray,
              ratio: jnp.ndarray, key, *,
              synth_pool: jnp.ndarray | None = None,
              use_pallas: bool = False,
              sharding=None,
              pallas_interpret: bool = False,
              real_take=None,
              synth_take=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns a mixed uint8 batch and its labels.

    real_images_u8: (N_r, S, S, 3) store; real_idx: (B,) this batch's rows.
    synth_images_u8: (N_s, S, S, 3) store (non-empty).
    ratio: scalar in [0,1] — expected synthetic fraction.
    synth_pool: optional (P,) int32 row pool — the synthetic draw picks
    uniformly from the pool and the pool VALUE indexes the synthetic
    store. Used for the reference's empty-synthetic fallback
    (data_loader.py:527-536): the store aliases the real store and the
    pool is the split's positive rows, so no image copies are made.
    use_pallas: single-DMA-per-sample gather kernel (TPU path; the XLA
    path does two gathers + select). With ``sharding`` (the batch
    NamedSharding) it is shard_mapped over the data axis for SPMD.
    """
    k_mask, k_pick = jax.random.split(key)
    b = real_idx.shape[0]
    use_synth = jax.random.uniform(k_mask, (b,)) < ratio
    n_pool = (synth_pool.shape[0] if synth_pool is not None
              else synth_images_u8.shape[0])
    synth_idx = jax.random.randint(k_pick, (b,), 0, n_pool)
    if synth_pool is not None:
        synth_idx = jnp.take(synth_pool, synth_idx, axis=0)

    if use_pallas:
        from xgan.ops.pallas.gather import mixed_gather_spmd
        images = mixed_gather_spmd(real_images_u8, synth_images_u8,
                                   real_idx, synth_idx, use_synth,
                                   sharding=sharding,
                                   interpret=pallas_interpret)
    else:
        from xgan.data.pipeline import take_rows
        real_batch = (real_take or take_rows)(real_images_u8, real_idx)
        synth_batch = (synth_take or take_rows)(synth_images_u8,
                                                synth_idx)
        images = jnp.where(use_synth[:, None, None, None],
                           synth_batch, real_batch)

    real_lab = jnp.take(real_labels, real_idx, axis=0)
    synth_lab = jnp.take(synth_labels, synth_idx, axis=0)
    labels = jnp.where(use_synth, synth_lab, real_lab)
    return images, labels

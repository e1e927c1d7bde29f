"""Shared pieces of the three GAN epoch drivers.

gan_loop / wgan_loop / cgan_loop intentionally keep their step dispatch
inline (step signatures and metric shapes differ per trainer), but the
resume-history merge, the data-order RNG replay, and the sample-sheet
cadence are identical by contract — drifting copies of those caused the
round-2 --trace-dir gap, so they live here once.
"""
from __future__ import annotations

import json
import os

from xgan.data.pipeline import epoch_batches


def resume_history(history_path: str, history: dict, start_epoch: int):
    """On resume, reload the prior run's history JSON so the final file
    covers every epoch; a fresh run (or a key-set mismatch from an older
    version) keeps the empty template."""
    if start_epoch and os.path.exists(history_path):
        with open(history_path) as f:
            prior = json.load(f)
        if set(prior.keys()) == set(history.keys()):
            return prior
    return history


def replay_data_rng(n: int, batch_size: int, data_rng, start_epoch: int):
    """Advance the numpy data-order RNG past the epochs already trained,
    so a resumed run sees the same batch permutations it would have."""
    for _ in range(start_epoch):
        epoch_batches(n, batch_size, data_rng)


def grid_iters(iters: int, chunk: int, save_interval: int,
               last_epoch: bool, i: int, num_batches: int):
    """Iterations in [iters, iters+chunk) at which a sample sheet is due:
    the reference's every-save_interval cadence (train_gan.py:166-169)
    plus the final iteration of the final epoch. With chunked dispatch
    (--steps-per-call) the sheet renders the post-chunk state."""
    return [t for t in range(iters, iters + chunk)
            if t % save_interval == 0
            or (last_epoch and i + (t - iters) == num_batches - 1)]

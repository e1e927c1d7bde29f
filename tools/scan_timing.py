"""Shared scan-chained per-op timing.

The repo's hardened timing discipline for single ops on the remote-tunnel
backend (CLAUDE.md benchmarking pitfalls): K op applications chained
inside one jitted lax.scan (so the runtime can neither deduplicate
identical dispatches nor hoist the op out as loop-invariant — the carry
feeds back a tiny bump), chain lengths differenced for a slope that
cancels dispatch/sync overhead, median of reps. Used by bench_convt.py
and bench_pallas_convt.py.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def bench_op(op, x, w, *, k=16, iters=6, reps=3):
    """Per-op seconds: chained lax.scan(k) calls, median-of-reps slope."""
    def body(c, _):
        y = op(c, w)
        bump = (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(c.dtype)
        return c + bump, ()

    f = jax.jit(lambda x0: lax.scan(body, x0, None, length=k)[0])

    def chain(x0, n):
        t0 = time.time()
        for _ in range(n):
            x0 = f(x0)
        np.asarray(jax.device_get(jnp.sum(x0.astype(jnp.float32))))
        return time.time() - t0, x0

    _, x = chain(x, 1)  # compile + warm
    slopes = []
    for _ in range(reps):
        t1, x = chain(x, 2)
        t2, x = chain(x, 2 + iters)
        slopes.append((t2 - t1) / iters)
    return max(float(np.median(slopes)) / k, 1e-9)

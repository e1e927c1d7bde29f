"""Exponential moving average of generator weights (``--ema-decay``).

Beyond-reference capability (the reference trains and samples the raw
generator only, train_gan.py:141-146 / generate_synthetic.py:23-32).
Maintaining theta_ema <- d*theta_ema + (1-d)*theta and sampling from the
average is the standard GAN sample-quality lever (ProGAN/BigGAN/StyleGAN
practice): it smooths the Adam trajectory's oscillation around the
adversarial equilibrium without touching training dynamics at all.

TPU-native cost model: the update is one fused elementwise lerp over the
G parameter tree, computed INSIDE the already-jitted training step (and
inside the ``--steps-per-call`` scan body) — zero extra dispatches, no
host sync, and XLA fuses it with the Adam update's elementwise tail. The
EMA tree is donated through the step like the model states, so it costs
one extra copy of G's parameters in HBM and nothing else.

Training is bitwise unaffected: the EMA tree is write-only inside the
step (nothing reads it), pinned by tests/test_ema.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema, params, decay: float):
    """One EMA step: ``ema*decay + params*(1-decay)``, leafwise.

    Accumulates in the EMA tree's own dtype (f32 master weights); a
    bf16 compute-dtype model still EMAs its f32 params exactly.
    """
    d = jnp.float32(decay)
    return jax.tree_util.tree_map(
        lambda e, p: e * d + (1.0 - d) * p.astype(e.dtype), ema, params)


def init_ema(params):
    """EMA tree initialized to a COPY of the current params.

    Fresh buffers (``jnp.copy`` preserves shardings) — the jitted steps
    donate the EMA tree alongside the states, and aliasing the live
    param buffers would donate the same memory twice.
    """
    return jax.tree_util.tree_map(jnp.copy, params)


def dispatch_with_ema(fn, g_state, second_state, ema, *args, **kwargs):
    """Call a trainer step/multi function with or without EMA threading.

    The step factories return ``(g, second, *outs)`` without EMA and
    ``(g, second, ema, *outs)`` with it (EMA always third, right after
    the states). This adapter gives the epoch loops ONE call shape:
    ``g, second, ema, outs = dispatch_with_ema(fn, g, second, ema, ...)``
    where ``ema is None`` means disabled and ``outs`` is the tuple of
    remaining outputs.
    """
    if ema is None:
        out = fn(g_state, second_state, *args, **kwargs)
        return out[0], out[1], None, out[2:]
    out = fn(g_state, second_state, ema, *args, **kwargs)
    return out[0], out[1], out[2], out[3:]

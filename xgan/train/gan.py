"""DCGAN training: one fused XLA step + epoch orchestration.

The reference hot loop (train_gan.py:119-157, SURVEY.md §3.1) is
3 forwards + 3 backwards + 2 optimizer steps per batch in eager torch, with
five ``.item()`` device syncs per iteration. Here the ENTIRE iteration —
on-device gather/flip/normalize of the real batch, the D update (real +
fake halves as separate BN batches, exactly like the two reference
``backward()`` calls), the D optimizer step, and the G update through the
*updated* discriminator — is a single jitted program. Per-iteration metrics
(Loss_G, Loss_D, D(x), D(G(z)) before/after) stay on device and are
fetched once per epoch.

Update-order parity with the reference loop:
- D grads = d/dθ_D [BCE(D(real), 0.9) + BCE(D(G(z)).detach, 0.0)]
  (label smoothing real=0.9, train_gan.py:92-93,:127-138);
- optimizerD.step() precedes the G forward through D (:141-146), so the G
  update sees the new D parameters;
- the same noise/fake batch is reused for the G step (:132,:146) — we use
  one G forward via jax.vjp and pull the D-side gradient back through it,
  so G's BN running stats advance exactly once per iteration, as in torch;
- D's BN running stats advance three times per iteration (real, fake,
  fake-under-G-step), matching the three train-mode D forwards.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from xgan.data.pipeline import gather_preprocess
from xgan.train.common import ModelState, apply_updates, bce_with_logits, \
    weighted_mean
from xgan.train.ema import ema_update

REAL_LABEL = 0.9   # one-sided label smoothing (reference train_gan.py:92)
FAKE_LABEL = 0.0


def make_dcgan_step(g_model, d_model, g_tx, d_tx, *, latent_dim: int,
                    dtype=jnp.float32, batch_sharding=None,
                    donate: bool = True, steps_per_call: int = 1,
                    store_take=None, ema_decay=None):
    """Returns jitted step(g_state, d_state, images_u8, idx, key) ->
    (g_state, d_state, metrics[5]) with metrics =
    [loss_G, loss_D, D_x, D_G_z1, D_G_z2].

    With ``steps_per_call=K > 1`` the returned function is instead a
    K-step ``lax.scan`` over the same body —
    ``multi(g_state, d_state, images_u8, idx_chunk[K, B], iters0, key) ->
    (g_state, d_state, metrics[K, 5])`` — one dispatch for K training
    iterations. Per-step PRNG keys are ``fold_in(key, iters0 + t)``, the
    exact stream the K=1 epoch loop uses, so the two dispatch modes are
    numerically identical (tests/test_multistep.py).

    With ``ema_decay`` set, both forms take an EMA tree of G's params as
    the THIRD argument and return its post-step update in the same slot
    (see xgan.train.ema — the lerp fuses into the step; training math is
    untouched because nothing reads the EMA tree)."""

    def step(g_state: ModelState, d_state: ModelState,
             images_u8, idx, key, mask=None):
        # ``mask`` (None or (B,) 0/1 float): tail-exact semantics — the
        # reference's final batch per epoch is SMALLER (torch DataLoader
        # drop_last=False, data_loader.py:189-197); ours is wrap-padded
        # to a static shape, and the mask removes the padded rows from
        # every loss mean, metric mean and BN batch statistic so the
        # parameter/stat updates equal the reference's smaller batch.
        mkw = {} if mask is None else {"mask": mask}
        k_flip, k_noise = jax.random.split(key)
        real = gather_preprocess(images_u8, idx, k_flip, train=True,
                                 dtype=dtype, batch_sharding=batch_sharding,
                                 take=store_take)
        b = idx.shape[0]
        noise = jax.random.normal(k_noise, (b, latent_dim), jnp.float32)

        # --- One generator forward (train-mode BN), with a VJP handle so
        # the G update can reuse it without a second forward.
        def g_forward(g_params):
            fake, upd = g_model.apply(
                {"params": g_params, "batch_stats": g_state.batch_stats},
                noise, train=True, mutable=["batch_stats"], **mkw)
            return fake, upd["batch_stats"]

        fake, g_vjp, g_stats_new = jax.vjp(g_forward, g_state.params,
                                           has_aux=True)

        # --- Discriminator update: real and fake are separate BN batches.
        def d_loss_fn(d_params):
            logits_real, upd1 = d_model.apply(
                {"params": d_params, "batch_stats": d_state.batch_stats},
                real, train=True, mutable=["batch_stats"], **mkw)
            logits_fake, upd2 = d_model.apply(
                {"params": d_params, "batch_stats": upd1["batch_stats"]},
                fake, train=True, mutable=["batch_stats"], **mkw)
            loss = (bce_with_logits(logits_real, REAL_LABEL, mask)
                    + bce_with_logits(logits_fake, FAKE_LABEL, mask))
            d_x = weighted_mean(jax.nn.sigmoid(logits_real), mask)
            d_g_z1 = weighted_mean(jax.nn.sigmoid(logits_fake), mask)
            return loss, (upd2["batch_stats"], d_x, d_g_z1)

        (loss_d, (d_stats2, d_x, d_g_z1)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_state.params)
        d_state = apply_updates(d_tx, d_state, d_grads, d_stats2)

        # --- Generator update through the UPDATED discriminator.
        def g_loss_wrt_fake(fake_images):
            logits, upd3 = d_model.apply(
                {"params": d_state.params,
                 "batch_stats": d_state.batch_stats},
                fake_images, train=True, mutable=["batch_stats"], **mkw)
            loss = bce_with_logits(logits, REAL_LABEL, mask)
            d_g_z2 = weighted_mean(jax.nn.sigmoid(logits), mask)
            return loss, (upd3["batch_stats"], d_g_z2)

        (loss_g, (d_stats3, d_g_z2)), fake_grad = jax.value_and_grad(
            g_loss_wrt_fake, has_aux=True)(fake)
        g_grads = g_vjp(fake_grad)[0]
        g_state = apply_updates(g_tx, g_state, g_grads, g_stats_new)
        d_state = d_state.replace(batch_stats=d_stats3)

        metrics = jnp.stack([loss_g, loss_d, d_x, d_g_z1, d_g_z2])
        return g_state, d_state, metrics

    donate_args = (() if not donate
                   else (0, 1, 2) if ema_decay is not None else (0, 1))
    if steps_per_call <= 1:
        if ema_decay is None:
            return jax.jit(step, donate_argnums=donate_args)

        def step_ema(g_state, d_state, ema, images_u8, idx, key, mask=None):
            g, d, m = step(g_state, d_state, images_u8, idx, key, mask)
            return g, d, ema_update(ema, g.params, ema_decay), m

        return jax.jit(step_ema, donate_argnums=donate_args)

    if ema_decay is None:
        def multi(g_state, d_state, images_u8, idx_chunk, iters0, key):
            def body(carry, xs):
                idx, t = xs
                g, d, m = step(carry[0], carry[1], images_u8, idx,
                               jax.random.fold_in(key, t))
                return (g, d), m

            (g_state, d_state), metrics = jax.lax.scan(
                body, (g_state, d_state),
                (idx_chunk, iters0 + jnp.arange(steps_per_call)))
            return g_state, d_state, metrics
    else:
        def multi(g_state, d_state, ema, images_u8, idx_chunk, iters0, key):
            def body(carry, xs):
                idx, t = xs
                g, d, m = step(carry[0], carry[1], images_u8, idx,
                               jax.random.fold_in(key, t))
                return (g, d, ema_update(carry[2], g.params, ema_decay)), m

            (g_state, d_state, ema), metrics = jax.lax.scan(
                body, (g_state, d_state, ema),
                (idx_chunk, iters0 + jnp.arange(steps_per_call)))
            return g_state, d_state, ema, metrics

    return jax.jit(multi, donate_argnums=donate_args)

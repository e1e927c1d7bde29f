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
                    store_take=None, ema_decay=None, grad_accum: int = 1):
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
    untouched because nothing reads the EMA tree).

    ``grad_accum=A > 1``: the D and G updates each process the batch as
    A sequential microbatches inside the one program (lax.scan),
    accumulating gradients of the valid-row loss SUMS and firing one
    optimizer update each — torch gradient-accumulation semantics as
    xgan/train/classifier.py ``_microbatch_grads``: BN batch statistics
    are per-microbatch, running stats advance sequentially, the
    noise/flip draws are the K=1 full-batch draws sliced. The G phase
    RECOMPUTES each microbatch's generator forward with the same input
    BN stats the D phase used (bitwise-identical fake; stat updates
    discarded) instead of keeping A live vjp graphs — one extra G
    forward of FLOPs per microbatch buys the ~A× activation-memory
    reduction the flag exists for. Pinned against the sequential hand
    loop in tests/test_gan_grad_accum.py."""

    def step_plain(g_state: ModelState, d_state: ModelState,
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

    def step_accum(g_state: ModelState, d_state: ModelState,
                   images_u8, idx, key, mask=None):
        # grad_accum=A: same PRNG draws and loss functional as
        # step_plain, microbatched. Fully-padded-microbatch discipline
        # mirrors classifier._microbatch_grads: freeze BN stats AND
        # select-zero the gradient (0-stat masked-BN placeholders go NaN
        # through depth, and a zero cotangent does not kill a NaN
        # jacobian).
        import optax

        A = grad_accum
        b_full = idx.shape[0]
        if b_full % A:
            raise ValueError(
                f"grad_accum={A} must divide batch size {b_full}")
        mb = b_full // A

        def split(x, shard_rows=False):
            x = x.reshape((A, mb) + x.shape[1:])
            if shard_rows and batch_sharding is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(batch_sharding.mesh,
                                     PartitionSpec(
                                         None, *batch_sharding.spec)))
            return x

        k_flip, k_noise = jax.random.split(key)
        real = gather_preprocess(images_u8, idx, k_flip, train=True,
                                 dtype=dtype, batch_sharding=batch_sharding,
                                 take=store_take)
        real_k = split(real, shard_rows=True)
        noise_k = split(jax.random.normal(k_noise, (b_full, latent_dim),
                                          jnp.float32))
        mask_k = None if mask is None else mask.reshape(A, mb)
        w_total = (jnp.float32(b_full) if mask is None else
                   jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1e-9))

        def guarded_sum(per_sample, mask_mb):
            per_sample = per_sample.astype(jnp.float32)
            if mask_mb is None:
                return jnp.sum(per_sample)
            return jnp.sum(jnp.where(mask_mb > 0, per_sample, 0.0))

        def bce_sum(logits, target, mask_mb):
            t = jnp.broadcast_to(jnp.asarray(target, jnp.float32),
                                 logits.shape)
            return guarded_sum(optax.sigmoid_binary_cross_entropy(
                logits.astype(jnp.float32), t), mask_mb)

        def freeze(ok, new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old)

        def kill(ok, grads):
            return jax.tree_util.tree_map(
                lambda t: jnp.where(ok, t, jnp.zeros_like(t)), grads)

        # --- D phase: per microbatch one G forward (advancing G running
        # stats — the once-per-batch advance of step_plain, at microbatch
        # granularity) + D loss-sum grads; emits each microbatch's G
        # INPUT stats so the G phase can recompute the identical fake.
        def d_micro(carry, xs):
            g_stats, d_stats, gsum, sums = carry
            if mask_k is None:
                real_mb, noise_mb = xs
                mask_mb, mkw = None, {}
            else:
                real_mb, noise_mb, mask_mb = xs
                mkw = {"mask": mask_mb}
            g_stats_in = g_stats
            fake, g_upd = g_model.apply(
                {"params": g_state.params, "batch_stats": g_stats},
                noise_mb, train=True, mutable=["batch_stats"], **mkw)
            fake = jax.lax.stop_gradient(fake)

            def d_loss_sum(d_params):
                logits_real, upd1 = d_model.apply(
                    {"params": d_params, "batch_stats": d_stats},
                    real_mb, train=True, mutable=["batch_stats"], **mkw)
                logits_fake, upd2 = d_model.apply(
                    {"params": d_params,
                     "batch_stats": upd1["batch_stats"]},
                    fake, train=True, mutable=["batch_stats"], **mkw)
                s = (bce_sum(logits_real, REAL_LABEL, mask_mb)
                     + bce_sum(logits_fake, FAKE_LABEL, mask_mb))
                dx_s = guarded_sum(jax.nn.sigmoid(
                    logits_real.astype(jnp.float32)), mask_mb)
                dgz1_s = guarded_sum(jax.nn.sigmoid(
                    logits_fake.astype(jnp.float32)), mask_mb)
                return s, (upd2["batch_stats"], dx_s, dgz1_s)

            (s, (d_stats2, dx_s, dgz1_s)), g = jax.value_and_grad(
                d_loss_sum, has_aux=True)(d_state.params)
            g_stats_new = g_upd["batch_stats"]
            if mask_mb is not None:
                ok = jnp.sum(mask_mb) > 0
                d_stats2 = freeze(ok, d_stats2, d_stats)
                g_stats_new = freeze(ok, g_stats_new, g_stats)
                g = kill(ok, g)
                s, dx_s, dgz1_s = (jnp.where(ok, v, 0.0)
                                   for v in (s, dx_s, dgz1_s))
            gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
            sums = tuple(a + b for a, b in zip(sums, (s, dx_s, dgz1_s)))
            return (g_stats_new, d_stats2, gsum, sums), g_stats_in

        xs = ((real_k, noise_k) if mask_k is None
              else (real_k, noise_k, mask_k))
        zeros_d = jax.tree_util.tree_map(jnp.zeros_like, d_state.params)
        (g_stats, d_stats, d_gsum, (ds, dxs, dgz1s)), g_stats_seq = \
            jax.lax.scan(d_micro,
                         (g_state.batch_stats, d_state.batch_stats,
                          zeros_d, (jnp.float32(0.0),) * 3), xs)
        d_grads = jax.tree_util.tree_map(lambda g: g / w_total, d_gsum)
        d_state = apply_updates(d_tx, d_state, d_grads, d_stats)
        loss_d, d_x, d_g_z1 = ds / w_total, dxs / w_total, dgz1s / w_total

        # --- G phase through the UPDATED discriminator: recompute each
        # microbatch's fake with its recorded input stats (bitwise equal
        # to the D phase's; stat updates discarded — G running stats
        # already advanced above).
        def g_micro(carry, xs):
            d_stats, gsum, sums = carry
            if mask_k is None:
                noise_mb, g_stats_in = xs
                mask_mb, mkw = None, {}
            else:
                noise_mb, g_stats_in, mask_mb = xs
                mkw = {"mask": mask_mb}

            def g_loss_sum(g_params):
                fake, _ = g_model.apply(
                    {"params": g_params, "batch_stats": g_stats_in},
                    noise_mb, train=True, mutable=["batch_stats"], **mkw)
                logits, upd3 = d_model.apply(
                    {"params": d_state.params, "batch_stats": d_stats},
                    fake, train=True, mutable=["batch_stats"], **mkw)
                s = bce_sum(logits, REAL_LABEL, mask_mb)
                dgz2_s = guarded_sum(jax.nn.sigmoid(
                    logits.astype(jnp.float32)), mask_mb)
                return s, (upd3["batch_stats"], dgz2_s)

            (s, (d_stats3, dgz2_s)), g = jax.value_and_grad(
                g_loss_sum, has_aux=True)(g_state.params)
            if mask_mb is not None:
                ok = jnp.sum(mask_mb) > 0
                d_stats3 = freeze(ok, d_stats3, d_stats)
                g = kill(ok, g)
                s = jnp.where(ok, s, 0.0)
                dgz2_s = jnp.where(ok, dgz2_s, 0.0)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
            sums = tuple(a + b for a, b in zip(sums, (s, dgz2_s)))
            return (d_stats3, gsum, sums), None

        xs = ((noise_k, g_stats_seq) if mask_k is None
              else (noise_k, g_stats_seq, mask_k))
        zeros_g = jax.tree_util.tree_map(jnp.zeros_like, g_state.params)
        (d_stats3, g_gsum, (gs, dgz2s)), _ = jax.lax.scan(
            g_micro, (d_state.batch_stats, zeros_g,
                      (jnp.float32(0.0),) * 2), xs)
        g_grads = jax.tree_util.tree_map(lambda g: g / w_total, g_gsum)
        g_state = apply_updates(g_tx, g_state, g_grads, g_stats)
        d_state = d_state.replace(batch_stats=d_stats3)
        loss_g, d_g_z2 = gs / w_total, dgz2s / w_total

        metrics = jnp.stack([loss_g, loss_d, d_x, d_g_z1, d_g_z2])
        return g_state, d_state, metrics

    step = step_accum if grad_accum > 1 else step_plain

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

"""Conditional-GAN training step: adversarial + perceptual +
feature-matching losses with the adaptive discriminator gate, fused into
one jitted program.

Reference semantics (train_cgan.py:111-193):
- BCE-with-logits with two-sided noisy label smoothing: per-sample real
  targets 0.9 − 0.1·U(0,1), fake targets 0.1 + 0.1·U(0,1) (:156-160);
- adaptive D updates: the D optimizer step is applied only when
  D(x) < 0.8 or D(G(z)) > 0.2 or epoch < 5 (:176-178) — here a lax.cond
  on device scalars (gradients are always computed, keeping the program
  static; BN running stats advance regardless, as in the reference);
- G loss = adv + 10·perceptual(VGG16 blocks) + 5·feature-matching over the
  14 intermediate D activations (:184-191); the VGG consumes the raw
  generator/real images with no re-normalization (reference quirk kept);
- fake labels are uniform-random classes (:167).

The reference's vestigial alpha/progressive-resolution schedule is
computed-but-unused there (SURVEY.md §7 quirks) and is not reproduced.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from xgan.data.pipeline import gather_preprocess
from xgan.models.vgg import perceptual_loss
from xgan.ops.reduce import layerwise_mse
from xgan.train.common import ModelState, apply_updates, weighted_mean
from xgan.train.ema import ema_update

PERCEPTUAL_WEIGHT = 10.0
FM_WEIGHT = 5.0


def _bce_per_target(logits, targets, weights=None):
    return weighted_mean(optax.sigmoid_binary_cross_entropy(
        logits.astype(jnp.float32), targets), weights)


def feature_matching_loss(real_feats, fake_feats, weights=None):
    """Sum of per-layer MSEs (reference train_cgan.py:75-76); ``weights``
    (B,) restricts each layer's mean to valid rows (tail exactness).
    Shares ops.reduce.layerwise_mse with the VGG perceptual loss."""
    return layerwise_mse(real_feats, fake_feats, weights)


def make_cgan_step(g_model, d_model, vgg_model, g_tx, d_tx, *,
                   latent_dim: int, dtype=jnp.float32,
                   batch_sharding=None, donate: bool = True,
                   steps_per_call: int = 1, store_take=None,
                   ema_decay=None, grad_accum: int = 1):
    """Returns jitted step(g_state, d_state, vgg_params, images_u8,
    labels_all, idx, epoch, key) -> (g_state, d_state, metrics[7]) with
    metrics = [loss_G, loss_D, D_x, D_G_z1, D_G_z2, perceptual, fm].

    ``steps_per_call=K > 1`` returns the K-step lax.scan form instead:
    ``multi(g_state, d_state, vgg_params, images_u8, labels_all,
    idx_chunk[K, B], epoch, iters0, key) ->
    (g_state, d_state, metrics[K, 7])`` with per-step keys
    ``fold_in(key, iters0 + t)`` — the identical PRNG stream of the K=1
    epoch loop (see make_dcgan_step).

    With ``ema_decay`` set, both forms take/return the generator-EMA
    tree as the third argument/output (see xgan.train.ema).

    ``grad_accum=A > 1``: the D and G updates each walk the batch as A
    sequential microbatches inside the one program — torch
    gradient-accumulation semantics exactly as make_dcgan_step's
    ``grad_accum`` (per-microbatch BN batch stats, full-batch-drawn
    noise/labels/targets sliced, valid-row loss-SUM gradients divided
    by the full batch's valid count, G forwards recomputed in the G
    phase from recorded input stats). The adaptive gate evaluates on
    the ACCUMULATED full-batch D(x)/D(G(z)) means, identical to the
    K=1 gate inputs. Pinned in tests/test_gan_grad_accum.py."""

    def step_plain(g_state: ModelState, d_state: ModelState, vgg_params,
                   images_u8, labels_all, idx, epoch, key, mask=None):
        # ``mask`` (None or (B,) 0/1 float): tail-exact semantics for the
        # wrap-padded final batch — see make_dcgan_step.
        mkw = {} if mask is None else {"mask": mask}
        k_flip, k_noise, k_lab, k_rs, k_fs = jax.random.split(key, 5)
        real = gather_preprocess(images_u8, idx, k_flip, train=True,
                                 dtype=dtype, batch_sharding=batch_sharding,
                                 take=store_take)
        real_labels = jnp.take(labels_all, idx, axis=0)
        b = idx.shape[0]

        real_targets = 0.9 - 0.1 * jax.random.uniform(k_rs, (b,))
        fake_targets = 0.1 + 0.1 * jax.random.uniform(k_fs, (b,))

        noise = jax.random.normal(k_noise, (b, latent_dim), jnp.float32)
        # the models' own class count — a second constant here would
        # silently desync from the embedding tables if either changed
        fake_labels = jax.random.randint(k_lab, (b,), 0,
                                         g_model.num_classes)

        def g_forward(g_params):
            fake, upd = g_model.apply(
                {"params": g_params, "batch_stats": g_state.batch_stats},
                noise, fake_labels, train=True,
                mutable=["batch_stats"], **mkw)
            return fake, upd["batch_stats"]

        fake, g_vjp, g_stats_new = jax.vjp(g_forward, g_state.params,
                                           has_aux=True)

        # --- Discriminator loss/grads (always computed; applied via gate).
        def d_loss_fn(d_params):
            logits_real, upd1 = d_model.apply(
                {"params": d_params, "batch_stats": d_state.batch_stats},
                real, real_labels, train=True,
                mutable=["batch_stats"], **mkw)
            logits_fake, upd2 = d_model.apply(
                {"params": d_params, "batch_stats": upd1["batch_stats"]},
                fake, fake_labels, train=True,
                mutable=["batch_stats"], **mkw)
            loss = (_bce_per_target(logits_real, real_targets, mask)
                    + _bce_per_target(logits_fake, fake_targets, mask))
            d_x = weighted_mean(jax.nn.sigmoid(logits_real), mask)
            d_g_z1 = weighted_mean(jax.nn.sigmoid(logits_fake), mask)
            return loss, (upd2["batch_stats"], d_x, d_g_z1)

        (loss_d, (d_stats2, d_x, d_g_z1)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_state.params)

        # Adaptive gate (train_cgan.py:176-178): BN stats always advance;
        # params/optimizer only when the gate is open.
        gate = jnp.logical_or(jnp.logical_or(d_x < 0.8, d_g_z1 > 0.2),
                              epoch < 5)
        updated = apply_updates(d_tx, d_state, d_grads, d_stats2)
        skipped = d_state.replace(batch_stats=d_stats2)
        d_state = jax.lax.cond(gate, lambda: updated, lambda: skipped)

        # --- Generator loss through the (possibly) updated D.
        def g_loss_wrt_fake(fake_images):
            (logits, fake_feats), upd3 = d_model.apply(
                {"params": d_state.params,
                 "batch_stats": d_state.batch_stats},
                fake_images, fake_labels, train=True, features=True,
                mutable=["batch_stats"], **mkw)
            (_, real_feats), upd4 = d_model.apply(
                {"params": d_state.params,
                 "batch_stats": upd3["batch_stats"]},
                real, real_labels, train=True, features=True,
                mutable=["batch_stats"], **mkw)
            adv = _bce_per_target(logits, real_targets, mask)
            perc = perceptual_loss(
                lambda p, x: vgg_model.apply({"params": p}, x),
                vgg_params, fake_images, real, weights=mask)
            fm = feature_matching_loss(real_feats, fake_feats, mask)
            loss = adv + PERCEPTUAL_WEIGHT * perc + FM_WEIGHT * fm
            d_g_z2 = weighted_mean(jax.nn.sigmoid(logits), mask)
            return loss, (upd4["batch_stats"], d_g_z2, perc, fm)

        (loss_g, (d_stats4, d_g_z2, perc, fm)), fake_grad = \
            jax.value_and_grad(g_loss_wrt_fake, has_aux=True)(fake)
        g_grads = g_vjp(fake_grad)[0]
        g_state = apply_updates(g_tx, g_state, g_grads, g_stats_new)
        d_state = d_state.replace(batch_stats=d_stats4)

        metrics = jnp.stack([loss_g, loss_d, d_x, d_g_z1, d_g_z2,
                             perc, fm])
        return g_state, d_state, metrics

    def step_accum(g_state: ModelState, d_state: ModelState, vgg_params,
                   images_u8, labels_all, idx, epoch, key, mask=None):
        # grad_accum=A: same PRNG draws and loss functional as
        # step_plain, microbatched (see make_dcgan_step.step_accum for
        # the freeze/kill discipline rationale).
        from xgan.ops.reduce import per_sample_mse

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

        k_flip, k_noise, k_lab, k_rs, k_fs = jax.random.split(key, 5)
        real = gather_preprocess(images_u8, idx, k_flip, train=True,
                                 dtype=dtype, batch_sharding=batch_sharding,
                                 take=store_take)
        real_k = split(real, shard_rows=True)
        rlab_k = split(jnp.take(labels_all, idx, axis=0))
        rt_k = split(0.9 - 0.1 * jax.random.uniform(k_rs, (b_full,)))
        ft_k = split(0.1 + 0.1 * jax.random.uniform(k_fs, (b_full,)))
        noise_k = split(jax.random.normal(k_noise, (b_full, latent_dim),
                                          jnp.float32))
        flab_k = split(jax.random.randint(k_lab, (b_full,), 0,
                                          g_model.num_classes))
        mask_k = None if mask is None else mask.reshape(A, mb)
        w_total = (jnp.float32(b_full) if mask is None else
                   jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1e-9))

        def guarded_sum(per_sample, mask_mb):
            per_sample = per_sample.astype(jnp.float32)
            if mask_mb is None:
                return jnp.sum(per_sample)
            return jnp.sum(jnp.where(mask_mb > 0, per_sample, 0.0))

        def bce_sum(logits, targets, mask_mb):
            return guarded_sum(optax.sigmoid_binary_cross_entropy(
                logits.astype(jnp.float32), targets), mask_mb)

        def feats_mse_sum(feats_a, feats_b, mask_mb):
            # row-sum form of ops.reduce.layerwise_mse: Σ_layers
            # Σ_valid-rows per-sample MSE (divide by W once at the end)
            total = jnp.float32(0.0)
            for a, b in zip(feats_a, feats_b):
                total = total + guarded_sum(per_sample_mse(a, b), mask_mb)
            return total

        def freeze(ok, new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old)

        def kill(ok, grads):
            return jax.tree_util.tree_map(
                lambda t: jnp.where(ok, t, jnp.zeros_like(t)), grads)

        # --- D phase: G forward per microbatch (advances G running
        # stats; input stats recorded for the G phase) + D loss-sum
        # gradient accumulation.
        def d_micro(carry, xs):
            g_stats, d_stats, gsum, sums = carry
            if mask_k is None:
                real_mb, rlab_mb, rt_mb, ft_mb, noise_mb, flab_mb = xs
                mask_mb, mkw = None, {}
            else:
                (real_mb, rlab_mb, rt_mb, ft_mb, noise_mb, flab_mb,
                 mask_mb) = xs
                mkw = {"mask": mask_mb}
            g_stats_in = g_stats
            fake, g_upd = g_model.apply(
                {"params": g_state.params, "batch_stats": g_stats},
                noise_mb, flab_mb, train=True, mutable=["batch_stats"],
                **mkw)
            fake = jax.lax.stop_gradient(fake)

            def d_loss_sum(d_params):
                logits_real, upd1 = d_model.apply(
                    {"params": d_params, "batch_stats": d_stats},
                    real_mb, rlab_mb, train=True,
                    mutable=["batch_stats"], **mkw)
                logits_fake, upd2 = d_model.apply(
                    {"params": d_params,
                     "batch_stats": upd1["batch_stats"]},
                    fake, flab_mb, train=True, mutable=["batch_stats"],
                    **mkw)
                s = (bce_sum(logits_real, rt_mb, mask_mb)
                     + bce_sum(logits_fake, ft_mb, mask_mb))
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

        xs = [real_k, rlab_k, rt_k, ft_k, noise_k, flab_k]
        if mask_k is not None:
            xs.append(mask_k)
        zeros_d = jax.tree_util.tree_map(jnp.zeros_like, d_state.params)
        (g_stats, d_stats2, d_gsum, (ds, dxs, dgz1s)), g_stats_seq = \
            jax.lax.scan(d_micro,
                         (g_state.batch_stats, d_state.batch_stats,
                          zeros_d, (jnp.float32(0.0),) * 3), tuple(xs))
        loss_d = ds / w_total
        d_x = dxs / w_total
        d_g_z1 = dgz1s / w_total

        # Adaptive gate on the accumulated full-batch means — identical
        # inputs to the K=1 gate (train_cgan.py:176-178); BN stats
        # always advance.
        d_grads = jax.tree_util.tree_map(lambda g: g / w_total, d_gsum)
        gate = jnp.logical_or(jnp.logical_or(d_x < 0.8, d_g_z1 > 0.2),
                              epoch < 5)
        updated = apply_updates(d_tx, d_state, d_grads, d_stats2)
        skipped = d_state.replace(batch_stats=d_stats2)
        d_state = jax.lax.cond(gate, lambda: updated, lambda: skipped)

        # --- G phase through the (possibly) updated D: recompute each
        # microbatch's fake from its recorded input stats.
        def g_micro(carry, xs):
            d_stats, gsum, sums = carry
            if mask_k is None:
                (noise_mb, flab_mb, real_mb, rlab_mb, rt_mb,
                 g_stats_in) = xs
                mask_mb, mkw = None, {}
            else:
                (noise_mb, flab_mb, real_mb, rlab_mb, rt_mb, g_stats_in,
                 mask_mb) = xs
                mkw = {"mask": mask_mb}

            def g_loss_sum(g_params):
                fake, _ = g_model.apply(
                    {"params": g_params, "batch_stats": g_stats_in},
                    noise_mb, flab_mb, train=True,
                    mutable=["batch_stats"], **mkw)
                (logits, fake_feats), upd3 = d_model.apply(
                    {"params": d_state.params, "batch_stats": d_stats},
                    fake, flab_mb, train=True, features=True,
                    mutable=["batch_stats"], **mkw)
                (_, real_feats), upd4 = d_model.apply(
                    {"params": d_state.params,
                     "batch_stats": upd3["batch_stats"]},
                    real_mb, rlab_mb, train=True, features=True,
                    mutable=["batch_stats"], **mkw)
                adv_s = bce_sum(logits, rt_mb, mask_mb)
                vf = vgg_model.apply({"params": vgg_params}, fake)
                vr = jax.tree.map(
                    jax.lax.stop_gradient,
                    vgg_model.apply({"params": vgg_params}, real_mb))
                perc_s = feats_mse_sum(vf, vr, mask_mb)
                fm_s = feats_mse_sum(real_feats, fake_feats, mask_mb)
                s = (adv_s + PERCEPTUAL_WEIGHT * perc_s
                     + FM_WEIGHT * fm_s)
                dgz2_s = guarded_sum(jax.nn.sigmoid(
                    logits.astype(jnp.float32)), mask_mb)
                return s, (upd4["batch_stats"], dgz2_s, perc_s, fm_s)

            (s, (d_stats4, dgz2_s, perc_s, fm_s)), g = jax.value_and_grad(
                g_loss_sum, has_aux=True)(g_state.params)
            if mask_mb is not None:
                ok = jnp.sum(mask_mb) > 0
                d_stats4 = freeze(ok, d_stats4, d_stats)
                g = kill(ok, g)
                s, dgz2_s, perc_s, fm_s = (
                    jnp.where(ok, v, 0.0)
                    for v in (s, dgz2_s, perc_s, fm_s))
            gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
            sums = tuple(a + b for a, b in zip(
                sums, (s, dgz2_s, perc_s, fm_s)))
            return (d_stats4, gsum, sums), None

        xs = [noise_k, flab_k, real_k, rlab_k, rt_k, g_stats_seq]
        if mask_k is not None:
            xs.append(mask_k)
        zeros_g = jax.tree_util.tree_map(jnp.zeros_like, g_state.params)
        (d_stats4, g_gsum, (gs, dgz2s, percs, fms)), _ = jax.lax.scan(
            g_micro, (d_state.batch_stats, zeros_g,
                      (jnp.float32(0.0),) * 4), tuple(xs))
        g_grads = jax.tree_util.tree_map(lambda g: g / w_total, g_gsum)
        g_state = apply_updates(g_tx, g_state, g_grads, g_stats)
        d_state = d_state.replace(batch_stats=d_stats4)

        metrics = jnp.stack([gs / w_total, loss_d, d_x, d_g_z1,
                             dgz2s / w_total, percs / w_total,
                             fms / w_total])
        return g_state, d_state, metrics

    step = step_accum if grad_accum > 1 else step_plain

    donate_args = (() if not donate
                   else (0, 1, 2) if ema_decay is not None else (0, 1))
    if steps_per_call <= 1:
        if ema_decay is None:
            return jax.jit(step, donate_argnums=donate_args)

        def step_ema(g_state, d_state, ema, vgg_params, images_u8,
                     labels_all, idx, epoch, key, mask=None):
            g, d, m = step(g_state, d_state, vgg_params, images_u8,
                           labels_all, idx, epoch, key, mask)
            return g, d, ema_update(ema, g.params, ema_decay), m

        return jax.jit(step_ema, donate_argnums=donate_args)

    if ema_decay is None:
        def multi(g_state, d_state, vgg_params, images_u8, labels_all,
                  idx_chunk, epoch, iters0, key):
            def body(carry, xs):
                idx, t = xs
                g, d, m = step(carry[0], carry[1], vgg_params, images_u8,
                               labels_all, idx, epoch,
                               jax.random.fold_in(key, t))
                return (g, d), m

            (g_state, d_state), metrics = jax.lax.scan(
                body, (g_state, d_state),
                (idx_chunk, iters0 + jnp.arange(steps_per_call)))
            return g_state, d_state, metrics
    else:
        def multi(g_state, d_state, ema, vgg_params, images_u8, labels_all,
                  idx_chunk, epoch, iters0, key):
            def body(carry, xs):
                idx, t = xs
                g, d, m = step(carry[0], carry[1], vgg_params, images_u8,
                               labels_all, idx, epoch,
                               jax.random.fold_in(key, t))
                return (g, d, ema_update(carry[2], g.params, ema_decay)), m

            (g_state, d_state, ema), metrics = jax.lax.scan(
                body, (g_state, d_state, ema),
                (idx_chunk, iters0 + jnp.arange(steps_per_call)))
            return g_state, d_state, ema, metrics

    return jax.jit(multi, donate_argnums=donate_args)

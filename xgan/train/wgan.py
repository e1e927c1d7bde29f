"""WGAN-GP training: n_critic inner loop + gradient-penalty double-backward
in ONE jitted XLA program.

Reference semantics (train_wggan.py:66-94, wggan.py:72-89):
- per data batch: ``critic_iters`` critic updates on the SAME real batch
  with fresh noise each, then one generator update;
- critic loss = -E[D(real)] + E[D(fake)] + λ·E[(‖∇_x D(x̂)‖₂ − 1)²] with
  x̂ = α·real + (1−α)·fake, α ~ U(0,1) per sample;
- the penalty's double backward (torch ``create_graph=True``,
  wggan.py:79-86) is expressed as an outer jax.grad over a loss containing
  an inner jax.grad — XLA fuses forward, inner backward, and outer backward
  into a single program (the BASELINE.json north-star requirement);
- Adam betas (β1, 0.9) (train_wggan.py:53-54);
- BN policy: the critic keeps its reference BatchNorm layers and the GP
  pass uses train-mode batch statistics of the interpolated batch, exactly
  like the reference's train-mode module call (documented decision for
  SURVEY.md §7 hard part No.1).

The inner critic loop is a lax.scan with both ModelStates as carry, so the
whole (n critic updates + 1 G update) iteration is one device program with
zero host round-trips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from xgan.data.pipeline import gather_preprocess
from xgan.train.common import ModelState, apply_updates, weighted_mean
from xgan.train.ema import ema_update


def gradient_penalty(apply_fn, real, fake, key, lambda_gp: float = 10.0,
                     mask=None, alpha=None):
    """λ·mean((‖∇_x apply_fn(x̂)‖₂ − 1)²) with per-sample α interpolation.

    ``apply_fn(x) -> (scores (B,), aux)``; differentiable in x and in any
    parameters it closes over (the double-backward case). Returns (gp, aux)
    where aux comes from the interpolated-batch forward. ``mask``: (B,)
    validity weights — the penalty mean covers only valid rows
    (tail-exact smaller final batch). ``alpha``: pre-drawn (B,1,1,1)
    interpolation coefficients (the grad-accum path draws the full
    batch's α once and feeds per-microbatch slices, so the sampled
    randomness is identical to the unaccumulated step); ``key`` is
    ignored when given.
    """
    b = real.shape[0]
    if alpha is None:
        alpha = jax.random.uniform(key, (b, 1, 1, 1), jnp.float32)
    inter = alpha * real + (1.0 - alpha) * fake

    def scalar_fn(x):
        scores, aux = apply_fn(x)
        if mask is not None:
            # padded rows must not contribute to the differentiated sum:
            # their normalized activations depend on the valid rows'
            # masked-BN statistics, so an unweighted sum would leak
            # gradient from garbage rows back into valid ones.
            scores = scores * mask.astype(scores.dtype)
        return jnp.sum(scores), aux

    grads, aux = jax.grad(scalar_fn, has_aux=True)(inter)
    norms = jnp.sqrt(jnp.sum(
        jnp.square(grads.astype(jnp.float32).reshape(b, -1)), axis=1)
        + 1e-12)
    gp = lambda_gp * weighted_mean(jnp.square(norms - 1.0), mask)
    return gp, aux


def make_wgan_step(g_model, c_model, g_tx, c_tx, *, latent_dim: int,
                   critic_iters: int, lambda_gp: float,
                   dtype=jnp.float32, batch_sharding=None,
                   donate: bool = True, steps_per_call: int = 1,
                   store_take=None, ema_decay=None, grad_accum: int = 1):
    """Returns jitted step(g_state, c_state, images_u8, idx, key) ->
    (g_state, c_state, d_losses (critic_iters,), g_loss).

    ``steps_per_call=K > 1`` returns the K-step lax.scan form instead:
    ``multi(g_state, c_state, images_u8, idx_chunk[K, B], iters0, key) ->
    (g_state, c_state, d_losses[K, critic_iters], g_losses[K])`` with
    per-step keys ``fold_in(key, iters0 + t)`` — the identical PRNG
    stream of the K=1 epoch loop (see make_dcgan_step).

    With ``ema_decay`` set, both forms take/return the generator-EMA
    tree as the third argument/output (see xgan.train.ema).

    ``grad_accum=A > 1``: every critic update and the generator update
    process the batch as A sequential microbatches inside the one
    program (lax.scan) — gradients of the valid-row loss SUMS
    accumulate, one optimizer update fires per critic iter / per G
    step, so only ONE microbatch's activations (including the GP
    double-backward's, the most memory-hungry backward in the repo) are
    live at a time. Torch gradient-accumulation semantics, exactly as
    the classifier's ``--grad-accum`` (xgan/train/classifier.py
    ``_microbatch_grads``): BN batch statistics are per-microbatch and
    running stats advance sequentially; noise/α are drawn full-batch
    with the K=1 keys and sliced, so the sampled randomness is
    identical. The defining sequential-loop contract is pinned in
    tests/test_wgan_grad_accum.py. Reference analog: the hand-written
    loss.backward()-per-microbatch loop around train_wggan.py:66-94."""

    def step_plain(g_state: ModelState, c_state: ModelState, images_u8,
                   idx, key, mask=None):
        # ``mask`` (None or (B,) 0/1 float): tail-exact semantics for the
        # wrap-padded final batch — see make_dcgan_step.
        mkw = {} if mask is None else {"mask": mask}
        k_flip, k_critic, k_g = jax.random.split(key, 3)
        real = gather_preprocess(images_u8, idx, k_flip, train=True,
                                 dtype=dtype, batch_sharding=batch_sharding,
                                 take=store_take)

        def critic_update(carry, key_i):
            g_st, c_st = carry
            k_noise, k_alpha = jax.random.split(key_i)

            # Train-mode G forward (advances G BN stats, as the
            # reference's netG(noise) inside the critic loop does,
            # train_wggan.py:77).
            noise = jax.random.normal(
                k_noise, (real.shape[0], latent_dim), jnp.float32)
            fake, g_upd = g_model.apply(
                g_st.variables(), noise, train=True,
                mutable=["batch_stats"], **mkw)
            g_st = g_st.replace(batch_stats=g_upd["batch_stats"])
            fake = jax.lax.stop_gradient(fake)

            def c_loss_fn(c_params):
                d_real, upd1 = c_model.apply(
                    {"params": c_params, "batch_stats": c_st.batch_stats},
                    real, train=True, mutable=["batch_stats"], **mkw)
                d_fake, upd2 = c_model.apply(
                    {"params": c_params,
                     "batch_stats": upd1["batch_stats"]},
                    fake, train=True, mutable=["batch_stats"], **mkw)

                def critic_on(x):
                    scores, upd3 = c_model.apply(
                        {"params": c_params,
                         "batch_stats": upd2["batch_stats"]},
                        x, train=True, mutable=["batch_stats"], **mkw)
                    return scores, upd3["batch_stats"]

                gp, stats3 = gradient_penalty(critic_on, real, fake,
                                              k_alpha, lambda_gp, mask)
                loss = (-weighted_mean(d_real, mask)
                        + weighted_mean(d_fake, mask) + gp)
                return loss, stats3

            (d_loss, new_stats), grads = jax.value_and_grad(
                c_loss_fn, has_aux=True)(c_st.params)
            c_st = apply_updates(c_tx, c_st, grads, new_stats)
            return (g_st, c_st), d_loss

        critic_keys = jax.random.split(k_critic, critic_iters)
        (g_state, c_state), d_losses = jax.lax.scan(
            critic_update, (g_state, c_state), critic_keys)

        noise = jax.random.normal(k_g, (idx.shape[0], latent_dim),
                                  jnp.float32)

        def g_loss_fn(g_params):
            fake, g_upd = g_model.apply(
                {"params": g_params, "batch_stats": g_state.batch_stats},
                noise, train=True, mutable=["batch_stats"], **mkw)
            scores, c_upd = c_model.apply(
                c_state.variables(), fake, train=True,
                mutable=["batch_stats"], **mkw)
            return -weighted_mean(scores, mask), (g_upd["batch_stats"],
                                                  c_upd["batch_stats"])

        (g_loss, (g_stats, c_stats)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_state.params)
        g_state = apply_updates(g_tx, g_state, g_grads, g_stats)
        c_state = c_state.replace(batch_stats=c_stats)
        return g_state, c_state, d_losses, g_loss

    def step_accum(g_state: ModelState, c_state: ModelState, images_u8,
                   idx, key, mask=None):
        # grad_accum=A path: identical PRNG draws and loss functional as
        # step_plain, but each update's forward/backward walks A
        # microbatches in a lax.scan. Per-microbatch discipline mirrors
        # classifier._microbatch_grads: gradients of valid-row SUMS
        # accumulate and divide by the FULL batch's valid count; a
        # FULLY-padded microbatch (possible on the wrap-padded tail
        # batch) freezes BN stats AND select-zeroes its gradient — its
        # masked-BN 0-stat placeholder overflows to NaN through depth,
        # and a zero cotangent does not kill a NaN jacobian (0*NaN).
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
                # rows keep their data-axis sharding; the scan
                # (microbatch) axis is unsharded
                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(batch_sharding.mesh,
                                     PartitionSpec(
                                         None, *batch_sharding.spec)))
            return x

        k_flip, k_critic, k_g = jax.random.split(key, 3)
        real = gather_preprocess(images_u8, idx, k_flip, train=True,
                                 dtype=dtype, batch_sharding=batch_sharding,
                                 take=store_take)
        real_k = split(real, shard_rows=True)
        mask_k = None if mask is None else mask.reshape(A, mb)
        w_total = (jnp.float32(b_full) if mask is None else
                   jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1e-9))

        def freeze_and_kill(ok, new_stats, old_stats, grads):
            new_stats = jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new_stats, old_stats)
            grads = jax.tree_util.tree_map(
                lambda t: jnp.where(ok, t, jnp.zeros_like(t)), grads)
            return new_stats, grads

        def critic_update(carry, key_i):
            g_st, c_st = carry
            k_noise, k_alpha = jax.random.split(key_i)
            noise_k = split(jax.random.normal(
                k_noise, (b_full, latent_dim), jnp.float32))
            alpha_k = split(jax.random.uniform(
                k_alpha, (b_full, 1, 1, 1), jnp.float32))

            def micro(mcarry, xs):
                g_stats, c_stats, gsum, ssum = mcarry
                if mask_k is None:
                    real_mb, noise_mb, alpha_mb = xs
                    mask_mb, mkw = None, {}
                else:
                    real_mb, noise_mb, alpha_mb, mask_mb = xs
                    mkw = {"mask": mask_mb}
                fake, g_upd = g_model.apply(
                    {"params": g_st.params, "batch_stats": g_stats},
                    noise_mb, train=True, mutable=["batch_stats"], **mkw)
                fake = jax.lax.stop_gradient(fake)

                def c_loss_sum(c_params):
                    d_real, upd1 = c_model.apply(
                        {"params": c_params, "batch_stats": c_stats},
                        real_mb, train=True, mutable=["batch_stats"],
                        **mkw)
                    d_fake, upd2 = c_model.apply(
                        {"params": c_params,
                         "batch_stats": upd1["batch_stats"]},
                        fake, train=True, mutable=["batch_stats"], **mkw)

                    def critic_on(x):
                        scores, upd3 = c_model.apply(
                            {"params": c_params,
                             "batch_stats": upd2["batch_stats"]},
                            x, train=True, mutable=["batch_stats"], **mkw)
                        return scores, upd3["batch_stats"]

                    gp_mean, stats3 = gradient_penalty(
                        critic_on, real_mb, fake, None, lambda_gp,
                        mask_mb, alpha=alpha_mb)
                    diff = (d_fake - d_real).astype(jnp.float32)
                    if mask_mb is None:
                        s = jnp.sum(diff) + gp_mean * jnp.float32(mb)
                    else:
                        w_mb = jnp.sum(mask_mb.astype(jnp.float32))
                        # where-guard keeps padded rows' garbage out of
                        # forward AND cotangent; gp_mean·w_mb recovers
                        # the valid-row sum (weighted_mean's eps guard
                        # is exact for w_mb ≥ 1, and ·0 for w_mb = 0)
                        s = (jnp.sum(jnp.where(mask_mb > 0, diff, 0.0))
                             + gp_mean * w_mb)
                    return s, stats3

                (s, stats3), g = jax.value_and_grad(
                    c_loss_sum, has_aux=True)(c_st.params)
                g_stats_new = g_upd["batch_stats"]
                if mask_mb is not None:
                    ok = jnp.sum(mask_mb) > 0
                    stats3, g = freeze_and_kill(ok, stats3, c_stats, g)
                    g_stats_new = jax.tree_util.tree_map(
                        lambda n, o: jnp.where(ok, n, o), g_stats_new,
                        g_stats)
                    s = jnp.where(ok, s, 0.0)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                return (g_stats_new, stats3, gsum, ssum + s), None

            xs = ((real_k, noise_k, alpha_k) if mask_k is None
                  else (real_k, noise_k, alpha_k, mask_k))
            zeros = jax.tree_util.tree_map(jnp.zeros_like, c_st.params)
            (g_stats, c_stats, gsum, ssum), _ = jax.lax.scan(
                micro, (g_st.batch_stats, c_st.batch_stats, zeros,
                        jnp.float32(0.0)), xs)
            grads = jax.tree_util.tree_map(lambda g: g / w_total, gsum)
            g_st = g_st.replace(batch_stats=g_stats)
            c_st = apply_updates(c_tx, c_st, grads, c_stats)
            return (g_st, c_st), ssum / w_total

        critic_keys = jax.random.split(k_critic, critic_iters)
        (g_state, c_state), d_losses = jax.lax.scan(
            critic_update, (g_state, c_state), critic_keys)

        noise_k = split(jax.random.normal(k_g, (b_full, latent_dim),
                                          jnp.float32))

        def g_micro(mcarry, xs):
            g_stats, c_stats, gsum, ssum = mcarry
            if mask_k is None:
                noise_mb = xs
                mask_mb, mkw = None, {}
            else:
                noise_mb, mask_mb = xs
                mkw = {"mask": mask_mb}

            def g_loss_sum(g_params):
                fake, g_upd = g_model.apply(
                    {"params": g_params, "batch_stats": g_stats},
                    noise_mb, train=True, mutable=["batch_stats"], **mkw)
                scores, c_upd = c_model.apply(
                    {"params": c_state.params, "batch_stats": c_stats},
                    fake, train=True, mutable=["batch_stats"], **mkw)
                scores = scores.astype(jnp.float32)
                if mask_mb is None:
                    s = -jnp.sum(scores)
                else:
                    s = -jnp.sum(jnp.where(mask_mb > 0, scores, 0.0))
                return s, (g_upd["batch_stats"], c_upd["batch_stats"])

            (s, (g_stats_new, c_stats_new)), g = jax.value_and_grad(
                g_loss_sum, has_aux=True)(g_state.params)
            if mask_mb is not None:
                ok = jnp.sum(mask_mb) > 0
                g_stats_new, g = freeze_and_kill(ok, g_stats_new,
                                                 g_stats, g)
                c_stats_new = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(ok, n, o), c_stats_new,
                    c_stats)
                s = jnp.where(ok, s, 0.0)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
            return (g_stats_new, c_stats_new, gsum, ssum + s), None

        xs = (noise_k if mask_k is None else (noise_k, mask_k))
        zeros = jax.tree_util.tree_map(jnp.zeros_like, g_state.params)
        (g_stats, c_stats, gsum, ssum), _ = jax.lax.scan(
            g_micro, (g_state.batch_stats, c_state.batch_stats, zeros,
                      jnp.float32(0.0)), xs)
        g_grads = jax.tree_util.tree_map(lambda g: g / w_total, gsum)
        g_state = apply_updates(g_tx, g_state, g_grads, g_stats)
        c_state = c_state.replace(batch_stats=c_stats)
        return g_state, c_state, d_losses, ssum / w_total

    step = step_accum if grad_accum > 1 else step_plain

    donate_args = (() if not donate
                   else (0, 1, 2) if ema_decay is not None else (0, 1))
    if steps_per_call <= 1:
        if ema_decay is None:
            return jax.jit(step, donate_argnums=donate_args)

        def step_ema(g_state, c_state, ema, images_u8, idx, key, mask=None):
            g, c, d_losses, g_loss = step(g_state, c_state, images_u8,
                                          idx, key, mask)
            return (g, c, ema_update(ema, g.params, ema_decay),
                    d_losses, g_loss)

        return jax.jit(step_ema, donate_argnums=donate_args)

    if ema_decay is None:
        def multi(g_state, c_state, images_u8, idx_chunk, iters0, key):
            def body(carry, xs):
                idx, t = xs
                g, c, d_losses, g_loss = step(
                    carry[0], carry[1], images_u8, idx,
                    jax.random.fold_in(key, t))
                return (g, c), (d_losses, g_loss)

            (g_state, c_state), (d_losses, g_losses) = jax.lax.scan(
                body, (g_state, c_state),
                (idx_chunk, iters0 + jnp.arange(steps_per_call)))
            return g_state, c_state, d_losses, g_losses
    else:
        def multi(g_state, c_state, ema, images_u8, idx_chunk, iters0, key):
            def body(carry, xs):
                idx, t = xs
                g, c, d_losses, g_loss = step(
                    carry[0], carry[1], images_u8, idx,
                    jax.random.fold_in(key, t))
                return ((g, c, ema_update(carry[2], g.params, ema_decay)),
                        (d_losses, g_loss))

            (g_state, c_state, ema), (d_losses, g_losses) = jax.lax.scan(
                body, (g_state, c_state, ema),
                (idx_chunk, iters0 + jnp.arange(steps_per_call)))
            return g_state, c_state, ema, d_losses, g_losses

    return jax.jit(multi, donate_argnums=donate_args)

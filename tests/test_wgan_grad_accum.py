"""WGAN-GP --grad-accum correctness: every critic/generator update
microbatched inside the one program must reproduce torch
gradient-accumulation semantics — gradients of valid-row loss SUMS
accumulate and divide by the full batch's valid count, BN batch
statistics are per-microbatch with running stats threaded sequentially,
noise/α are the K=1 full-batch draws sliced per microbatch, and one
optimizer update fires per critic iter / per G step. The defining
contract is the hand-written sequential loop below (same pattern as
tests/test_grad_accum.py for the classifier). SGD keeps the end-to-end
comparison tight: post-update param deltas stay proportional to
gradient deltas, where Adam would amplify near-zero-gradient
coordinates to the ±lr envelope (CLAUDE.md r3f).

Reference analog: the hand-written loss.backward()-per-microbatch loop
around reference train_wggan.py:66-94; no counterpart exists there.
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from xgan.data.pipeline import gather_preprocess
from xgan.models import wgan
from xgan.train.common import ModelState, apply_updates
from xgan.train.wgan import gradient_penalty, make_wgan_step

LATENT, SIZE, FM = 8, 32, 4


def _models_and_states(tx):
    g_model = wgan.Generator(latent_dim=LATENT, feature_maps=FM,
                             image_size=SIZE)
    c_model = wgan.Critic(feature_maps=FM, image_size=SIZE)
    k = jax.random.key(0)
    gv = g_model.init(k, jnp.zeros((2, LATENT)), train=False)
    cv = c_model.init(k, jnp.zeros((2, SIZE, SIZE, 3)), train=False)
    g_state = ModelState(params=gv["params"],
                         batch_stats=gv["batch_stats"],
                         opt_state=tx.init(gv["params"]))
    c_state = ModelState(params=cv["params"],
                         batch_stats=cv["batch_stats"],
                         opt_state=tx.init(cv["params"]))
    return g_model, c_model, g_state, c_state


def _sequential_reference(g_model, c_model, g_tx, c_tx, g_state, c_state,
                          images, idx, key, *, accum, critic_iters,
                          lambda_gp, mask=None):
    """The defining contract as the obvious python loop. Per-microbatch
    computations are jitted so their XLA programs match the scan
    body's (eager-vs-compiled BN reductions otherwise add ~1e-6 noise;
    same lesson as tests/test_grad_accum.py's _sequential_reference).
    A fully-padded microbatch is skipped outright: stats freeze, its
    (potentially NaN-poisoned) gradient is dropped, no loss
    contribution."""
    b = idx.shape[0]
    mb = b // accum
    use_mask = mask is not None
    k_flip, k_critic, k_g = jax.random.split(key, 3)
    real = jax.jit(lambda im, ix, kf: gather_preprocess(
        im, ix, kf, train=True, dtype=jnp.float32))(images, idx, k_flip)
    w_total = (jnp.float32(b) if mask is None else
               jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1e-9))

    def mkw(mask_mb):
        return {"mask": mask_mb} if use_mask else {}

    @jax.jit
    def g_forward(g_params, g_stats, noise_mb, mask_mb):
        fake, upd = g_model.apply(
            {"params": g_params, "batch_stats": g_stats}, noise_mb,
            train=True, mutable=["batch_stats"], **mkw(mask_mb))
        return jax.lax.stop_gradient(fake), upd["batch_stats"]

    def c_loss_sum(c_params, c_stats, real_mb, fake_mb, alpha_mb, mask_mb):
        d_real, upd1 = c_model.apply(
            {"params": c_params, "batch_stats": c_stats}, real_mb,
            train=True, mutable=["batch_stats"], **mkw(mask_mb))
        d_fake, upd2 = c_model.apply(
            {"params": c_params, "batch_stats": upd1["batch_stats"]},
            fake_mb, train=True, mutable=["batch_stats"], **mkw(mask_mb))

        def critic_on(x):
            scores, upd3 = c_model.apply(
                {"params": c_params, "batch_stats": upd2["batch_stats"]},
                x, train=True, mutable=["batch_stats"], **mkw(mask_mb))
            return scores, upd3["batch_stats"]

        gp_mean, stats3 = gradient_penalty(
            critic_on, real_mb, fake_mb, None, lambda_gp,
            mask_mb if use_mask else None, alpha=alpha_mb)
        diff = (d_fake - d_real).astype(jnp.float32)
        if not use_mask:
            s = jnp.sum(diff) + gp_mean * jnp.float32(mb)
        else:
            w_mb = jnp.sum(mask_mb.astype(jnp.float32))
            s = (jnp.sum(jnp.where(mask_mb > 0, diff, 0.0))
                 + gp_mean * w_mb)
        return s, stats3

    c_mb_grad = jax.jit(jax.value_and_grad(c_loss_sum, has_aux=True))

    def g_loss_sum(g_params, g_stats, c_params, c_stats, noise_mb,
                   mask_mb):
        fake, g_upd = g_model.apply(
            {"params": g_params, "batch_stats": g_stats}, noise_mb,
            train=True, mutable=["batch_stats"], **mkw(mask_mb))
        scores, c_upd = c_model.apply(
            {"params": c_params, "batch_stats": c_stats}, fake,
            train=True, mutable=["batch_stats"], **mkw(mask_mb))
        scores = scores.astype(jnp.float32)
        s = (-jnp.sum(scores) if not use_mask
             else -jnp.sum(jnp.where(mask_mb > 0, scores, 0.0)))
        return s, (g_upd["batch_stats"], c_upd["batch_stats"])

    g_mb_grad = jax.jit(jax.value_and_grad(g_loss_sum, has_aux=True))

    def sl(x, i):
        return x[i * mb:(i + 1) * mb]

    d_losses = []
    for key_i in jax.random.split(k_critic, critic_iters):
        k_noise, k_alpha = jax.random.split(key_i)
        noise = jax.random.normal(k_noise, (b, LATENT), jnp.float32)
        alpha = jax.random.uniform(k_alpha, (b, 1, 1, 1), jnp.float32)
        g_stats, c_stats = g_state.batch_stats, c_state.batch_stats
        gsum = jax.tree_util.tree_map(jnp.zeros_like, c_state.params)
        ssum = jnp.float32(0.0)
        for i in range(accum):
            mask_mb = None if mask is None else sl(mask, i)
            if use_mask and float(jnp.sum(mask_mb)) == 0:
                continue  # fully padded: freeze + drop
            fake_mb, g_stats = g_forward(g_state.params, g_stats,
                                         sl(noise, i), mask_mb)
            (s, stats3), g = c_mb_grad(c_state.params, c_stats,
                                       sl(real, i), fake_mb,
                                       sl(alpha, i), mask_mb)
            c_stats = stats3
            gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
            ssum = ssum + s
        grads = jax.tree_util.tree_map(lambda g: g / w_total, gsum)
        g_state = g_state.replace(batch_stats=g_stats)
        c_state = apply_updates(c_tx, c_state, grads, c_stats)
        d_losses.append(ssum / w_total)

    g_stats, c_stats = g_state.batch_stats, c_state.batch_stats
    noise = jax.random.normal(k_g, (b, LATENT), jnp.float32)
    gsum = jax.tree_util.tree_map(jnp.zeros_like, g_state.params)
    ssum = jnp.float32(0.0)
    for i in range(accum):
        mask_mb = None if mask is None else sl(mask, i)
        if use_mask and float(jnp.sum(mask_mb)) == 0:
            continue
        (s, (g_stats, c_stats)), g = g_mb_grad(
            g_state.params, g_stats, c_state.params, c_stats,
            sl(noise, i), mask_mb)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        ssum = ssum + s
    g_grads = jax.tree_util.tree_map(lambda g: g / w_total, gsum)
    g_state = apply_updates(g_tx, g_state, g_grads, g_stats)
    c_state = c_state.replace(batch_stats=c_stats)
    return g_state, c_state, jnp.stack(d_losses), ssum / w_total


def _assert_trees_close(a, b, **kw):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


@pytest.mark.parametrize("mask_case", ["none", "tail"])
def test_accum_step_matches_sequential_reference(mask_case):
    """The jitted grad_accum=A step == the hand loop: final params
    (SGD), BN running stats, and reported losses. 'tail' exercises a
    partially-padded AND a fully-padded microbatch (batch 8, A=4,
    5 valid rows -> microbatches [11][11][10][00])."""
    accum = 2 if mask_case == "none" else 4
    tx = optax.sgd(1e-3)
    g_model, c_model, g_state, c_state = _models_and_states(tx)
    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (20, SIZE, SIZE, 3), np.uint8))
    idx = jnp.arange(8, dtype=jnp.int32)
    key = jax.random.key(7)
    mask = (None if mask_case == "none"
            else jnp.asarray([1] * 5 + [0] * 3, jnp.float32))

    step = make_wgan_step(g_model, c_model, tx, tx, latent_dim=LATENT,
                          critic_iters=2, lambda_gp=10.0, donate=False,
                          grad_accum=accum)
    g2, c2, d_losses, g_loss = step(g_state, c_state, images, idx, key,
                                    mask=mask)
    rg, rc, rd, rgl = _sequential_reference(
        g_model, c_model, tx, tx, g_state, c_state, images, idx, key,
        accum=accum, critic_iters=2, lambda_gp=10.0, mask=mask)

    np.testing.assert_allclose(np.asarray(d_losses), np.asarray(rd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(g_loss), float(rgl), rtol=1e-5,
                               atol=1e-5)
    _assert_trees_close(g2.params, rg.params, rtol=1e-4, atol=1e-6)
    _assert_trees_close(c2.params, rc.params, rtol=1e-4, atol=1e-6)
    _assert_trees_close(g2.batch_stats, rg.batch_stats, rtol=1e-4,
                        atol=1e-6)
    _assert_trees_close(c2.batch_stats, rc.batch_stats, rtol=1e-4,
                        atol=1e-6)
    for leaf in jax.tree_util.tree_leaves((g2, c2, d_losses, g_loss)):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_accum_changes_only_bn_granularity():
    """A=2 vs A=1 on the same inputs: both finite and close — the only
    semantic difference is per-microbatch BN batch statistics, which at
    init (BN scale 1, bias 0, random weights) shifts losses by O(1e-1)
    at most, not orders of magnitude. Guards against e.g. a dropped
    1/W normalization (which would show up as a ~A× loss ratio)."""
    from xgan.train.common import adam
    tx_a, tx_b = adam(2e-4, 0.5, beta2=0.9), adam(2e-4, 0.5, beta2=0.9)
    g_model, c_model, g_state, c_state = _models_and_states(tx_a)
    images = jnp.asarray(np.random.default_rng(1).integers(
        0, 255, (20, SIZE, SIZE, 3), np.uint8))
    idx = jnp.arange(8, dtype=jnp.int32)
    key = jax.random.key(3)
    outs = {}
    for accum in (1, 2):
        step = make_wgan_step(g_model, c_model, tx_a, tx_b,
                              latent_dim=LATENT, critic_iters=2,
                              lambda_gp=10.0, donate=False,
                              grad_accum=accum)
        _, _, d_losses, g_loss = step(g_state, c_state, images, idx, key)
        outs[accum] = (np.asarray(d_losses), float(g_loss))
        assert np.all(np.isfinite(outs[accum][0]))
    np.testing.assert_allclose(outs[1][0], outs[2][0], rtol=0.5, atol=0.5)
    np.testing.assert_allclose(outs[1][1], outs[2][1], rtol=0.5, atol=0.5)


def _wgan_args(fake_dataset, tmp_path, **over):
    args = dict(
        data_dir=fake_dataset["data_dir"], model_dir=str(tmp_path / "m"),
        output_dir=str(tmp_path / "r"),
        results_dir=str(tmp_path / "r/metrics"),
        figures_dir=str(tmp_path / "r/figures"),
        num_channels=3, latent_dim=8, feature_maps_g=4, feature_maps_d=4,
        epochs=1, batch_size=8, lr=2e-4, beta1=0.5, workers=0,
        vis_batch_size=8, save_interval=500, checkpoint_interval=10,
        critic_iters=2, lambda_gp=10.0, image_size=32, seed=0,
        compute_dtype="f32", cache_dir=str(tmp_path / "cache"),
        limit_batches=2, trace_dir="", cpu=True, grad_accum=1)
    args.update(over)
    return argparse.Namespace(**args)


def test_loop_grad_accum_end_to_end(fake_dataset, tmp_path):
    from xgan.train.wgan_loop import train_wgan
    history = train_wgan(_wgan_args(fake_dataset, tmp_path, grad_accum=2))
    assert len(history["D_losses"]) == 4  # 2 batches x 2 critic iters
    assert len(history["G_losses"]) == 2
    assert all(np.isfinite(history["D_losses"]))
    assert (tmp_path / "m/wgan/generator_final.msgpack").exists()


def test_loop_indivisible_grad_accum_ignored(fake_dataset, tmp_path,
                                             capsys):
    from xgan.train.wgan_loop import train_wgan
    history = train_wgan(_wgan_args(fake_dataset, tmp_path, grad_accum=3))
    assert "does not divide" in capsys.readouterr().out
    assert len(history["G_losses"]) == 2


def test_steps_per_call_composes_with_grad_accum():
    """The loops pass grad_accum into BOTH the single-step and the
    steps_per_call=K programs; the K-scan over the accumulated step
    must equal K sequential single dispatches (same fold_in PRNG
    stream — the invariant every steps-per-call mode pins)."""
    from xgan.train.common import adam
    tx_a, tx_b = adam(2e-4, 0.5, beta2=0.9), adam(2e-4, 0.5, beta2=0.9)
    g_model, c_model, g_state, c_state = _models_and_states(tx_a)
    images = jnp.asarray(np.random.default_rng(2).integers(
        0, 255, (20, SIZE, SIZE, 3), np.uint8))
    kw = dict(latent_dim=LATENT, critic_iters=2, lambda_gp=10.0,
              donate=False, grad_accum=2)
    single = make_wgan_step(g_model, c_model, tx_a, tx_b, **kw)
    multi = make_wgan_step(g_model, c_model, tx_a, tx_b,
                           steps_per_call=2, **kw)

    key = jax.random.key(11)
    idx_chunk = jnp.stack([jnp.arange(8, dtype=jnp.int32),
                           jnp.arange(8, 16, dtype=jnp.int32)])
    gm, cm, d_m, g_m = multi(g_state, c_state, images, idx_chunk,
                             jnp.int32(0), key)
    gs, cs = g_state, c_state
    outs = []
    for t in range(2):
        gs, cs, d_l, g_l = single(gs, cs, images, idx_chunk[t],
                                  jax.random.fold_in(key, t))
        outs.append((d_l, g_l))
    np.testing.assert_allclose(np.asarray(d_m),
                               np.stack([np.asarray(o[0])
                                         for o in outs]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_m),
                               np.asarray([float(o[1]) for o in outs]),
                               rtol=1e-5, atol=1e-5)
    # post-Adam param comparison: ±lr envelope (CLAUDE.md r3f)
    for a, b in zip(jax.tree_util.tree_leaves(gm.params),
                    jax.tree_util.tree_leaves(gs.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2.5e-4)

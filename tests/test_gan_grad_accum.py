"""DCGAN + CGAN --grad-accum correctness (framework-symmetry companion
to tests/test_wgan_grad_accum.py; VERDICT r3 next #6 'asymmetric flag'
weakness): the microbatched step must reproduce torch
gradient-accumulation semantics — valid-row loss-SUM gradients divided
by the full batch's valid count, per-microbatch BN batch statistics
threaded sequentially, K=1 full-batch PRNG draws sliced, G forwards
recomputed in the G phase from recorded input BN stats
(bitwise-identical fake), one optimizer update per D/G phase — defined
by the hand-written sequential loops below. SGD keeps end-to-end param
comparisons tight (Adam would amplify near-zero-gradient coordinates to
the ±lr envelope, CLAUDE.md r3f)."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from xgan.data.pipeline import gather_preprocess
from xgan.models import cgan, dcgan
from xgan.train.cgan import make_cgan_step
from xgan.train.common import ModelState, apply_updates
from xgan.train.gan import FAKE_LABEL, REAL_LABEL, make_dcgan_step

LATENT, SIZE, FM = 8, 32, 4


def _guarded_sum(per_sample, mask_mb):
    per_sample = per_sample.astype(jnp.float32)
    if mask_mb is None:
        return jnp.sum(per_sample)
    return jnp.sum(jnp.where(mask_mb > 0, per_sample, 0.0))


def _bce_sum(logits, target, mask_mb):
    t = jnp.broadcast_to(jnp.asarray(target, jnp.float32), logits.shape)
    return _guarded_sum(optax.sigmoid_binary_cross_entropy(
        logits.astype(jnp.float32), t), mask_mb)


def _assert_trees_close(a, b, **kw):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


def _dcgan_sequential(g_model, d_model, tx, g_state, d_state, images,
                      idx, key, *, accum, mask=None):
    """The defining sequential loop for make_dcgan_step(grad_accum=A).
    Per-microbatch computations are jitted so their XLA programs match
    the scan body's (tests/test_grad_accum.py lesson)."""
    b = idx.shape[0]
    mbsz = b // accum
    use_mask = mask is not None
    k_flip, k_noise = jax.random.split(key)
    real = jax.jit(lambda im, ix, kf: gather_preprocess(
        im, ix, kf, train=True, dtype=jnp.float32))(images, idx, k_flip)
    noise = jax.random.normal(k_noise, (b, LATENT), jnp.float32)
    w_total = (jnp.float32(b) if mask is None else
               jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1e-9))

    def mkw(m):
        return {"mask": m} if use_mask else {}

    @jax.jit
    def g_forward(g_params, g_stats, noise_mb, mask_mb):
        fake, upd = g_model.apply(
            {"params": g_params, "batch_stats": g_stats}, noise_mb,
            train=True, mutable=["batch_stats"], **mkw(mask_mb))
        return jax.lax.stop_gradient(fake), upd["batch_stats"]

    def d_loss_sum(d_params, d_stats, real_mb, fake_mb, mask_mb):
        lr_, upd1 = d_model.apply(
            {"params": d_params, "batch_stats": d_stats}, real_mb,
            train=True, mutable=["batch_stats"], **mkw(mask_mb))
        lf_, upd2 = d_model.apply(
            {"params": d_params, "batch_stats": upd1["batch_stats"]},
            fake_mb, train=True, mutable=["batch_stats"], **mkw(mask_mb))
        s = (_bce_sum(lr_, REAL_LABEL, mask_mb)
             + _bce_sum(lf_, FAKE_LABEL, mask_mb))
        return s, upd2["batch_stats"]

    d_grad = jax.jit(jax.value_and_grad(d_loss_sum, has_aux=True))

    def g_loss_sum(g_params, g_stats_in, d_params, d_stats, noise_mb,
                   mask_mb):
        fake, _ = g_model.apply(
            {"params": g_params, "batch_stats": g_stats_in}, noise_mb,
            train=True, mutable=["batch_stats"], **mkw(mask_mb))
        logits, upd3 = d_model.apply(
            {"params": d_params, "batch_stats": d_stats}, fake,
            train=True, mutable=["batch_stats"], **mkw(mask_mb))
        return _bce_sum(logits, REAL_LABEL, mask_mb), upd3["batch_stats"]

    g_grad = jax.jit(jax.value_and_grad(g_loss_sum, has_aux=True))

    def sl(x, i):
        return x[i * mbsz:(i + 1) * mbsz]

    g_stats, d_stats = g_state.batch_stats, d_state.batch_stats
    gsum = jax.tree_util.tree_map(jnp.zeros_like, d_state.params)
    stats_seq, ds = [], jnp.float32(0.0)
    for i in range(accum):
        mask_mb = None if mask is None else sl(mask, i)
        if use_mask and float(jnp.sum(mask_mb)) == 0:
            stats_seq.append(None)
            continue
        stats_seq.append(g_stats)
        fake_mb, g_stats = g_forward(g_state.params, g_stats,
                                     sl(noise, i), mask_mb)
        (s, new_stats), g = d_grad(d_state.params, d_stats, sl(real, i),
                                   fake_mb, mask_mb)
        d_stats = new_stats
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        ds = ds + s
    d_state = apply_updates(
        tx, d_state,
        jax.tree_util.tree_map(lambda g: g / w_total, gsum), d_stats)
    loss_d = ds / w_total

    d_stats = d_state.batch_stats
    gsum = jax.tree_util.tree_map(jnp.zeros_like, g_state.params)
    gs = jnp.float32(0.0)
    for i in range(accum):
        mask_mb = None if mask is None else sl(mask, i)
        if use_mask and float(jnp.sum(mask_mb)) == 0:
            continue
        (s, new_stats), g = g_grad(g_state.params, stats_seq[i],
                                   d_state.params, d_stats, sl(noise, i),
                                   mask_mb)
        d_stats = new_stats
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        gs = gs + s
    g_state = apply_updates(
        tx, g_state,
        jax.tree_util.tree_map(lambda g: g / w_total, gsum), g_stats)
    d_state = d_state.replace(batch_stats=d_stats)
    return g_state, d_state, loss_d, gs / w_total


@pytest.mark.parametrize("mask_case", ["none", "tail"])
def test_dcgan_accum_matches_sequential_reference(mask_case):
    """grad_accum=A DCGAN step == the hand loop (SGD): final G/D params,
    BN stats, loss_D/loss_G. 'tail' includes a fully-padded microbatch
    (batch 8, A=4, 5 valid rows)."""
    accum = 2 if mask_case == "none" else 4
    tx = optax.sgd(1e-3)
    g_model = dcgan.Generator(latent_dim=LATENT, feature_maps=FM,
                              image_size=SIZE)
    d_model = dcgan.Discriminator(feature_maps=FM, image_size=SIZE)
    k = jax.random.key(0)
    gv = g_model.init(k, jnp.zeros((2, LATENT)), train=False)
    dv = d_model.init(k, jnp.zeros((2, SIZE, SIZE, 3)), train=False)
    g_state = ModelState(params=gv["params"],
                         batch_stats=gv["batch_stats"],
                         opt_state=tx.init(gv["params"]))
    d_state = ModelState(params=dv["params"],
                         batch_stats=dv["batch_stats"],
                         opt_state=tx.init(dv["params"]))
    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (20, SIZE, SIZE, 3), np.uint8))
    idx = jnp.arange(8, dtype=jnp.int32)
    key = jax.random.key(5)
    mask = (None if mask_case == "none"
            else jnp.asarray([1] * 5 + [0] * 3, jnp.float32))

    step = make_dcgan_step(g_model, d_model, tx, tx, latent_dim=LATENT,
                           donate=False, grad_accum=accum)
    g2, d2, metrics = step(g_state, d_state, images, idx, key, mask=mask)
    rg, rd, loss_d, loss_g = _dcgan_sequential(
        g_model, d_model, tx, g_state, d_state, images, idx, key,
        accum=accum, mask=mask)

    m = np.asarray(metrics)
    assert np.all(np.isfinite(m)), m
    np.testing.assert_allclose(m[1], float(loss_d), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(m[0], float(loss_g), rtol=1e-5, atol=1e-5)
    _assert_trees_close(g2.params, rg.params, rtol=1e-4, atol=1e-6)
    _assert_trees_close(d2.params, rd.params, rtol=1e-4, atol=1e-6)
    _assert_trees_close(g2.batch_stats, rg.batch_stats, rtol=1e-4,
                        atol=1e-6)
    _assert_trees_close(d2.batch_stats, rd.batch_stats, rtol=1e-4,
                        atol=1e-6)


def _cgan_sequential(g_model, d_model, vgg, tx, g_state, d_state,
                     vgg_params, images, labels_all, idx, epoch, key, *,
                     accum, mask=None):
    """Defining sequential loop for make_cgan_step(grad_accum=A): the
    same full-batch draws sliced, per-microbatch jitted grads of
    valid-row loss SUMS, the adaptive gate on the ACCUMULATED
    full-batch D(x)/D(G(z1)) means, and the G phase recomputing fakes
    from recorded input stats."""
    import optax as _optax
    from xgan.ops.reduce import per_sample_mse
    from xgan.train.cgan import FM_WEIGHT, PERCEPTUAL_WEIGHT

    b = idx.shape[0]
    mbsz = b // accum
    use_mask = mask is not None

    def mkw(m):
        return {"mask": m} if use_mask else {}

    k_flip, k_noise, k_lab, k_rs, k_fs = jax.random.split(key, 5)
    real = jax.jit(lambda im, ix, kf: gather_preprocess(
        im, ix, kf, train=True, dtype=jnp.float32))(images, idx, k_flip)
    rlab = jnp.take(labels_all, idx, axis=0)
    rt = 0.9 - 0.1 * jax.random.uniform(k_rs, (b,))
    ft = 0.1 + 0.1 * jax.random.uniform(k_fs, (b,))
    noise = jax.random.normal(k_noise, (b, LATENT), jnp.float32)
    flab = jax.random.randint(k_lab, (b,), 0, g_model.num_classes)
    w_total = (jnp.float32(b) if mask is None else
               jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1e-9))

    def ps_bce_sum(logits, targets, mask_mb):
        return _guarded_sum(_optax.sigmoid_binary_cross_entropy(
            logits.astype(jnp.float32), targets), mask_mb)

    def feats_sum(fa, fb, mask_mb):
        total = jnp.float32(0.0)
        for a_, b_ in zip(fa, fb):
            total = total + _guarded_sum(per_sample_mse(a_, b_), mask_mb)
        return total

    @jax.jit
    def g_forward(g_params, g_stats, noise_mb, flab_mb, mask_mb):
        fake, upd = g_model.apply(
            {"params": g_params, "batch_stats": g_stats}, noise_mb,
            flab_mb, train=True, mutable=["batch_stats"], **mkw(mask_mb))
        return jax.lax.stop_gradient(fake), upd["batch_stats"]

    def d_loss_sum(d_params, d_stats, real_mb, rlab_mb, fake_mb, flab_mb,
                   rt_mb, ft_mb, mask_mb):
        lr_, upd1 = d_model.apply(
            {"params": d_params, "batch_stats": d_stats}, real_mb,
            rlab_mb, train=True, mutable=["batch_stats"], **mkw(mask_mb))
        lf_, upd2 = d_model.apply(
            {"params": d_params, "batch_stats": upd1["batch_stats"]},
            fake_mb, flab_mb, train=True, mutable=["batch_stats"],
            **mkw(mask_mb))
        s = ps_bce_sum(lr_, rt_mb, mask_mb) + ps_bce_sum(lf_, ft_mb,
                                                         mask_mb)
        dx_s = _guarded_sum(jax.nn.sigmoid(lr_.astype(jnp.float32)),
                            mask_mb)
        dgz1_s = _guarded_sum(jax.nn.sigmoid(lf_.astype(jnp.float32)),
                              mask_mb)
        return s, (upd2["batch_stats"], dx_s, dgz1_s)

    d_grad = jax.jit(jax.value_and_grad(d_loss_sum, has_aux=True))

    def g_loss_sum(g_params, g_stats_in, d_params, d_stats, vgg_params,
                   noise_mb, flab_mb, real_mb, rlab_mb, rt_mb, mask_mb):
        fake, _ = g_model.apply(
            {"params": g_params, "batch_stats": g_stats_in}, noise_mb,
            flab_mb, train=True, mutable=["batch_stats"], **mkw(mask_mb))
        (logits, fake_feats), upd3 = d_model.apply(
            {"params": d_params, "batch_stats": d_stats}, fake, flab_mb,
            train=True, features=True, mutable=["batch_stats"],
            **mkw(mask_mb))
        (_, real_feats), upd4 = d_model.apply(
            {"params": d_params, "batch_stats": upd3["batch_stats"]},
            real_mb, rlab_mb, train=True, features=True,
            mutable=["batch_stats"], **mkw(mask_mb))
        vf = vgg.apply({"params": vgg_params}, fake)
        vr = jax.tree.map(jax.lax.stop_gradient,
                          vgg.apply({"params": vgg_params}, real_mb))
        s = (ps_bce_sum(logits, rt_mb, mask_mb)
             + PERCEPTUAL_WEIGHT * feats_sum(vf, vr, mask_mb)
             + FM_WEIGHT * feats_sum(real_feats, fake_feats, mask_mb))
        return s, upd4["batch_stats"]

    g_grad = jax.jit(jax.value_and_grad(g_loss_sum, has_aux=True))

    def sl(x, i):
        return x[i * mbsz:(i + 1) * mbsz]

    # D phase
    g_stats, d_stats = g_state.batch_stats, d_state.batch_stats
    gsum = jax.tree_util.tree_map(jnp.zeros_like, d_state.params)
    stats_seq, ds, dxs, dgz1s = [], 0.0, 0.0, 0.0
    for i in range(accum):
        mask_mb = None if mask is None else sl(mask, i)
        if use_mask and float(jnp.sum(mask_mb)) == 0:
            stats_seq.append(None)
            continue
        stats_seq.append(g_stats)
        fake_mb, g_stats = g_forward(g_state.params, g_stats,
                                     sl(noise, i), sl(flab, i), mask_mb)
        (s, (d_stats, dx_s, dgz1_s)), g = d_grad(
            d_state.params, d_stats, sl(real, i), sl(rlab, i), fake_mb,
            sl(flab, i), sl(rt, i), sl(ft, i), mask_mb)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        ds, dxs, dgz1s = ds + s, dxs + dx_s, dgz1s + dgz1_s
    d_x, d_g_z1 = dxs / w_total, dgz1s / w_total
    gate = bool(d_x < 0.8) or bool(d_g_z1 > 0.2) or bool(epoch < 5)
    if gate:
        d_state = apply_updates(
            tx, d_state,
            jax.tree_util.tree_map(lambda g: g / w_total, gsum), d_stats)
    else:
        d_state = d_state.replace(batch_stats=d_stats)
    g_state = g_state.replace(batch_stats=g_stats)

    # G phase
    d_stats = d_state.batch_stats
    gsum = jax.tree_util.tree_map(jnp.zeros_like, g_state.params)
    gs = 0.0
    for i in range(accum):
        mask_mb = None if mask is None else sl(mask, i)
        if use_mask and float(jnp.sum(mask_mb)) == 0:
            continue
        (s, d_stats), g = g_grad(
            g_state.params, stats_seq[i], d_state.params, d_stats,
            vgg_params, sl(noise, i), sl(flab, i), sl(real, i),
            sl(rlab, i), sl(rt, i), mask_mb)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        gs = gs + s
    g_state = apply_updates(
        tx, g_state,
        jax.tree_util.tree_map(lambda g: g / w_total, gsum),
        g_state.batch_stats)
    d_state = d_state.replace(batch_stats=d_stats)
    return g_state, d_state, ds / w_total, gs / w_total


@pytest.mark.parametrize("mask_case", ["none", "tail"])
def test_cgan_accum_matches_sequential_reference(mask_case):
    """grad_accum=A CGAN step == the hand loop (SGD): final G/D params,
    BN stats, loss_D/loss_G — covering the gate-on-accumulated-means,
    the VGG/FM row-sum accumulation, and ('tail') a fully-padded
    microbatch."""
    from xgan.models.vgg import VGG16Features
    accum = 2 if mask_case == "none" else 4
    tx = optax.sgd(1e-3)
    g_model = cgan.Generator(latent_dim=LATENT, feature_maps=FM,
                             image_size=SIZE)
    d_model = cgan.Discriminator(feature_maps=FM, image_size=SIZE)
    vgg = VGG16Features()
    k = jax.random.key(0)
    lab2 = jnp.zeros((2,), jnp.int32)
    gv = g_model.init(k, jnp.zeros((2, LATENT)), lab2, train=False)
    dv = d_model.init(k, jnp.zeros((2, SIZE, SIZE, 3)), lab2,
                      train=False)
    vgg_params = vgg.init(k, jnp.zeros((1, SIZE, SIZE, 3)))["params"]
    g_state = ModelState(params=gv["params"],
                         batch_stats=gv["batch_stats"],
                         opt_state=tx.init(gv["params"]))
    d_state = ModelState(params=dv["params"],
                         batch_stats=dv["batch_stats"],
                         opt_state=tx.init(dv["params"]))
    images = jnp.asarray(np.random.default_rng(3).integers(
        0, 255, (20, SIZE, SIZE, 3), np.uint8))
    labels = jnp.asarray((np.arange(20) % 2).astype(np.int32))
    idx = jnp.arange(8, dtype=jnp.int32)
    key = jax.random.key(13)
    mask = (None if mask_case == "none"
            else jnp.asarray([1] * 5 + [0] * 3, jnp.float32))

    step = make_cgan_step(g_model, d_model, vgg, tx, tx,
                          latent_dim=LATENT, donate=False,
                          grad_accum=accum)
    g2, d2, metrics = step(g_state, d_state, vgg_params, images, labels,
                           idx, jnp.int32(7), key, mask=mask)
    rg, rd, loss_d, loss_g = _cgan_sequential(
        g_model, d_model, vgg, tx, g_state, d_state, vgg_params, images,
        labels, idx, 7, key, accum=accum, mask=mask)

    m = np.asarray(metrics)
    assert np.all(np.isfinite(m)), m
    np.testing.assert_allclose(m[1], float(loss_d), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(m[0], float(loss_g), rtol=1e-4, atol=1e-4)
    # G gradients flow through the 10x-weighted VGG chain: scan-body vs
    # separate-jit reduction orders leave ~1e-5 absolute noise on the
    # SGD'd params (measured max 9.7e-6 at these shapes; rel is
    # meaningless on N(0,0.02)-init coords near zero) — 3x headroom.
    _assert_trees_close(g2.params, rg.params, rtol=1e-3, atol=3e-5)
    _assert_trees_close(d2.params, rd.params, rtol=1e-4, atol=1e-6)
    _assert_trees_close(g2.batch_stats, rg.batch_stats, rtol=1e-4,
                        atol=1e-6)
    _assert_trees_close(d2.batch_stats, rd.batch_stats, rtol=1e-3,
                        atol=3e-5)


def test_cgan_accum_runs_and_matches_scale():
    """CGAN grad_accum=2 vs A=1 on identical inputs: all 7 metrics
    finite and on the same scale (a dropped 1/W or a double-counted
    perceptual/FM term shows as a ~2× ratio); the gate input means
    (D_x, D_G_z1) must agree closely since they are means of the same
    per-sample sigmoids, just accumulated in microbatch pieces."""
    from xgan.models.vgg import VGG16Features
    from xgan.train.common import adam, create_state
    tx_g, tx_d = adam(2e-4, 0.5), adam(2e-4, 0.5)
    g_model = cgan.Generator(latent_dim=LATENT, feature_maps=FM,
                             image_size=SIZE)
    d_model = cgan.Discriminator(feature_maps=FM, image_size=SIZE)
    vgg = VGG16Features()
    k = jax.random.key(0)
    lab = jnp.zeros((2,), jnp.int32)
    g_state = create_state(g_model, tx_g, k, jnp.zeros((2, LATENT)), lab,
                           train=False)
    d_state = create_state(d_model, tx_d, k,
                           jnp.zeros((2, SIZE, SIZE, 3)), lab,
                           train=False)
    vgg_params = vgg.init(k, jnp.zeros((1, SIZE, SIZE, 3)))["params"]
    images = jnp.asarray(np.random.default_rng(1).integers(
        0, 255, (20, SIZE, SIZE, 3), np.uint8))
    labels = jnp.asarray((np.arange(20) % 2).astype(np.int32))
    idx = jnp.arange(8, dtype=jnp.int32)
    key = jax.random.key(9)
    outs = {}
    for accum in (1, 2):
        step = make_cgan_step(g_model, d_model, vgg, tx_g, tx_d,
                              latent_dim=LATENT, donate=False,
                              grad_accum=accum)
        _, _, metrics = step(g_state, d_state, vgg_params, images,
                             labels, idx, jnp.int32(0), key)
        outs[accum] = np.asarray(metrics)
        assert np.all(np.isfinite(outs[accum])), outs[accum]
    # D_x / D_G_z1 feed the adaptive gate: sigmoid means of the same
    # functional, so they may differ only through per-microbatch BN
    np.testing.assert_allclose(outs[1][2], outs[2][2], atol=0.15)
    np.testing.assert_allclose(outs[1][3], outs[2][3], atol=0.15)
    # losses on the same scale (catch 1/W or weight slips)
    for j in (0, 1, 5, 6):
        a, b = outs[1][j], outs[2][j]
        assert abs(a - b) <= 0.5 * max(abs(a), abs(b), 1.0), (j, a, b)


def test_dcgan_loop_grad_accum_end_to_end(fake_dataset, tmp_path):
    from xgan.train.gan_loop import train_dcgan
    args = argparse.Namespace(
        data_dir=fake_dataset["data_dir"], model_dir=str(tmp_path / "m"),
        output_dir=str(tmp_path / "r"),
        results_dir=str(tmp_path / "r/metrics"),
        figures_dir=str(tmp_path / "r/figures"),
        num_channels=3, latent_dim=8, feature_maps_g=4, feature_maps_d=4,
        epochs=1, batch_size=8, lr=2e-4, beta1=0.5, workers=0,
        vis_batch_size=8, save_interval=500, checkpoint_interval=10,
        image_size=32, seed=0, compute_dtype="f32",
        cache_dir=str(tmp_path / "cache"), limit_batches=2, trace_dir="",
        cpu=True, grad_accum=2)
    history = train_dcgan(args)
    assert len(history["G_losses_iter"]) == 2
    assert all(np.isfinite(history["G_losses_iter"]))
    assert (tmp_path / "m/gan/generator_final.msgpack").exists()


def test_cgan_loop_grad_accum_end_to_end(fake_dataset, tmp_path):
    from xgan.train.cgan_loop import train_cgan
    args = argparse.Namespace(
        data_dir=fake_dataset["data_dir"], model_dir=str(tmp_path / "m"),
        output_dir=str(tmp_path / "r"),
        results_dir=str(tmp_path / "r/metrics"),
        figures_dir=str(tmp_path / "r/figures"),
        num_channels=3, latent_dim=8, feature_maps_g=8, feature_maps_d=8,
        epochs=1, batch_size=8, lr=2e-4, beta1=0.5, workers=0,
        vis_batch_size=8, save_interval=1000, checkpoint_interval=5,
        vgg_path="", image_size=32, seed=0, compute_dtype="f32",
        cache_dir=str(tmp_path / "cache"), limit_batches=2, trace_dir="",
        cpu=True, grad_accum=2)
    history = train_cgan(args)
    assert "perceptual_losses" in history
    assert len(history["G_losses_epoch"]) == 1
    assert np.isfinite(history["G_losses_epoch"][0])

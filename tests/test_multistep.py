"""--steps-per-call (K-step lax.scan dispatch) equivalence tests.

The multi-step program must reproduce the K=1 dispatch loop exactly: same
per-step PRNG stream (fold_in(key, iters0 + t)), same final states, same
per-iteration metrics (xgan/train/{gan,wgan,cgan}.py multistep wrappers).
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.parallel import create_mesh
from xgan.train.common import adam, create_state

TOL = dict(rtol=2e-4, atol=2e-5)  # scan vs unrolled compile differently


def tree_close(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **TOL)


@pytest.fixture(scope="module")
def mesh_ctx():
    return create_mesh()


@pytest.fixture(scope="module")
def images():
    return jnp.asarray(np.random.default_rng(0)
                       .integers(0, 255, (64, 32, 32, 3), np.uint8))


def run_pair(step, multi, states, const_args, idx_rows, key, n_extra=()):
    """Run n=K steps singly and as one chunk; return both results."""
    k = idx_rows.shape[0]
    single = list(states)
    metrics_single = []
    for t in range(k):
        out = step(*single, *const_args, idx_rows[t],
                   *n_extra, jax.random.fold_in(key, t))
        single, rest = list(out[:len(states)]), out[len(states):]
        metrics_single.append(rest)
    out = multi(*states, *const_args, idx_rows, *n_extra,
                jnp.int32(0), key)
    multi_states, multi_rest = list(out[:len(states)]), out[len(states):]
    return single, metrics_single, multi_states, multi_rest


def test_dcgan_multistep_equivalence(mesh_ctx, images):
    from xgan.models import dcgan
    from xgan.train.gan import make_dcgan_step
    g_model = dcgan.Generator(latent_dim=16, feature_maps=8, image_size=32)
    d_model = dcgan.Discriminator(feature_maps=8, image_size=32)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    key = jax.random.key(0)
    g0 = create_state(g_model, g_tx, key, jnp.zeros((2, 16)), train=False)
    d0 = create_state(d_model, d_tx, key, jnp.zeros((2, 32, 32, 3)),
                      train=False)
    kwargs = dict(latent_dim=16,
                  batch_sharding=mesh_ctx.batch_sharding(4), donate=False)
    step = make_dcgan_step(g_model, d_model, g_tx, d_tx, **kwargs)
    multi = make_dcgan_step(g_model, d_model, g_tx, d_tx,
                            steps_per_call=3, **kwargs)
    idx_rows = jnp.asarray(np.random.default_rng(1)
                           .integers(0, 64, (3, 8), np.int64)
                           .astype(np.int32))
    single, ms, mstates, mrest = run_pair(
        step, multi, [g0, d0], (images,), idx_rows, jax.random.key(5))
    tree_close(single[0].params, mstates[0].params)
    tree_close(single[1].params, mstates[1].params)
    tree_close(single[0].batch_stats, mstates[0].batch_stats)
    tree_close(single[1].batch_stats, mstates[1].batch_stats)
    np.testing.assert_allclose(
        np.stack([np.asarray(m[0]) for m in ms]),
        np.asarray(mrest[0]), **TOL)


def test_wgan_multistep_equivalence(mesh_ctx, images):
    from xgan.models import wgan
    from xgan.train.wgan import make_wgan_step
    g_model = wgan.Generator(latent_dim=16, feature_maps=8, image_size=32)
    c_model = wgan.Critic(feature_maps=8, image_size=32)
    g_tx, c_tx = adam(2e-4, 0.5, 0.9), adam(2e-4, 0.5, 0.9)
    key = jax.random.key(0)
    g0 = create_state(g_model, g_tx, key, jnp.zeros((2, 16)), train=False)
    c0 = create_state(c_model, c_tx, key, jnp.zeros((2, 32, 32, 3)),
                      train=False)
    kwargs = dict(latent_dim=16, critic_iters=2, lambda_gp=10.0,
                  batch_sharding=mesh_ctx.batch_sharding(4), donate=False)
    step = make_wgan_step(g_model, c_model, g_tx, c_tx, **kwargs)
    multi = make_wgan_step(g_model, c_model, g_tx, c_tx,
                           steps_per_call=2, **kwargs)
    idx_rows = jnp.asarray(np.random.default_rng(2)
                           .integers(0, 64, (2, 8), np.int64)
                           .astype(np.int32))
    single, ms, mstates, mrest = run_pair(
        step, multi, [g0, c0], (images,), idx_rows, jax.random.key(9))
    tree_close(single[0].params, mstates[0].params)
    tree_close(single[1].params, mstates[1].params)
    # d_losses: singles are (critic_iters,), multi is (K, critic_iters)
    np.testing.assert_allclose(
        np.stack([np.asarray(m[0]) for m in ms]),
        np.asarray(mrest[0]), **TOL)
    # g_loss: singles are scalars, multi is (K,)
    np.testing.assert_allclose(
        np.asarray([float(m[1]) for m in ms]),
        np.asarray(mrest[1]), **TOL)


def test_cgan_multistep_equivalence(mesh_ctx, images):
    from xgan.models import cgan
    from xgan.models.vgg import VGG16Features
    from xgan.train.cgan import make_cgan_step
    g_model = cgan.Generator(latent_dim=8, feature_maps=8, image_size=32)
    d_model = cgan.Discriminator(feature_maps=8, image_size=32)
    vgg_model = VGG16Features()
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    key = jax.random.key(0)
    lab = jnp.zeros((2,), jnp.int32)
    g0 = create_state(g_model, g_tx, key, jnp.zeros((2, 8)), lab,
                      train=False)
    d0 = create_state(d_model, d_tx, key, jnp.zeros((2, 32, 32, 3)), lab,
                      train=False)
    vgg_params = vgg_model.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
    kwargs = dict(latent_dim=8,
                  batch_sharding=mesh_ctx.batch_sharding(4), donate=False)
    step = make_cgan_step(g_model, d_model, vgg_model, g_tx, d_tx, **kwargs)
    multi = make_cgan_step(g_model, d_model, vgg_model, g_tx, d_tx,
                           steps_per_call=2, **kwargs)
    labels_all = jnp.asarray((np.arange(64) % 2).astype(np.int32))
    idx_rows = jnp.asarray(np.random.default_rng(3)
                           .integers(0, 64, (2, 8), np.int64)
                           .astype(np.int32))
    single, ms, mstates, mrest = run_pair(
        step, multi, [g0, d0], (vgg_params, images, labels_all), idx_rows,
        jax.random.key(11), n_extra=(jnp.int32(0),))
    # The CGAN step's perceptual-loss sum (~1e2 in f32) leaves last-bit
    # compile-order noise that Adam's early updates amplify to ~lr per
    # element (update ~= lr*sign(g) where |g| is tiny), so params can
    # drift by a few lr quanta (2e-4) per step between the scan and
    # unrolled compilations. Step-1 metrics match to ~1e-5 (verified);
    # bound the param drift by a small multiple of lr instead.
    cg_tol = dict(rtol=1e-3, atol=1e-3)
    for a, b in ((single[0].params, mstates[0].params),
                 (single[1].params, mstates[1].params)):
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       **cg_tol)
    np.testing.assert_allclose(
        np.stack([np.asarray(m[0]) for m in ms]),
        np.asarray(mrest[0]), rtol=1e-3, atol=1e-3)


def test_gan_loop_steps_per_call_matches_single(fake_dataset, tmp_path):
    """End-to-end: train_dcgan with --steps-per-call 2 produces the same
    history as the K=1 run (identical PRNG stream, chunked dispatch)."""
    from xgan.train.gan_loop import train_dcgan

    def args(sub, k):
        return argparse.Namespace(
            data_dir=fake_dataset["data_dir"],
            model_dir=str(tmp_path / sub / "models"),
            output_dir=str(tmp_path / sub / "results"),
            results_dir=str(tmp_path / sub / "results/metrics"),
            figures_dir=str(tmp_path / sub / "results/figures"),
            num_channels=3, latent_dim=16, feature_maps_g=8,
            feature_maps_d=8, epochs=1, batch_size=8, lr=2e-4, beta1=0.5,
            workers=0, vis_batch_size=8, save_interval=500,
            checkpoint_interval=10, image_size=32, seed=0,
            compute_dtype="f32", cache_dir=str(tmp_path / sub / "cache"),
            limit_batches=3, trace_dir="", cpu=True, steps_per_call=k)

    h1 = train_dcgan(args("k1", 1))
    h2 = train_dcgan(args("k2", 2))  # 3 batches: one chunk of 2 + tail of 1
    assert list(h1.keys()) == list(h2.keys())
    for key in h1:
        np.testing.assert_allclose(np.asarray(h1[key]),
                                   np.asarray(h2[key]), **TOL)


def test_wgan_cgan_loops_run_with_steps_per_call(fake_dataset, tmp_path):
    """The chunked dispatch path of the WGAN/CGAN epoch loops: history
    lengths/schemas must be identical to the K=1 shape (flattening of
    the (K, critic_iters) / (K, 7) stacked outputs)."""
    from xgan.train.cgan_loop import train_cgan
    from xgan.train.wgan_loop import train_wgan

    common = dict(
        data_dir=fake_dataset["data_dir"],
        num_channels=3, latent_dim=8, epochs=1, batch_size=8, lr=2e-4,
        beta1=0.5, workers=0, vis_batch_size=8, save_interval=500,
        checkpoint_interval=10, image_size=32, seed=0, compute_dtype="f32",
        limit_batches=3, trace_dir="", cpu=True, steps_per_call=2)

    wargs = argparse.Namespace(
        model_dir=str(tmp_path / "w/m"), output_dir=str(tmp_path / "w/r"),
        results_dir=str(tmp_path / "w/r/metrics"),
        figures_dir=str(tmp_path / "w/r/figures"),
        cache_dir=str(tmp_path / "w/cache"),
        feature_maps_g=4, feature_maps_d=4, critic_iters=2, lambda_gp=10.0,
        **common)
    wh = train_wgan(wargs)
    assert len(wh["D_losses"]) == 6   # 3 batches x 2 critic iters
    assert len(wh["G_losses"]) == 3
    assert len(wh["D_losses_epoch"]) == 1

    cargs = argparse.Namespace(
        model_dir=str(tmp_path / "c/m"), output_dir=str(tmp_path / "c/r"),
        results_dir=str(tmp_path / "c/r/metrics"),
        figures_dir=str(tmp_path / "c/r/figures"),
        cache_dir=str(tmp_path / "c/cache"),
        feature_maps_g=8, feature_maps_d=8, vgg_path="", **common)
    ch = train_cgan(cargs)
    assert len(ch["G_losses_iter"]) == 3
    assert len(ch["perceptual_losses"]) == 1


def test_grid_iters_cadence():
    """Sample-sheet cadence (loop_common.grid_iters): every
    save_interval-th iteration plus the final iteration of the final
    epoch, across chunk boundaries."""
    from xgan.train.loop_common import grid_iters
    # chunk of 4 covering iters 498..501 with save_interval 500
    assert grid_iters(498, 4, 500, False, 0, 10) == [500]
    # K=1 behaves like the reference condition
    assert grid_iters(500, 1, 500, False, 3, 10) == [500]
    assert grid_iters(501, 1, 500, False, 4, 10) == []
    # final iteration of the final epoch fires even off-cadence:
    # chunk [6,7] at batch positions i=6..7 of 8 -> t=7 is the last
    assert grid_iters(6, 2, 500, True, 6, 8) == [7]
    # both conditions in one chunk
    assert grid_iters(499, 2, 500, True, 6, 8) == [500]


def test_epoch_progress_clears_line_on_exception(monkeypatch, capsys):
    """EpochProgress (loop_common): TTY-only in-epoch progress must clear
    its \r line via __exit__ even when the epoch body raises, so
    tracebacks never print onto the partial progress line."""
    import io
    import sys as _sys

    from xgan.train.loop_common import EpochProgress

    class Tty(io.StringIO):
        def isatty(self):
            return True

    out = Tty()
    monkeypatch.setattr(_sys, "stdout", out)
    with pytest.raises(RuntimeError):
        with EpochProgress("Train Epoch 3", 10) as progress:
            progress.update(4)
            raise RuntimeError("dispatch failed")
    text = out.getvalue()
    assert "Train Epoch 3: 4/10" in text
    assert text.endswith("\r\x1b[2K")  # line cleared despite the raise

    # non-TTY: fully silent (driver/pipe logs stay clean)
    quiet = io.StringIO()
    monkeypatch.setattr(_sys, "stdout", quiet)
    with EpochProgress("Epoch 1/2", 5) as progress:
        progress.update(5)
    assert quiet.getvalue() == ""


def test_epoch_progress_live_postfix(monkeypatch):
    """EpochProgress live-loss postfix (reference tqdm postfix parity,
    train_gan.py:162-163) must be opportunistic: it renders metrics that
    are already materialized (is_ready) and NEVER touches values still in
    flight, so no update can block on the device."""
    import io
    import sys as _sys
    import time as _time

    from xgan.train.loop_common import EpochProgress, gan_live_postfix

    class Tty(io.StringIO):
        def isatty(self):
            return True

    class NeverReady:
        def is_ready(self):
            return False

        def __array__(self, *a, **k):  # pragma: no cover - must not run
            raise AssertionError("fetched an in-flight result")

    out = Tty()
    monkeypatch.setattr(_sys, "stdout", out)
    with EpochProgress("Epoch 1/1", 10,
                       postfix_fn=gan_live_postfix) as progress:
        # in-flight metrics: progress line renders WITHOUT a postfix
        progress.update(1, NeverReady())
        assert "Loss_D" not in out.getvalue()
        # ready metrics (CPU jnp arrays are ready once computed):
        # single-step (5,) layout
        progress._last_write = 0.0  # bypass the 10 Hz redraw throttle
        progress.update(2, jnp.asarray([1.5, 0.25, 0.9, 0.1, 0.2]))
        assert "Loss_D: 0.2500" in out.getvalue()
        assert "Loss_G: 1.5000" in out.getvalue()
        assert "D(x): 0.9000" in out.getvalue()
        # chunked (K, 5) layout: the LAST step's row is shown
        progress._last_write = 0.0
        progress.update(4, jnp.asarray([[1.0, 2.0, 3.0, 0.0, 0.0],
                                        [4.0, 0.125, 0.5, 0.0, 0.0]]))
        assert "Loss_D: 0.1250" in out.getvalue()


def test_epoch_progress_postfix_error_isolated(monkeypatch):
    """A formatter surprise (unexpected metric layout) must disable the
    postfix, not kill the epoch loop — the display is cosmetic."""
    import io
    import sys as _sys

    from xgan.train.loop_common import EpochProgress

    class Tty(io.StringIO):
        def isatty(self):
            return True

    def bad_postfix(m):
        raise ValueError("layout surprise")

    out = Tty()
    monkeypatch.setattr(_sys, "stdout", out)
    with EpochProgress("Epoch 1/1", 4, postfix_fn=bad_postfix) as progress:
        progress.update(1, jnp.asarray([1.0]))  # raises inside -> disabled
        assert progress.postfix_fn is None
        progress._last_write = 0.0
        progress.update(2, jnp.asarray([1.0]))  # no further attempts
    assert "Epoch 1/1: 2/4" in out.getvalue()


def test_epoch_progress_redraw_throttle(monkeypatch):
    """Redraws are throttled to ~10 Hz so a dispatch-bound 64px loop
    (tens of kHz enqueue rate) isn't slowed by terminal IO; the final
    update always renders."""
    import io
    import sys as _sys

    from xgan.train.loop_common import EpochProgress

    class Tty(io.StringIO):
        def isatty(self):
            return True

    out = Tty()
    monkeypatch.setattr(_sys, "stdout", out)
    with EpochProgress("Epoch 1/1", 10) as progress:
        progress.update(1)          # first write always lands
        progress.update(2)          # within 100 ms and i < total: skipped
        progress.update(10)         # final update: always rendered
    text = out.getvalue()
    assert "1/10" in text
    assert "2/10" not in text
    assert "10/10" in text


def test_wgan_and_loss_postfix_layouts():
    from xgan.train.loop_common import loss_live_postfix, wgan_live_postfix

    assert wgan_live_postfix(np.asarray([1.0, 2.0, 3.5])) == "Loss_D: 3.5000"
    assert wgan_live_postfix(
        np.asarray([[1.0, 2.0], [3.0, 4.25]])) == "Loss_D: 4.2500"
    assert loss_live_postfix(np.asarray([1.0, 3.0])) == "loss: 2.0000"

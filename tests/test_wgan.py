"""WGAN-GP tests: analytic gradient-penalty golden, step behavior,
end-to-end smoke."""
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.train.wgan import gradient_penalty


def test_gradient_penalty_linear_golden():
    """For a linear critic D(x) = <w, x>, grad_x D = w everywhere, so
    GP = λ(‖w‖₂ − 1)² exactly, independent of real/fake/α."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))

    def critic(x):
        return jnp.sum(x * w, axis=(1, 2, 3)), None

    real = jnp.asarray(rng.normal(size=(8, 4, 4, 3)).astype(np.float32))
    fake = jnp.asarray(rng.normal(size=(8, 4, 4, 3)).astype(np.float32))
    gp, _ = gradient_penalty(critic, real, fake, jax.random.key(1),
                             lambda_gp=10.0)
    wnorm = float(jnp.sqrt(jnp.sum(jnp.square(w))))
    expected = 10.0 * (wnorm - 1.0) ** 2
    np.testing.assert_allclose(float(gp), expected, rtol=1e-4)


def test_gradient_penalty_double_backward():
    """Outer grad of a GP-containing loss wrt the critic parameter must be
    nonzero and match the analytic d/dw [λ(‖w‖−1)²] = 2λ(‖w‖−1)·w/‖w‖."""
    w0 = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 2, 2, 1)).astype(np.float32))
    real = jnp.zeros((4, 2, 2, 1))
    fake = jnp.ones((4, 2, 2, 1))

    def loss_fn(w):
        def critic(x):
            return jnp.sum(x * w, axis=(1, 2, 3)), None
        gp, _ = gradient_penalty(critic, real, fake, jax.random.key(0),
                                 lambda_gp=10.0)
        return gp

    g = jax.grad(loss_fn)(w0)
    wnorm = float(jnp.sqrt(jnp.sum(jnp.square(w0))))
    expected = 2 * 10.0 * (wnorm - 1.0) * np.asarray(w0) / wnorm
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-3)


def test_wgan_step_runs():
    from xgan.models import wgan
    from xgan.parallel import create_mesh
    from xgan.train.common import adam, create_state
    from xgan.train.wgan import make_wgan_step

    mesh_ctx = create_mesh()
    g_model = wgan.Generator(latent_dim=8, feature_maps=4, image_size=32)
    c_model = wgan.Critic(feature_maps=4, image_size=32)
    g_tx, c_tx = adam(2e-4, 0.5, 0.9), adam(2e-4, 0.5, 0.9)
    k = jax.random.key(0)
    g_state = create_state(g_model, g_tx, k, jnp.zeros((2, 8)), train=False)
    c_state = create_state(c_model, c_tx, k, jnp.zeros((2, 32, 32, 3)),
                           train=False)
    step = make_wgan_step(g_model, c_model, g_tx, c_tx, latent_dim=8,
                          critic_iters=3, lambda_gp=10.0,
                          batch_sharding=mesh_ctx.batch_sharding(4),
                          donate=False)
    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (32, 32, 32, 3), np.uint8))
    idx = jnp.arange(16, dtype=jnp.int32)
    g2, c2, d_losses, g_loss = step(g_state, c_state, images, idx,
                                    jax.random.key(2))
    assert d_losses.shape == (3,)
    assert np.all(np.isfinite(np.asarray(d_losses)))
    assert np.isfinite(float(g_loss))

    def delta(a, b):
        return max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))
    assert delta(g2.params, g_state.params) > 0
    assert delta(c2.params, c_state.params) > 0


def test_train_wgan_end_to_end(fake_dataset, tmp_path):
    from xgan.train.wgan_loop import train_wgan
    args = argparse.Namespace(
        data_dir=fake_dataset["data_dir"], model_dir=str(tmp_path / "m"),
        output_dir=str(tmp_path / "r"),
        results_dir=str(tmp_path / "r/metrics"),
        figures_dir=str(tmp_path / "r/figures"),
        num_channels=3, latent_dim=8, feature_maps_g=4, feature_maps_d=4,
        epochs=1, batch_size=8, lr=2e-4, beta1=0.5, workers=0,
        vis_batch_size=8, save_interval=500, checkpoint_interval=10,
        critic_iters=2, lambda_gp=10.0, image_size=32, seed=0,
        compute_dtype="f32", cache_dir=str(tmp_path / "cache"),
        limit_batches=2, trace_dir="", cpu=True)
    history = train_wgan(args)
    # reference wgan history schema (train_wggan.py:57)
    assert list(history.keys()) == ["D_losses", "G_losses",
                                    "D_losses_epoch", "G_losses_epoch"]
    assert len(history["D_losses"]) == 4   # 2 batches x 2 critic iters
    assert len(history["G_losses"]) == 2
    assert (tmp_path / "m/wgan/generator_final.msgpack").exists()
    assert (tmp_path / "r/metrics/wgan_training_history.json").exists()
    assert (tmp_path / "r/figures/wgan_loss_curve.png").exists()

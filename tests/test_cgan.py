"""CGAN training tests: adaptive-D gate, perceptual/FM plumbing,
end-to-end smoke."""
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.models import cgan
from xgan.models.vgg import VGG16Features
from xgan.parallel import create_mesh
from xgan.train.cgan import feature_matching_loss, make_cgan_step
from xgan.train.common import adam, create_state


@pytest.fixture(scope="module")
def cgan_setup():
    mesh_ctx = create_mesh()
    g_model = cgan.Generator(latent_dim=8, feature_maps=8, image_size=32)
    d_model = cgan.Discriminator(feature_maps=8, image_size=32)
    vgg_model = VGG16Features()
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    k = jax.random.key(0)
    labels = jnp.zeros((2,), jnp.int32)
    g_state = create_state(g_model, g_tx, k, jnp.zeros((2, 8)), labels,
                           train=False)
    d_state = create_state(d_model, d_tx, k, jnp.zeros((2, 32, 32, 3)),
                           labels, train=False)
    vgg_params = vgg_model.init(k, jnp.zeros((1, 32, 32, 3)))["params"]
    step = make_cgan_step(g_model, d_model, vgg_model, g_tx, d_tx,
                          latent_dim=8,
                          batch_sharding=mesh_ctx.batch_sharding(4),
                          donate=False)
    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (32, 32, 32, 3), np.uint8))
    labels_all = jnp.asarray((np.arange(32) % 2).astype(np.int32))
    return step, g_state, d_state, vgg_params, images, labels_all


def test_cgan_step_runs(cgan_setup):
    step, g_state, d_state, vgg_params, images, labels_all = cgan_setup
    idx = jnp.arange(16, dtype=jnp.int32)
    g2, d2, metrics = step(g_state, d_state, vgg_params, images,
                           labels_all, idx, jnp.int32(0), jax.random.key(1))
    m = np.asarray(metrics)
    assert m.shape == (7,)
    assert np.all(np.isfinite(m))
    assert m[5] >= 0 and m[6] >= 0  # perceptual / fm losses nonneg

    def delta(a, b):
        return max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))
    assert delta(g2.params, g_state.params) > 0


def test_adaptive_gate_epoch_dependency(cgan_setup):
    """At epoch < 5 the gate is open regardless of D confidence; the same
    inputs at a late epoch with a confident D can skip the D update."""
    step, g_state, d_state, vgg_params, images, labels_all = cgan_setup
    idx = jnp.arange(16, dtype=jnp.int32)
    # epoch 0: gate forced open -> D params must move
    _, d_open, _ = step(g_state, d_state, vgg_params, images, labels_all,
                        idx, jnp.int32(0), jax.random.key(3))

    def delta(a, b):
        return max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))
    assert delta(d_open.params, d_state.params) > 0
    # At init D(x) ~ 0.5 < 0.8, so the gate is open at any epoch; verify the
    # late-epoch call still executes (gate correctness is the cond above).
    _, d_late, m = step(g_state, d_state, vgg_params, images, labels_all,
                        idx, jnp.int32(10), jax.random.key(3))
    assert np.isfinite(np.asarray(m)).all()


def test_adaptive_gate_closes_when_d_confident():
    """The lax.cond's CLOSED branch, deterministically.

    Reaching D(x) >= 0.8 AND D(G(z)) <= 0.2 through real training
    dynamics is not robustly possible at this test scale: every BN batch
    is pure-real or pure-fake, so per-batch normalization erases any
    constant real/fake cue and the tiny critic plateaus d_g_z1 just
    above the threshold (razor-thin, flaky margins). Instead the REAL
    step factory gets a test-double discriminator that adds an
    input-magnitude cue directly to the logits — constant-255 reals
    normalize to ~|2.2| while tanh fakes stay within |1|, so
    offset = 20*mean(relu(|x|-1.5)) - 5 yields D(x) ~ 1 and
    D(G(z)) < 0.1 with margins >> float noise. Everything else (the
    gate cond, grads, optimizer wiring) is the production step."""
    import flax.linen as nn

    class GatedProbe(nn.Module):
        base: nn.Module

        @nn.compact
        def __call__(self, x, labels, *, train, features=False, mask=None):
            out = self.base(x, labels, train=train, features=features,
                            mask=mask)
            cue = 20.0 * jnp.mean(
                nn.relu(jnp.abs(x.astype(jnp.float32)) - 1.5),
                axis=(1, 2, 3)) - 5.0
            if features:
                return out[0] + cue, out[1]
            return out + cue

    g_model = cgan.Generator(latent_dim=8, feature_maps=8, image_size=32)
    d_model = GatedProbe(cgan.Discriminator(feature_maps=8, image_size=32))
    vgg_model = VGG16Features()
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    k = jax.random.key(1)
    labels = jnp.zeros((2,), jnp.int32)
    g_state = create_state(g_model, g_tx, k, jnp.zeros((2, 8)), labels,
                           train=False)
    d_state = create_state(d_model, d_tx, k, jnp.zeros((2, 32, 32, 3)),
                           labels, train=False)
    vgg_params = vgg_model.init(k, jnp.zeros((1, 32, 32, 3)))["params"]
    step = make_cgan_step(g_model, d_model, vgg_model, g_tx, d_tx,
                          latent_dim=8, donate=False)
    images = jnp.full((16, 32, 32, 3), 255, jnp.uint8)
    labels_all = jnp.asarray((np.arange(16) % 2).astype(np.int32))
    idx = jnp.arange(8, dtype=jnp.int32)

    # Late epoch: the step's own metrics close the gate -> D params and
    # optimizer state bitwise untouched, BN running stats still advance
    # (the reference skips only errD.backward()+optimizerD.step(),
    # train_cgan.py:176-178).
    _, d_closed, m = step(g_state, d_state, vgg_params, images,
                          labels_all, idx, jnp.int32(10),
                          jax.random.key(99))
    m = np.asarray(m)
    assert m[2] > 0.9 and m[3] < 0.1, m  # cue gives huge gate margins
    for a, b in zip(jax.tree_util.tree_leaves(d_closed.params),
                    jax.tree_util.tree_leaves(d_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(d_closed.opt_state),
                    jax.tree_util.tree_leaves(d_state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    stats_moved = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(
        jax.tree_util.tree_leaves(d_closed.batch_stats),
        jax.tree_util.tree_leaves(d_state.batch_stats)))
    assert stats_moved > 0  # BN running stats advance even when gated

    # Same inputs at epoch 0: gate forced open -> D params DO move.
    _, d_open, _ = step(g_state, d_state, vgg_params, images, labels_all,
                        idx, jnp.int32(0), jax.random.key(99))
    params_moved = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(
        jax.tree_util.tree_leaves(d_open.params),
        jax.tree_util.tree_leaves(d_state.params)))
    assert params_moved > 0


def test_feature_matching_loss_zero_for_identical():
    feats = [jnp.ones((2, 4, 4, 3)), jnp.zeros((2, 2, 2, 6))]
    assert float(feature_matching_loss(feats, feats)) == 0.0
    fake = [f + 1.0 for f in feats]
    assert float(feature_matching_loss(feats, fake)) == pytest.approx(2.0)


def test_train_cgan_end_to_end(fake_dataset, tmp_path):
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
        cpu=True)
    history = train_cgan(args)
    # CGAN schema = DCGAN schema + perceptual/fm (train_cgan.py:127-128)
    assert "perceptual_losses" in history
    assert "feature_matching_losses" in history
    assert len(history["G_losses_epoch"]) == 1
    assert (tmp_path / "m/cgan/generator_final.msgpack").exists()
    assert (tmp_path / "r/metrics/cgan_training_history.json").exists()
    assert (tmp_path / "r/figures/cgan_loss_curve.png").exists()

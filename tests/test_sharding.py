"""Data-parallel correctness: the fused DCGAN step must produce identical
numbers on a 1-device and an 8-device mesh.

This is the load-bearing property of the DP design (README "sync-BN for
free"): batch statistics, losses and gradients are global reductions
under jit, so sharding the batch over more chips must not change the
math — only the wall-clock.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.models import dcgan
from xgan.parallel import create_mesh
from xgan.train.common import adam, create_state
from xgan.train.gan import make_dcgan_step


def _run(mesh_ctx, steps=3):
    g_model = dcgan.Generator(latent_dim=8, feature_maps=8, image_size=32)
    d_model = dcgan.Discriminator(feature_maps=8, image_size=32)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    k = jax.random.key(0)
    g_state = mesh_ctx.replicate(create_state(
        g_model, g_tx, k, jnp.zeros((2, 8)), train=False))
    d_state = mesh_ctx.replicate(create_state(
        d_model, d_tx, k, jnp.zeros((2, 32, 32, 3)), train=False))
    step = make_dcgan_step(g_model, d_model, g_tx, d_tx, latent_dim=8,
                           batch_sharding=mesh_ctx.batch_sharding(4),
                           donate=False)
    images = mesh_ctx.replicate(jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (64, 32, 32, 3),
                                          np.uint8)))
    out = []
    for i in range(steps):
        idx = jnp.asarray((np.arange(16) + 16 * i) % 64, dtype=jnp.int32)
        g_state, d_state, metrics = step(g_state, d_state, images, idx,
                                         jax.random.key(100 + i))
        out.append(np.asarray(jax.device_get(metrics)))
    return np.stack(out), jax.device_get(g_state.params)


def test_dp8_matches_single_device():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    m1, p1 = _run(create_mesh(devices=devs[:1]))
    m8, p8 = _run(create_mesh(devices=devs[:8]))
    np.testing.assert_allclose(m1, m8, rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)

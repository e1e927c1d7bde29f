"""Model shape/dtype/init contracts (flax re-expressions of the reference
smoke tests in dcgan.py:92-121, cgan.py:118-136, classifier.py:35-61)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.models import cgan, dcgan, wgan
from xgan.models.resnet import ResNet50


def _init(model, *args, **kwargs):
    variables = model.init(jax.random.key(0), *args, **kwargs)
    return variables


@pytest.mark.parametrize("size", [64, 224])
def test_dcgan_shapes(size):
    g = dcgan.Generator(latent_dim=100, feature_maps=8, image_size=size)
    d = dcgan.Discriminator(feature_maps=8, image_size=size)
    z = jnp.zeros((2, 100))
    gv = _init(g, z, train=False)
    img = g.apply(gv, z, train=False)
    assert img.shape == (2, size, size, 3)
    assert float(jnp.max(jnp.abs(img))) <= 1.0

    dv = _init(d, img, train=False)
    logits = d.apply(dv, img, train=False)
    assert logits.shape == (2,)


def test_dcgan_init_distribution():
    g = dcgan.Generator(latent_dim=16, feature_maps=64, image_size=64)
    gv = _init(g, jnp.zeros((1, 16)), train=False)
    # N(0, 0.02) conv init (reference dcgan.py:6-12)
    leaves = [np.asarray(x) for p, x in
              jax.tree_util.tree_leaves_with_path(gv["params"])
              if "kernel" in str(p)]
    big = max(leaves, key=lambda a: a.size)
    assert abs(big.std() - 0.02) < 0.002
    assert abs(big.mean()) < 0.002


def test_dcgan_bn_stats_update():
    g = dcgan.Generator(latent_dim=8, feature_maps=8, image_size=64)
    z = jax.random.normal(jax.random.key(1), (4, 8))
    gv = _init(g, z, train=False)
    _, updates = g.apply(gv, z, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(gv["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_wgan_shapes():
    g = wgan.Generator(latent_dim=100, feature_maps=4, image_size=64)
    c = wgan.Critic(feature_maps=4, image_size=64)
    z = jnp.zeros((2, 100))
    gv = _init(g, z, train=False)
    img = g.apply(gv, z, train=False)
    assert img.shape == (2, 64, 64, 3)
    cv = _init(c, img, train=False)
    score = c.apply(cv, img, train=False)
    assert score.shape == (2,)


def test_cgan_shapes_and_features():
    g = cgan.Generator(latent_dim=32, feature_maps=8, image_size=64)
    d = cgan.Discriminator(feature_maps=8, image_size=64)
    z = jnp.zeros((4, 32))
    labels = jnp.array([0, 1, 0, 1])
    gv = _init(g, z, labels, train=False)
    img = g.apply(gv, z, labels, train=False)
    assert img.shape == (4, 64, 64, 3)

    dv = _init(d, img, labels, train=False)
    logits = d.apply(dv, img, labels, train=False)
    assert logits.shape == (4,)

    logits_f, feats = d.apply(dv, img, labels, train=False, features=True)
    # 14 tracked activations: 5 convs + 4 BNs + 5 LeakyReLUs
    # (reference cgan.py:108-113 iterates main[:-1])
    assert len(feats) == 14
    assert feats[-1].shape == (4, 2, 2, 64)  # S0=2 at 64px, nf*8=64
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits),
                               rtol=1e-5, atol=1e-5)


def test_resnet50_shapes():
    m = ResNet50(num_classes=2)
    x = jnp.zeros((2, 64, 64, 3))
    v = _init(m, x, train=False)
    logits = m.apply(v, x, train=False)
    assert logits.shape == (2, 2)
    logits2, feats = m.apply(v, x, train=False, return_features=True)
    assert feats.shape == (2, 2, 2, 2048)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2))


def test_resnet50_param_count_matches_torchvision():
    m = ResNet50(num_classes=2)
    v = _init(m, jnp.zeros((1, 64, 64, 3)), train=False)
    n = sum(np.asarray(p).size for p in jax.tree_util.tree_leaves(v["params"]))
    # torchvision resnet50 has 25,557,032 params with a 1000-way fc;
    # swapping fc for 2 classes: 25,557,032 - 2049*1000 + 2049*2
    assert n == 25_557_032 - 2049 * 1000 + 2049 * 2

"""Generator checkpoint interop with reference .pth state dicts.

Round-trips (VERDICT r2 next #4): our params -> torch state dict -> torch
replica of the reference generator forwards identically; a fabricated
torch checkpoint -> our loader -> our flax generator forwards identically.
Torch replicas follow reference src/dcgan.py:26-47 / wggan.py:18-41 /
cgan.py:22-51 exactly (module indices = the state-dict key contract).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from xgan.models import cgan, dcgan, wgan  # noqa: E402
from xgan.models.pretrained import (  # noqa: E402
    load_torch_cgan_generator, load_torch_gan_generator,
    save_torch_cgan_generator, save_torch_gan_generator)

SIZE = 32
LATENT = 8


class _RefDCGANGenerator(tnn.Module):
    """Reference dcgan.py:14-52 / wggan.py:15-46 ladder (width-agnostic)."""

    def __init__(self, latent, widths, channels, s0):
        super().__init__()
        layers = [tnn.ConvTranspose2d(latent, widths[0], s0, 1, 0,
                                      bias=False),
                  tnn.BatchNorm2d(widths[0]), tnn.ReLU(True)]
        for cin, cout in zip(widths[:-1], widths[1:]):
            layers += [tnn.ConvTranspose2d(cin, cout, 4, 2, 1, bias=False),
                       tnn.BatchNorm2d(cout), tnn.ReLU(True)]
        layers += [tnn.ConvTranspose2d(widths[-1], channels, 4, 2, 1,
                                       bias=False), tnn.Tanh()]
        self.main = tnn.Sequential(*layers)

    def forward(self, z):
        return self.main(z)


class _RefCGANGenerator(tnn.Module):
    """Reference cgan.py:14-60 (init_size generalized 7 -> s0)."""

    def __init__(self, latent, num_classes, channels, nf, s0):
        super().__init__()
        self.s0 = s0
        self.label_emb = tnn.Embedding(num_classes, latent)
        self.fc = tnn.Linear(latent, nf * 8 * s0 * s0)
        layers = [tnn.BatchNorm2d(nf * 8), tnn.ReLU(True)]
        widths = [nf * 8, nf * 4, nf * 2, nf, nf // 2]
        for cin, cout in zip(widths[:-1], widths[1:]):
            layers += [tnn.Upsample(scale_factor=2),
                       tnn.Conv2d(cin, cout, 3, 1, 1),
                       tnn.BatchNorm2d(cout), tnn.ReLU(True)]
        layers += [tnn.Upsample(scale_factor=2),
                   tnn.Conv2d(widths[-1], channels, 3, 1, 1), tnn.Tanh()]
        self.main = tnn.Sequential(*layers)

    def forward(self, z, labels):
        x = self.fc(z + self.label_emb(labels))
        x = x.view(x.size(0), -1, self.s0, self.s0)
        return self.main(x)


def _randomize_bn_stats(variables, seed):
    """Give running stats non-default values so the round-trip actually
    exercises them (fresh init would pass trivially with mean=0/var=1)."""
    rng = np.random.default_rng(seed)
    stats = jax.tree.map(
        lambda x: jnp.asarray(
            np.abs(rng.normal(0.5, 0.2, np.shape(x))).astype(np.float32)),
        variables["batch_stats"])
    return {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize("kind", ["dcgan", "wgan"])
def test_ladder_generator_pth_roundtrip(kind, tmp_path):
    fm = 8
    model = (dcgan.Generator(latent_dim=LATENT, feature_maps=fm,
                             image_size=SIZE) if kind == "dcgan"
             else wgan.Generator(latent_dim=LATENT, feature_maps=fm,
                                 image_size=SIZE))
    variables = _randomize_bn_stats(
        model.init(jax.random.key(0), jnp.zeros((2, LATENT)), train=False),
        seed=1)

    path = str(tmp_path / "generator_final.pth")
    save_torch_gan_generator(path, variables["params"],
                             variables["batch_stats"])

    # The reference sampler loads this file into its torch Generator
    # (generate_synthetic.py:23-32); replicate that and compare forwards.
    widths = ([fm * 8, fm * 4, fm * 2, fm, fm // 2] if kind == "dcgan"
              else [fm * 16, fm * 8, fm * 4, fm * 2, fm])
    ref = _RefDCGANGenerator(LATENT, widths, 3, SIZE // 32)
    ref.load_state_dict(torch.load(path, map_location="cpu",
                                   weights_only=True))
    ref.eval()

    z = np.random.default_rng(2).normal(size=(4, LATENT)).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(z.reshape(4, LATENT, 1, 1))).numpy()
    out_j = np.asarray(model.apply(variables, jnp.asarray(z), train=False))
    np.testing.assert_allclose(np.transpose(out_t, (0, 2, 3, 1)), out_j,
                               atol=2e-5)

    # And back: our loader reads the same file to identical pytrees.
    params2, stats2 = load_torch_gan_generator(path)
    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(dict(params2))):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-6)
    for a, b in zip(jax.tree.leaves(variables["batch_stats"]),
                    jax.tree.leaves(dict(stats2))):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-6)


def test_cgan_generator_pth_roundtrip(tmp_path):
    # image_size 64 -> s0 = 2: the fc CHW<->HWC permutation is non-trivial
    # (at s0 = 1 it would be the identity and the test would prove nothing).
    nf, size = 8, 64
    model = cgan.Generator(latent_dim=LATENT, num_classes=2,
                           feature_maps=nf, image_size=size)
    variables = _randomize_bn_stats(
        model.init(jax.random.key(0), jnp.zeros((2, LATENT)),
                   jnp.zeros((2,), jnp.int32), train=False), seed=3)

    path = str(tmp_path / "generator_final.pth")
    save_torch_cgan_generator(path, variables["params"],
                              variables["batch_stats"])

    ref = _RefCGANGenerator(LATENT, 2, 3, nf, size // 32)
    ref.load_state_dict(torch.load(path, map_location="cpu",
                                   weights_only=True))
    ref.eval()

    rng = np.random.default_rng(4)
    z = rng.normal(size=(4, LATENT)).astype(np.float32)
    labels = np.array([0, 1, 1, 0], np.int64)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(z), torch.from_numpy(labels)).numpy()
    out_j = np.asarray(model.apply(variables, jnp.asarray(z),
                                   jnp.asarray(labels, jnp.int32),
                                   train=False))
    # The fc CHW<->HWC permutation is the risky part; atol covers conv
    # accumulation-order noise only.
    np.testing.assert_allclose(np.transpose(out_t, (0, 2, 3, 1)), out_j,
                               atol=2e-5)

    params2, stats2 = load_torch_cgan_generator(path)
    out_j2 = np.asarray(model.apply(
        {"params": params2, "batch_stats": stats2}, jnp.asarray(z),
        jnp.asarray(labels, jnp.int32), train=False))
    np.testing.assert_allclose(out_j, out_j2, atol=1e-6)


def test_sampler_accepts_torch_checkpoint(tmp_path):
    """A fabricated reference-layout .pth loads through the sampler's
    load_generator path (extension-detected) with forward parity."""
    from xgan.train.sample import load_generator

    fm = 8
    ref = _RefDCGANGenerator(LATENT, [fm * 8, fm * 4, fm * 2, fm, fm // 2],
                             3, SIZE // 32)
    path = str(tmp_path / "ref_generator.pth")
    torch.save(ref.state_dict(), path)

    model = dcgan.Generator(latent_dim=LATENT, feature_maps=fm,
                            image_size=SIZE)
    variables = load_generator(model, path, (jnp.zeros((2, LATENT)),),
                               torch_kind="dcgan")
    z = np.random.default_rng(5).normal(size=(4, LATENT)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        out_t = ref(torch.from_numpy(z.reshape(4, LATENT, 1, 1))).numpy()
    out_j = np.asarray(model.apply(variables, jnp.asarray(z), train=False))
    np.testing.assert_allclose(np.transpose(out_t, (0, 2, 3, 1)), out_j,
                               atol=2e-5)


def test_sampler_rejects_mismatched_torch_checkpoint(tmp_path):
    """Wrong --feature-maps-g against a .pth must exit with the clear
    flag-mismatch message, like the msgpack path."""
    from xgan.train.sample import load_generator

    fm = 8
    ref = _RefDCGANGenerator(LATENT, [fm * 8, fm * 4, fm * 2, fm, fm // 2],
                             3, SIZE // 32)
    path = str(tmp_path / "ref_generator.pth")
    torch.save(ref.state_dict(), path)

    model = dcgan.Generator(latent_dim=LATENT, feature_maps=fm * 2,
                            image_size=SIZE)
    with pytest.raises(SystemExit):
        load_generator(model, path, (jnp.zeros((2, LATENT)),),
                       torch_kind="dcgan")


def test_trainer_writes_pth_twin(fake_dataset, tmp_path):
    """train_dcgan leaves a generator_final.pth the reference sampler
    layout can load (the msgpack final's torch twin)."""
    from tests.test_gan_training import _gan_args
    from xgan.train.gan_loop import train_dcgan

    args = _gan_args(fake_dataset, tmp_path)
    train_dcgan(args)
    pth = tmp_path / "models/gan/generator_final.pth"
    assert pth.exists()
    ref = _RefDCGANGenerator(16, [64, 32, 16, 8, 4], 3, 1)
    ref.load_state_dict(torch.load(str(pth), map_location="cpu",
                                   weights_only=True))

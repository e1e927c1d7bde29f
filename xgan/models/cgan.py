"""Conditional GAN (flax.linen), TPU-native NHWC.

Architecture parity with reference src/cgan.py:14-116:

Generator (cgan.py:14-60)
    cond = Embedding(num_classes, latent)(label); x = z + cond   (:55-57)
    fc: Linear(latent -> nf*8*S0*S0)                             (:24)
    then BN+ReLU and 5 x [nearest-2x upsample, Conv3x3(s1,p1,bias)],
    BN+ReLU between, tanh head; channels nf*8->nf*4->nf*2->nf->nf//2->C.

Projection discriminator (cgan.py:62-113)
    conv trunk like DCGAN's but WITH biases; after the final LeakyReLU the
    (B,S0,S0,nf*8) feature map is flattened and dot-producted with
    Embedding(num_classes, nf*8*S0*S0)(label); logit = final 1x1-equivalent
    Conv(k=S0, valid) output + projection                        (:103-106).
    ``features=True`` returns the 14 intermediate activations (after every
    conv/BN/LeakyReLU before the final conv) for the feature-matching loss
    (get_intermediate_features, cgan.py:108-113).

Note: the reference's vestigial ``alpha`` progressive-growing argument is
computed but never affects the forward pass (SURVEY.md §7 quirks); it is
deliberately not reproduced.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from xgan.models.layers import (Conv, Dense, TorchBatchNorm, leaky_relu,
                                normal_init, upsample_nearest_2x)


class Generator(nn.Module):
    latent_dim: int = 100
    num_classes: int = 2
    num_channels: int = 3
    feature_maps: int = 32
    image_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, labels, *, train: bool, mask=None):
        """z: (B, latent); labels: (B,) int -> images (B, S, S, C).
        ``mask``: (B,) validity weights for tail-exact BN statistics."""
        assert self.image_size % 32 == 0
        s0 = self.image_size // 32
        nf = self.feature_maps

        emb = self.param("label_emb", normal_init(1.0),
                         (self.num_classes, self.latent_dim))
        # jnp.take, not emb[labels]: checkpoint-restored params can be
        # numpy arrays (flax from_bytes), and numpy indexing by a tracer
        # raises at trace time (hit by the jax.export symbolic-batch path)
        x = z + jnp.take(emb, labels, axis=0)
        x = Dense(nf * 8 * s0 * s0, dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], s0, s0, nf * 8)

        x = TorchBatchNorm()(x, train=train, mask=mask)
        x = nn.relu(x)
        widths = [nf * 4, nf * 2, nf, nf // 2]
        for w in widths:
            x = upsample_nearest_2x(x)
            x = Conv(w, kernel=3, stride=1, padding=1, use_bias=True,
                     torch_bias=True, dtype=self.dtype)(x)
            x = TorchBatchNorm()(x, train=train, mask=mask)
            x = nn.relu(x)
        x = upsample_nearest_2x(x)
        x = Conv(self.num_channels, kernel=3, stride=1, padding=1,
                 use_bias=True, torch_bias=True, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    num_classes: int = 2
    num_channels: int = 3
    feature_maps: int = 32
    image_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, labels, *, train: bool, features: bool = False,
                 mask=None):
        """x: (B, S, S, C), labels: (B,) int.

        Returns logits (B,), or ``(logits, feats)`` when ``features=True``
        where feats are the 14 intermediate activations used by the
        feature-matching loss. The reference computes features in a second
        trunk pass (get_intermediate_features, cgan.py:108-113); here one
        pass yields both — same values, one less forward (the only
        observable difference is one fewer BN running-stat update per
        batch, and CGAN's discriminator running stats are never consumed).

        Feature CONTENT quirk, preserved exactly: the reference's trunk
        uses ``LeakyReLU(0.2, inplace=True)`` (cgan.py:71-90) and appends
        each layer's output tensor as it goes (:96-99, :108-113) — the
        in-place activation then MUTATES the conv/BN tensor already in
        the list. The reference's effective feature list is therefore
        [lrelu0, lrelu0] + per block [conv_i, lrelu_i, lrelu_i]: the
        first conv's and every BN's entry alias the following LeakyReLU
        output (BN itself is out-of-place, so the block conv entries
        survive). Matching this is load-bearing for feature-matching-loss
        parity (tests/test_torch_trajectory.py measured a 1.7x fm
        difference against true pre-activations).
        """
        assert self.image_size % 32 == 0
        s0 = self.image_size // 32
        nf = self.feature_maps
        feats = []

        h = Conv(nf // 2, kernel=4, stride=2, padding=1, use_bias=True,
                 torch_bias=True, phase_grad=True, dtype=self.dtype)(x)
        h = leaky_relu(h)
        feats += [h, h]  # conv0's entry was mutated into lrelu0
        for w in [nf, nf * 2, nf * 4, nf * 8]:
            c = Conv(w, kernel=4, stride=2, padding=1, use_bias=True,
                     torch_bias=True, phase_grad=True, dtype=self.dtype)(h)
            h = TorchBatchNorm()(c, train=train, mask=mask)
            h = leaky_relu(h)
            feats += [c, h, h]  # BN's entry was mutated into lrelu_i

        # Projection: label embedding dotted with the flattened final
        # feature map (reference cgan.py:67,:103-106). The flatten order
        # differs from torch's CHW (we are HWC) — a fixed permutation of a
        # learned embedding, hence equivalent.
        flat = h.reshape(h.shape[0], -1).astype(jnp.float32)
        emb = self.param("label_emb", normal_init(1.0),
                         (self.num_classes, nf * 8 * s0 * s0))
        proj = jnp.sum(jnp.take(emb, labels, axis=0) * flat, axis=1)

        out = Conv(1, kernel=s0, stride=1, padding=0, use_bias=True,
                   torch_bias=True, dtype=self.dtype)(h)
        logits = out.astype(jnp.float32).reshape(out.shape[0]) + proj
        if features:
            return logits, feats
        return logits


# Reference aliases (cgan.py:115-116).
ProgressiveGenerator = Generator
ProgressiveDiscriminator = Discriminator

"""DCGAN generator/discriminator (flax.linen), TPU-native NHWC.

Architecture parity with reference src/dcgan.py:14-90:

Generator  z(latent) -> ConvT(k=S0,s1,p0) -> 5 x ConvT(k4,s2,p1) -> tanh
           channels fg*8 -> fg*4 -> fg*2 -> fg -> fg//2 -> C, BN+ReLU between
           (S0 = image_size // 32; reference is fixed 224 => S0 = 7)
Critic     C -> fd//2 -> fd -> fd*2 -> fd*4 -> fd*8 (k4,s2,p1, no bias,
           BN on all but the first, LeakyReLU 0.2) -> Conv(k=S0, valid) -> (B,)

Differences by design (not omissions):
- NHWC + bfloat16 compute for the MXU; parameters/statistics in fp32.
- The discriminator returns *logits*; the trainer applies
  sigmoid/BCE-with-logits which is numerically identical to the reference's
  Sigmoid + BCELoss (reference dcgan.py:85, train_gan.py:90) but stable.
- ``image_size`` is configurable (multiple of 32); 224 reproduces the
  reference exactly, 64 matches the BASELINE.json bench config.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from xgan.models.layers import (Conv, ConvTranspose, TorchBatchNorm,
                                leaky_relu)


class Generator(nn.Module):
    latent_dim: int = 100
    num_channels: int = 3
    feature_maps: int = 64
    image_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, *, train: bool, mask=None):
        """z: (B, latent_dim) -> images (B, S, S, C) in [-1, 1] (tanh).

        ``mask``: (B,) validity weights for exact short-tail-batch BN
        statistics (see xgan/ops/norm.py); outputs at masked rows are
        garbage by contract."""
        assert self.image_size % 32 == 0, "image_size must be a multiple of 32"
        s0 = self.image_size // 32
        fg = self.feature_maps
        x = z.reshape(z.shape[0], 1, 1, self.latent_dim)
        widths = [fg * 8, fg * 4, fg * 2, fg, fg // 2]

        x = ConvTranspose(widths[0], kernel=s0, stride=1, padding=0,
                          dtype=self.dtype)(x)
        x = TorchBatchNorm()(x, train=train, mask=mask)
        x = nn.relu(x)
        for w in widths[1:]:
            x = ConvTranspose(w, kernel=4, stride=2, padding=1,
                              dtype=self.dtype)(x)
            x = TorchBatchNorm()(x, train=train, mask=mask)
            x = nn.relu(x)
        x = ConvTranspose(self.num_channels, kernel=4, stride=2, padding=1,
                          dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    num_channels: int = 3
    feature_maps: int = 64
    image_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, mask=None):
        """x: (B, S, S, C) -> logits (B,). Apply sigmoid for D(x) probs.

        ``mask`` as in Generator: masked rows are excluded from BN batch
        statistics; their logits are garbage by contract."""
        assert self.image_size % 32 == 0
        s0 = self.image_size // 32
        fd = self.feature_maps
        widths = [fd // 2, fd, fd * 2, fd * 4, fd * 8]

        x = Conv(widths[0], kernel=4, stride=2, padding=1,
                 phase_grad=True, dtype=self.dtype)(x)
        x = leaky_relu(x)
        for w in widths[1:]:
            x = Conv(w, kernel=4, stride=2, padding=1, phase_grad=True,
                     dtype=self.dtype)(x)
            x = TorchBatchNorm()(x, train=train, mask=mask)
            x = leaky_relu(x)
        x = Conv(1, kernel=s0, stride=1, padding=0, dtype=self.dtype)(x)
        return x.astype(jnp.float32).reshape(x.shape[0])

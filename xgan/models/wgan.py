"""WGAN-GP generator/critic (flax.linen), TPU-native NHWC.

Architecture parity with reference src/wggan.py:15-70:

Generator  wider ladder starting at fg*16:
           z -> ConvT(k=S0,s1,p0, fg*16) -> ConvT(k4,s2,p1) x5
           channels fg*16 -> fg*8 -> fg*4 -> fg*2 -> fg -> C, BN+ReLU, tanh.
Critic     C -> fd -> fd*2 -> fd*4 -> fd*8 (k4,s2,p1, no bias, BN on all but
           first, LeakyReLU 0.2)  — note only FOUR stride-2 convs (224 -> 14)
           -> Conv(k=S0, s1, p0) -> spatial mean of the 1-channel map -> (B,).
           No sigmoid (Wasserstein critic, reference wggan.py:63-70).

The gradient penalty lives in xgan.train.wgan as grad-of-grad compiled into
the single XLA critic step.
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
        """``mask``: (B,) validity weights for exact short-tail-batch BN
        statistics (xgan/ops/norm.py)."""
        assert self.image_size % 32 == 0
        s0 = self.image_size // 32
        fg = self.feature_maps
        x = z.reshape(z.shape[0], 1, 1, self.latent_dim)
        widths = [fg * 16, fg * 8, fg * 4, fg * 2, fg]

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


class Critic(nn.Module):
    """Wasserstein critic; returns unbounded scores (B,)."""
    num_channels: int = 3
    feature_maps: int = 64
    image_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, mask=None):
        assert self.image_size % 32 == 0
        s0 = self.image_size // 32
        fd = self.feature_maps
        widths = [fd, fd * 2, fd * 4, fd * 8]

        x = Conv(widths[0], kernel=4, stride=2, padding=1,
                 dtype=self.dtype)(x)
        x = leaky_relu(x)
        for w in widths[1:]:
            x = Conv(w, kernel=4, stride=2, padding=1, dtype=self.dtype)(x)
            x = TorchBatchNorm()(x, train=train, mask=mask)
            x = leaky_relu(x)
        # After 4 stride-2 convs: S/16 spatial (14 at 224). k=S0 valid conv
        # then spatial mean — mirrors reference wggan.py:63-70 exactly.
        x = Conv(1, kernel=s0, stride=1, padding=0, dtype=self.dtype)(x)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))


# Reference alias: the critic is called "Discriminator" there.
Discriminator = Critic

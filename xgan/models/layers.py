"""Shared flax.linen building blocks with reference-matching initialization.

The reference initializes every conv weight from N(0, 0.02) and every
BatchNorm scale from N(1, 0.02) with zero bias (reference src/dcgan.py:6-12,
src/wggan.py:5-13, src/cgan.py:6-12); these initializers are the contract
that keeps early GAN training dynamics comparable.

Parameters are stored in float32; activations are computed in ``dtype``
(bfloat16 on TPU by default) with BatchNorm statistics always in float32.
"""
from __future__ import annotations

import os
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

# Stride-2 lowering selector. The phase decomposition (4x k2s1 convs +
# interleave, xgan/ops/conv.py) was built on an early measurement that
# XLA's zero-dilated ConvT lowering wasted 3/4 of the MXU work; the
# hardened step-level A/B (tools/bench_phase_ab.py, r2) showed the
# OPPOSITE on the current libtpu — this XLA lowers dilated convs at
# ~peak, and the phase form's extra interleave pass makes the full
# DCGAN-224 step 0.64x (21.0 ms vs 13.5 ms) and the 64px step 0.90x.
# Dilated is therefore the default; XGAN_PHASE=1 re-enables the phase
# lowerings (kept tested, for toolchains where dilated is slow).
_PHASE_ENABLED = (os.environ.get("XGAN_PHASE") == "1"
                  and os.environ.get("XGAN_NO_PHASE") != "1")

from xgan.ops.conv import (conv2d, conv2d_k4s2, conv_transpose2d,
                           conv_transpose2d_phase)
from xgan.ops.norm import batch_norm_infer, batch_norm_train

Dtype = Any


def gan_conv_init(std: float = 0.02) -> Callable:
    """N(0, std) initializer used for all GAN conv / linear / embedding weights."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


def gan_bn_scale_init(std: float = 0.02) -> Callable:
    """N(1, std) initializer for BatchNorm scales."""
    def init(key, shape, dtype=jnp.float32):
        return 1.0 + std * jax.random.normal(key, shape, dtype)
    return init


def torch_uniform_init(fan_in: int) -> Callable:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's default Linear/Conv
    weight-and-bias init, used for CGAN params the reference ``weights_init``
    does not touch (Linear/Embedding/conv biases, reference cgan.py:6-12)."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def normal_init(std: float = 1.0) -> Callable:
    """N(0, std) — torch's default nn.Embedding init when std=1."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


class Conv(nn.Module):
    """Conv2d(k, s, p) with PyTorch geometry; NHWC/HWIO; N(0,0.02) init.

    ``torch_bias=True`` uses torch's default U(±1/sqrt(Cin*k*k)) bias init
    (CGAN convs keep default biases, reference cgan.py:70-89).
    ``phase_grad=True`` marks the (k4, s2, p1) geometry as eligible for
    conv2d_k4s2, whose input-gradient uses the minimal-FLOP phase
    decomposition — only taken when XGAN_PHASE=1 (step-level A/B showed
    XLA's dilated lowering is faster on the current libtpu; see
    _PHASE_ENABLED above). Leave False for modules that need
    higher-order autodiff (the WGAN-GP critic's double backward —
    custom_vjp functions are not twice-differentiable)."""
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = False
    torch_bias: bool = False
    phase_grad: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", gan_conv_init(),
                       (self.kernel, self.kernel, cin, self.features))
        if (self.phase_grad and _PHASE_ENABLED and self.kernel == 4
                and self.stride == 2 and self.padding == 1):
            y = conv2d_k4s2(x.astype(self.dtype),
                            w.astype(self.dtype)).astype(self.dtype)
        else:
            y = conv2d(x.astype(self.dtype), w.astype(self.dtype),
                       stride=self.stride, padding=self.padding,
                       preferred_dtype=jnp.float32).astype(self.dtype)
        if self.use_bias:
            bias_init = (torch_uniform_init(cin * self.kernel * self.kernel)
                         if self.torch_bias else nn.initializers.zeros)
            b = self.param("bias", bias_init, (self.features,))
            y = y + b.astype(self.dtype)
        return y


class ConvTranspose(nn.Module):
    """ConvTranspose2d(k, s, p) with PyTorch geometry; N(0,0.02) init.

    With XGAN_PHASE=1 the (k4, s2, p1) geometry lowers via the phase
    decomposition (4 x k2s1 convs + interleave, xgan/ops/conv.py);
    by default it stays on XLA's dilated lowering, which the hardened
    step-level A/B measured faster (see _PHASE_ENABLED above). Numerics
    of both forms are pinned equal in tests/test_ops.py; autodiff
    composes (pure lax ops) in either mode."""
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = False
    phase: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", gan_conv_init(),
                       (self.kernel, self.kernel, cin, self.features))
        if (self.phase and _PHASE_ENABLED and self.kernel == 4
                and self.stride == 2 and self.padding == 1):
            y = conv_transpose2d_phase(
                x.astype(self.dtype), w.astype(self.dtype)).astype(self.dtype)
        else:
            y = conv_transpose2d(x.astype(self.dtype), w.astype(self.dtype),
                                 stride=self.stride, padding=self.padding,
                                 preferred_dtype=jnp.float32).astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with torch momentum/unbiased-running-var semantics.

    ``train=True`` uses batch statistics and updates the ``batch_stats``
    collection (caller must pass ``mutable=["batch_stats"]``);
    ``train=False`` uses running statistics.
    """
    momentum: float = 0.1
    eps: float = 1e-5
    scale_init: Callable = None  # defaults to N(1, 0.02)

    @nn.compact
    def __call__(self, x, *, train: bool, mask=None):
        """``mask``: optional (B,) sample-validity weights; train-mode
        statistics then cover only the valid rows — the exact semantics
        of the reference's smaller final batch (see xgan/ops/norm.py)."""
        c = x.shape[-1]
        scale_init = self.scale_init or gan_bn_scale_init()
        scale = self.param("scale", scale_init, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            y, new_mean, new_var = batch_norm_train(
                x, scale, bias, ra_mean.value, ra_var.value,
                momentum=self.momentum, eps=self.eps, mask=mask)
            if not self.is_initializing():
                ra_mean.value = new_mean
                ra_var.value = new_var
            return y
        return batch_norm_infer(x, scale, bias, ra_mean.value, ra_var.value,
                                eps=self.eps)


class Dense(nn.Module):
    """Linear layer. Default init is torch's U(±1/sqrt(fan_in)) for weight
    and bias (the reference CGAN fc is untouched by weights_init,
    reference cgan.py:24 + :6-12); pass kernel_init to override."""
    features: int
    use_bias: bool = True
    kernel_init: Callable = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kinit = self.kernel_init or torch_uniform_init(fan_in)
        w = self.param("kernel", kinit, (fan_in, self.features))
        y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype),
                    preferred_element_type=jnp.float32).astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", torch_uniform_init(fan_in), (self.features,))
            y = y + b.astype(self.dtype)
        return y


def leaky_relu(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, slope * x)


def upsample_nearest_2x(x):
    """torch nn.Upsample(scale_factor=2, mode='nearest') on NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)

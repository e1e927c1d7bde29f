"""Pallas TPU kernel: fused ConvTranspose2d(k4,s2,p1) [+ affine + act].

STATUS: measured-rejected as a default (kept as a tested building
block). On the current libtpu, XLA's own dilated-conv emitter runs the
G-224 ladder at ~175 TF/s effective; this kernel measured 0.13-0.66x of
that per layer and VMEM-OOMs at the 56->112 layer with b128
(tools/bench_pallas_convt.py; BENCH_DETAIL pallas_convt_fused_rejection,
docs/MXU_NOTES.md).

Design: the XLA phase lowering (xgan/ops/conv.py:conv_transpose2d_phase)
runs four k2s1 convs and then a separate stack/transpose interleave — an
extra pass over the output in HBM. This kernel computes all four output
phases as MXU matmuls from a VMEM-resident input tile, interleaves them
in VMEM, and writes the (Bt, 2H, 2W, Cout) block in one output pass,
with an optional fused per-channel affine + activation epilogue
(inference-mode BN + ReLU/LeakyReLU — training-mode BN needs batch
statistics over the whole output and stays in XLA).

Math (same derivation as conv_transpose2d_phase, probed in
tests/test_ops.py): with the repo's correlation convention, output pixel
(2t+py, 2s+px) = sum_{j0,j1 in {0,1}} x[t-1+j0, s-1+j1] @
w[sel(py)[j0], sel(px)[j1]] with sel(0)=(0,2), sel(1)=(1,3).

Grid: (B/Bt,) — one whole (1px-border-padded) image tile per step; the
matmul M dim spans Bt*H*W pixels so small feature maps still fill MXU
tiles. G-224 ladder VMEM use peaks at ~1.9 MB (112x112x32 in +
224x224x3 out, Bt=1).

Reference stacks being replaced: /root/reference/src/dcgan.py:26-56
(ConvTranspose2d + BatchNorm2d + ReLU ladder).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_SEL = ((0, 2), (1, 3))


def _kernel(x_ref, w_ref, scale_ref, shift_ref, out_ref, *, bt, h, width,
            cin, cout, act, out_dtype):
    # x_ref: (Bt, H+2, W+2, Cin) padded both sides;
    # out_ref: (Bt, 2H, 2W, Cout). Phase (py,px) reads padded rows
    # starting j0+py (even: x[t-1],x[t]; odd: x[t],x[t+1]).
    x = x_ref[...]
    phases = []
    for py in (0, 1):
        for px in (0, 1):
            acc = jnp.zeros((bt * h * width, cout), jnp.float32)
            for j0 in (0, 1):
                for j1 in (0, 1):
                    xs = x[:, j0 + py:j0 + py + h,
                           j1 + px:j1 + px + width, :]
                    k = w_ref[_SEL[py][j0], _SEL[px][j1], :, :]
                    acc += jax.lax.dot_general(
                        xs.reshape(bt * h * width, cin), k,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            acc = acc * scale_ref[...] + shift_ref[...]
            if act == "relu":
                acc = jnp.maximum(acc, 0.0)
            elif act == "leaky_relu":
                acc = jnp.where(acc >= 0, acc, 0.2 * acc)
            phases.append(acc.reshape(bt, h, width, cout))
    # interleave in VMEM: (Bt,H,W,[py,px],C) -> (Bt,2H,2W,C), one store.
    y = jnp.stack(phases, axis=-2).reshape(bt, h, width, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(bt, 2 * h, 2 * width, cout)
    out_ref[...] = y.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("act", "block_b", "interpret"))
def convt4x4s2_fused(x, w, scale=None, shift=None, *, act: str = "none",
                     block_b: int = 0, interpret: bool = False):
    """x: (B,H,W,Cin), w: (4,4,Cin,Cout) -> (B,2H,2W,Cout).

    scale/shift: optional (Cout,) per-channel affine applied in f32
    before ``act`` ('none' | 'relu' | 'leaky_relu'). ``block_b``: images
    per grid step (0 = auto: aim for >=1024 matmul rows, VMEM capped).
    """
    b, h, width, cin = x.shape
    cout = w.shape[3]
    if block_b <= 0:
        block_b = max(1, min(b, 1024 // (h * width) or 1))
        while b % block_b:
            block_b -= 1
    assert b % block_b == 0, (b, block_b)
    scale = jnp.ones((cout,), jnp.float32) if scale is None else scale
    shift = jnp.zeros((cout,), jnp.float32) if shift is None else shift
    scale = scale.astype(jnp.float32).reshape(1, cout)
    shift = shift.astype(jnp.float32).reshape(1, cout)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    kernel = functools.partial(
        _kernel, bt=block_b, h=h, width=width, cin=cin, cout=cout,
        act=act, out_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, h + 2, width + 2, cin),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((4, 4, cin, cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, 2 * h, 2 * width, cout),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * width, cout),
                                       x.dtype),
        interpret=interpret,
    )(xp, w, scale, shift)

"""2-D convolution primitives, NHWC/HWIO, with PyTorch-compatible geometry.

The reference models are built from exactly two conv geometries
(reference src/dcgan.py:26-86, src/wggan.py:19-63, src/cgan.py:29-89):

- ``Conv2d(k=4, s=2, p=1)``            — halves spatial dims (224 -> 112 ...)
- ``Conv2d(k=7, s=1, p=0)``            — 7x7 valid (7 -> 1)
- ``ConvTranspose2d(k=4, s=2, p=1)``   — doubles spatial dims
- ``ConvTranspose2d(k=7, s=1, p=0)``   — 1 -> 7 projection
- ``Conv2d(k=3, s=1, p=1)``            — CGAN "same" convs

Everything lowers to ``lax.conv_general_dilated`` so XLA tiles it onto the
MXU.  Transposed convolution is expressed as an input-dilated convolution
(lhs_dilation = stride, padding = k-1-p), which is the canonical XLA-friendly
form; because all GAN weights are trained from scratch the kernel-mirroring
convention relative to PyTorch is immaterial.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO weights.
_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(x, w, *, stride: int = 1, padding: int = 0,
           preferred_dtype=None):
    """PyTorch-semantics Conv2d: symmetric int padding, square stride.

    x: (B, H, W, Cin); w: (kh, kw, Cin, Cout) -> (B, H', W', Cout)

    Output dtype follows the inputs (bf16 in the mixed-precision path);
    the TPU MXU still accumulates bf16 convolutions in fp32 internally.
    ``preferred_element_type`` is deliberately NOT set: this jax version's
    conv transpose (gradient) rule rejects mixed cotangent/operand dtypes
    when it is.
    """
    del preferred_dtype
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DIMSPEC,
    )


def conv_transpose2d(x, w, *, stride: int = 1, padding: int = 0,
                     preferred_dtype=None):
    """PyTorch-semantics ConvTranspose2d(k, s, p) as an lhs-dilated conv.

    out = (in - 1) * s - 2p + k   (matches nn.ConvTranspose2d)

    x: (B, H, W, Cin); w: (kh, kw, Cin, Cout) -> (B, H', W', Cout)
    """
    del preferred_dtype
    k = w.shape[0]
    pad = k - 1 - padding
    return lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMSPEC,
    )


def conv_transpose2d_phase(x, w):
    """ConvTranspose2d(k=4, s=2, p=1) as FOUR k2s1 phase convolutions.

    OPT-IN lowering (XGAN_PHASE=1, xgan/models/layers.py): nominally the
    dilated form feeds the MXU a 2x-zero-dilated input (of each output
    pixel's 16 k4 taps only 4 hit real data), but the current libtpu's
    conv emitter already runs the dilated form at ~peak and the phase
    form's extra interleave pass measured SLOWER at step level
    (tools/bench_phase_ab.py; docs/MXU_NOTES.md). Kept tested for
    toolchains where the dilated emitter is naive. Decomposing by output
    phase removes the redundancy: with this module's correlation
    convention
    (input row iy through kernel row ky lands on output y' = 2*iy+2-ky,
    probed in tests/test_ops.py), the even output phase y'=2t reads the
    window (x[t-1], x[t]) through kernel rows (0, 2) and the odd phase
    y'=2t+1 reads (x[t], x[t+1]) through rows (1, 3); columns likewise.
    Four k2 convs do exactly the minimal 16*H*W*Cin*Cout MACs (the
    dilated form counts 64), then one interleave pass assembles
    (B, 2H, 2W, Cout).

    x: (B, H, W, Cin); w: (4, 4, Cin, Cout) -> (B, 2H, 2W, Cout).
    Numerically identical to conv_transpose2d(x, w, stride=2, padding=1)
    up to f32 summation order (tests/test_ops.py).
    """
    assert w.shape[0] == 4 and w.shape[1] == 4
    b, h, wd, _ = x.shape
    cout = w.shape[3]
    row_sel = ((0, 2), (1, 3))
    pad_sel = ((1, 0), (0, 1))

    phases = []
    for py in (0, 1):
        for px in (0, 1):
            sub = w[row_sel[py], :, :, :][:, row_sel[px], :, :]
            y = lax.conv_general_dilated(
                x, sub,
                window_strides=(1, 1),
                padding=(pad_sel[py], pad_sel[px]),
                dimension_numbers=_DIMSPEC,
            )
            phases.append(y)
    # (B,H,W,C) x 4 -> (B, H, 2, W, 2, C) -> (B, 2H, 2W, C)
    y = jnp.stack(phases, axis=-2)            # (B, H, W, 4, C)
    y = y.reshape(b, h, wd, 2, 2, cout)       # [py, px]
    y = y.transpose(0, 1, 3, 2, 4, 5)         # (B, H, py, W, px, C)
    return y.reshape(b, 2 * h, 2 * wd, cout)


def _phase_grad_x_k4s2(g, w):
    """d/dx of conv2d(x, w, stride=2, padding=1) for k=4, phase form.

    dx[iy] = sum_ky g[(iy + 1 - ky)/2] w[ky] (whenever integral): the
    cotangent flows through a stride-2 TRANSPOSED conv, nominally a
    2x-zero-dilated input (see conv_transpose2d_phase — and the same
    caveat: the current libtpu emits the dilated form at ~peak, so this
    is an XGAN_PHASE=1 opt-in). Phase form: even input rows
    iy=2t read (g[t-1], g[t]) through kernel rows (3, 1); odd rows
    iy=2t+1 read (g[t], g[t+1]) through rows (2, 0); the in/out channel
    axes of w are swapped. Verified against jax.grad of the lax lowering
    in tests/test_ops.py.
    """
    b, oh, ow, _ = g.shape
    cin = w.shape[2]
    wt = w.transpose(0, 1, 3, 2)              # (ky, kx, Cout, Cin)
    row_sel = ((3, 1), (2, 0))
    pad_sel = ((1, 0), (0, 1))
    phases = []
    for py in (0, 1):
        for px in (0, 1):
            sub = wt[row_sel[py], :, :, :][:, row_sel[px], :, :]
            phases.append(lax.conv_general_dilated(
                g, sub, window_strides=(1, 1),
                padding=(pad_sel[py], pad_sel[px]),
                dimension_numbers=_DIMSPEC))
    y = jnp.stack(phases, axis=-2)
    y = y.reshape(b, oh, ow, 2, 2, cin)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * oh, 2 * ow, cin)


@jax.custom_vjp
def conv2d_k4s2(x, w):
    """conv2d(x, w, stride=2, padding=1) whose input-gradient uses the
    minimal-FLOP phase decomposition instead of XLA's zero-dilated
    transposed conv. XGAN_PHASE=1 opt-in only: the step-level A/B
    (tools/bench_phase_ab.py) measured the dilated emitter faster on the
    current libtpu."""
    return conv2d(x, w, stride=2, padding=1)


def _conv2d_k4s2_fwd(x, w):
    return conv2d(x, w, stride=2, padding=1), (x, w)


def _conv2d_k4s2_bwd(res, g):
    x, w = res
    # dw via XLA's rhs-grad (window-dilated conv — no zeros inserted,
    # already minimal); dx via the phase decomposition.
    dw = jax.vjp(lambda w_: conv2d(x, w_, stride=2, padding=1), w)[1](g)[0]
    dx = _phase_grad_x_k4s2(g, w).astype(x.dtype)
    return dx, dw


conv2d_k4s2.defvjp(_conv2d_k4s2_fwd, _conv2d_k4s2_bwd)

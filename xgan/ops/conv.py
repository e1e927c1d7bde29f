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

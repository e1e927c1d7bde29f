"""Weight-only int8 quantization for serving artifacts.

Beyond-reference capability (the reference serves f32 torch checkpoints
only, analyze_results.py:90-108): every conv / conv-transpose / dense
kernel is stored as per-output-channel symmetric int8 —
``q = round(w / s)`` with ``s = absmax(w, non-output axes) / 127`` —
and dequantized INSIDE the exported program, so the int8 tensors are
the artifact's baked constants. A ResNet-50 classifier artifact shrinks
~4x vs f32 (~2x vs bf16) while the matmuls/convs still run in the
serving compute dtype on the MXU; on weight-bandwidth-bound serving
hosts the smaller constant reads also cut HBM traffic.

Quantized "params" trees keep the flax nesting but replace eligible
kernel leaves with ``{"q8": int8, "q8_scale": f32 (out,)}`` marker
dicts; everything else (BN scale/bias/stats, biases, embeddings) stays
full precision. ``dequantize_params`` is traceable — run it inside the
jitted/exported function so XLA sees int8 constants + a cheap
elementwise expansion it can schedule against the convs.
"""
from __future__ import annotations

_QKEYS = frozenset({"q8", "q8_scale"})


def _is_qleaf(v) -> bool:
    return isinstance(v, dict) and set(v.keys()) == _QKEYS


def _map_kernels(tree, quant_fn, dequant_fn):
    out = {}
    for k, v in tree.items():
        if _is_qleaf(v):
            out[k] = dequant_fn(v)
        elif isinstance(v, dict):
            out[k] = _map_kernels(v, quant_fn, dequant_fn)
        elif k == "kernel" and getattr(v, "ndim", 0) >= 2:
            out[k] = quant_fn(v)
        else:
            out[k] = v
    return out


def quantize_params(params):
    """Host-side: params tree -> tree with int8 marker-dict kernels.

    Per-OUTPUT-channel symmetric scales (flax Conv/ConvTranspose/Dense
    kernels all carry the output dimension last), so per-channel weight
    magnitude differences — large in BN-free generator ladders — do not
    eat the 8-bit range of quiet channels.

    ``q8`` leaves are returned as JAX (not numpy) arrays deliberately:
    numpy's ``.astype`` executes eagerly even inside a jit trace, which
    would bake the DEQUANTIZED f32 tensors into an exported artifact
    (measured: zero size reduction); ops on concrete jax arrays are
    traced, so the artifact keeps int8 constants + a convert op.
    """
    import jax.numpy as jnp
    import numpy as np

    def q(w):
        w = np.asarray(w, np.float32)
        s = np.abs(w).max(axis=tuple(range(w.ndim - 1)))
        s = np.maximum(s, 1e-12) / 127.0
        q8 = np.clip(np.rint(w / s), -127, 127).astype(np.int8)
        return {"q8": jnp.asarray(q8), "q8_scale": s.astype(np.float32)}

    return _map_kernels(params, q, lambda v: v)


def dequantize_params(params):
    """Traceable: marker-dict kernels -> f32 kernels (identity on
    unquantized leaves, so callers can route every params tree through
    here). The downstream flax module casts to its compute dtype as
    usual."""
    import jax
    import jax.numpy as jnp

    def dq(leaf):
        q8 = leaf["q8"]
        if not isinstance(q8, (jax.Array, jax.core.Tracer)):
            q8 = jnp.asarray(q8)  # see quantize_params: keep the cast
        return q8.astype(jnp.float32) * leaf["q8_scale"]

    return _map_kernels(params, lambda v: v, dq)


def is_quantized(params) -> bool:
    found = False

    def walk(tree):
        nonlocal found
        for v in tree.values():
            if _is_qleaf(v):
                found = True
            elif isinstance(v, dict):
                walk(v)

    walk(params)
    return found

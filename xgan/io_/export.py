"""Portable compiled-model serving artifacts (jax.export / StableHLO).

Beyond-reference capability: the reference can only run a trained model
through its full Python training stack (e.g. analyze_results.py reloads
the torchvision graph to predict). Here a trained classifier or
generator exports as ONE self-contained StableHLO artifact — weights
baked in as constants, batch dimension symbolic — that executes later on
TPU or CPU with no model code at all, via
``jax.export.deserialize(blob).call(batch)``. Cross-release loadability
follows JAX's export compatibility guarantees.

The exported functions mirror the serving surfaces of this framework:

- classifier: uint8 images ``(b, s, s, 3)`` -> ``(labels (b,),
  prob_positive (b,))`` with the ImageNet normalization fused in (the
  exact pipeline of src/predict.py).
- generator: latent ``z (b, latent_dim)`` [+ ``labels (b,) int32`` for
  the conditional CGAN] -> uint8 images, with the reference's
  ``x*0.5+0.5`` export transform fused in
  (reference generate_synthetic.py:53).
"""
from __future__ import annotations

import os

# Both lowerings by default: artifacts exported on a CPU dev box serve
# on TPU and vice versa.
DEFAULT_PLATFORMS = ("cpu", "tpu")


def _batch_spec(shape_tail, dtype):
    import jax
    from jax import export as jexport
    b = jexport.symbolic_shape("b")[0]
    return jax.ShapeDtypeStruct((b, *shape_tail), dtype)


def make_classifier_infer(model, variables):
    """The ONE serving program: ``uint8 (b,s,s,3) -> (labels (b,),
    prob_positive (b,))`` with the ImageNet normalization fused in.

    Shared by the StableHLO export, src/predict.py and src/serve.py so
    the artifact, the batch CLI and the HTTP server are provably the
    same computation. ``variables`` may carry int8-quantized kernels
    (xgan.io_.quant) — dequantization happens inside the traced program
    (identity for full-precision trees)."""
    import jax
    import jax.numpy as jnp

    from xgan.data.pipeline import normalize_images
    from xgan.io_.quant import dequantize_params

    def infer(imgs_u8):
        v = dict(variables, params=dequantize_params(variables["params"]))
        logits = model.apply(v, normalize_images(imgs_u8),
                             train=False)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.argmax(logits, -1), probs[:, 1]
    return infer


def export_classifier(model, variables, image_size: int,
                      platforms=DEFAULT_PLATFORMS) -> bytes:
    """Serialize ``uint8 (b,s,s,3) -> (labels, prob_positive)``."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    infer = make_classifier_infer(model, variables)
    spec = _batch_spec((image_size, image_size, 3), jnp.uint8)
    return jexport.export(jax.jit(infer),
                          platforms=tuple(platforms))(spec).serialize()


def export_generator(model, variables, latent_dim: int,
                     conditional: bool = False,
                     platforms=DEFAULT_PLATFORMS) -> bytes:
    """Serialize ``z (b,latent) [, labels (b,)] -> uint8 images``.
    Like the classifier path, ``variables`` may carry int8-quantized
    kernels — dequantized inside the traced program."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from xgan.data.pipeline import tanh_to_u8
    from xgan.io_.quant import dequantize_params

    # dequantize INSIDE the traced functions: eager (pre-trace) jax ops
    # on the concrete int8 arrays would bake their f32 expansion into
    # the artifact (measured: zero size reduction); in-trace they lower
    # to int8 constants + a convert op
    zspec = _batch_spec((latent_dim,), jnp.float32)
    if conditional:
        def gen(z, labels):
            v = dict(variables,
                     params=dequantize_params(variables["params"]))
            return tanh_to_u8(model.apply(v, z, labels, train=False))
        # labels share the symbolic batch dimension with z
        lspec = jax.ShapeDtypeStruct(zspec.shape[:1], jnp.int32)
        return jexport.export(jax.jit(gen), platforms=tuple(platforms))(
            zspec, lspec).serialize()

    def gen(z):
        v = dict(variables, params=dequantize_params(variables["params"]))
        return tanh_to_u8(model.apply(v, z, train=False))
    return jexport.export(jax.jit(gen),
                          platforms=tuple(platforms))(zspec).serialize()


# Self-description envelope (optional, versioned): a JSON header ahead
# of the raw jax.export bytes so consumers (serve.py) get the model
# kind / class count / shapes without signature sniffing or flags.
# Raw blobs without the magic still load — full backward compatibility.
_MAGIC = b"XGAN.EXPORT.1\n"


def save_exported(path: str, blob: bytes, meta: dict | None = None) -> None:
    import json
    import struct
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        if meta is not None:
            header = json.dumps(meta, sort_keys=True).encode()
            f.write(_MAGIC)
            f.write(struct.pack("<I", len(header)))
            f.write(header)
        f.write(blob)


def _split_envelope(data: bytes):
    import json
    import struct
    if data.startswith(_MAGIC):
        (n,) = struct.unpack_from("<I", data, len(_MAGIC))
        off = len(_MAGIC) + 4
        return json.loads(data[off:off + n]), data[off + n:]
    return None, data


def load_exported(path: str):
    """Deserialize an artifact; run it with ``.call(*args)``."""
    return load_exported_with_meta(path)[0]


def load_exported_with_meta(path: str):
    """Returns ``(Exported, meta_dict_or_None)``. ``meta`` is None for
    artifacts written before the envelope existed (or via plain
    save_exported without meta)."""
    from jax import export as jexport
    with open(path, "rb") as f:
        meta, blob = _split_envelope(f.read())
    return jexport.deserialize(blob), meta

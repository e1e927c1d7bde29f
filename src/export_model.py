#!/usr/bin/env python
"""Export a trained model as a portable StableHLO serving artifact
(beyond-reference capability; see xgan/io_/export.py).

The artifact is self-contained — weights baked in, batch dimension
symbolic, lowered for both CPU and TPU — and runs with no model code:

    from xgan.io_.export import load_exported
    labels, probs = load_exported("clf.stablehlo").call(u8_images)

``--model-path`` accepts our msgpack checkpoints or reference-layout
torch ``.pth`` state dicts (same interop as the samplers / predict.py).
After exporting, the artifact is reloaded and checked against the live
model on a random batch (disable with --skip-verify).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(
        description="Export a trained xgan model as a self-contained "
                    "StableHLO artifact for serving")
    p.add_argument("--kind", type=str, required=True,
                   choices=["classifier", "gan", "cgan", "wgan"])
    p.add_argument("--model-path", type=str, required=True,
                   help="checkpoint: .msgpack (ours) or torchvision/"
                        "reference-layout .pth")
    p.add_argument("--output", type=str, required=True,
                   help="artifact path, e.g. model.stablehlo")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--latent-dim", type=int, default=100)
    p.add_argument("--feature-maps-g", type=int, default=None,
                   help="generator width; defaults to the per-family "
                        "training default (32 for cgan, 64 otherwise)")
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8"],
                   help="weight-only quantization of conv/dense kernels "
                        "baked into the artifact (per-output-channel "
                        "symmetric int8, dequantized in-program): ~4x "
                        "smaller artifact, compute dtype unchanged")
    p.add_argument("--skip-verify", action="store_true",
                   help="skip the reload + numeric check after export")
    p.add_argument("--cpu", action="store_true")
    from xgan import config
    config.add_compute_dtype_arg(p)  # BAKED INTO the artifact: 'auto'
    # resolves on the exporting machine's backend — pass bf16 explicitly
    # when exporting on a CPU box for TPU serving
    return p


def _maybe_quantize(args, variables):
    """--quantize int8: replace conv/dense kernels with int8 marker
    leaves (xgan.io_.quant); the export paths dequantize in-program so
    the artifact bakes int8 constants."""
    if args.quantize == "none":
        return variables
    from xgan.io_.quant import quantize_params
    return dict(variables, params=quantize_params(variables["params"]))


def main():
    args = build_parser().parse_args()
    from xgan import config
    config.apply_device_flag(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from xgan.io_.export import (export_classifier, export_generator,
                                 load_exported, save_exported)
    from xgan.train.sample import load_generator

    dtype = config.resolve_dtype(args.compute_dtype)
    conditional = args.kind == "cgan"
    if args.kind == "classifier":
        from xgan.io_.checkpoint import load_classifier_variables
        from xgan.models.resnet import ResNet50
        if not os.path.exists(args.model_path):
            print(f"Error: model checkpoint not found at {args.model_path}")
            sys.exit(1)
        model = ResNet50(num_classes=args.num_classes, dtype=dtype)
        like = model.init(
            jax.random.key(0),
            jnp.zeros((1, args.image_size, args.image_size, 3)),
            train=False)
        try:
            variables = load_classifier_variables(
                args.model_path, {"params": like["params"],
                                  "batch_stats": like["batch_stats"]})
        except Exception as e:  # noqa: BLE001 — structured CLI error contract
            print(f"Error loading classifier checkpoint: {e}")
            sys.exit(1)
        variables = _maybe_quantize(args, variables)
        blob = export_classifier(model, variables, args.image_size)
    else:
        if args.kind == "gan":
            from xgan.models.dcgan import Generator
        elif args.kind == "wgan":
            from xgan.models.wgan import Generator
        else:
            from xgan.models.cgan import Generator
        fm = args.feature_maps_g
        if fm is None:  # mirror each family's training/sampler default
            fm = 32 if conditional else 64
        kw = {"num_classes": args.num_classes} if conditional else {}
        model = Generator(latent_dim=args.latent_dim,
                          feature_maps=fm,
                          image_size=args.image_size, dtype=dtype, **kw)
        example = (jnp.zeros((2, args.latent_dim)),)
        if conditional:
            example = example + (jnp.zeros((2,), jnp.int32),)
        # load_generator owns the fail-fast envelope (missing file,
        # flag/checkpoint shape mismatch, torch-layout conversion)
        variables = load_generator(model, args.model_path, example,
                                   torch_kind={"gan": "dcgan"}.get(
                                       args.kind, args.kind))
        variables = _maybe_quantize(args, variables)
        blob = export_generator(model, variables, args.latent_dim,
                                conditional=conditional)

    meta = {"kind": args.kind, "image_size": args.image_size,
            "compute_dtype": dtype.__name__}
    if args.quantize != "none":
        meta["quantize"] = args.quantize
    if args.kind == "classifier":
        meta["num_classes"] = args.num_classes
    else:
        meta.update(latent_dim=args.latent_dim, conditional=conditional)
        if conditional:
            meta["num_classes"] = args.num_classes
    save_exported(args.output, blob, meta)
    print(f"Exported {args.kind} -> {args.output} "
          f"({len(blob) / 1e6:.1f} MB, platforms cpu+tpu, "
          "symbolic batch, self-describing envelope)")

    if args.skip_verify:
        return
    art = load_exported(args.output)
    rng = np.random.default_rng(0)
    # verify against the live model with the SAME (possibly quantized)
    # weights the artifact baked — dequantize_params is the identity on
    # full-precision trees, so this is always apples-to-apples
    from xgan.io_.quant import dequantize_params
    variables = dict(variables,
                     params=dequantize_params(variables["params"]))
    if args.kind == "classifier":
        x = rng.integers(
            0, 255, (2, args.image_size, args.image_size, 3), np.uint8)
        from xgan.data.pipeline import normalize_images
        logits = model.apply(variables, normalize_images(jnp.asarray(x)),
                             train=False)
        want_probs = np.asarray(
            jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1])
        _, got_probs = art.call(x)
        # probabilities, not argmax labels: a near-tie would make label
        # equality flicker on harmless last-ulp compilation differences.
        # bf16 compute: eager-vs-compiled op reassociation perturbs logits
        # at ~2^-8 relative, so the prob tolerance must scale with dtype
        atol = 1e-5 if dtype == jnp.float32 else 2e-2
        ok = np.allclose(np.asarray(got_probs), want_probs, atol=atol)
    else:
        from xgan.data.pipeline import tanh_to_u8
        z = rng.normal(size=(2, args.latent_dim)).astype(np.float32)
        if conditional:
            labels = rng.integers(0, args.num_classes, (2,), np.int32)
            want = tanh_to_u8(model.apply(variables, jnp.asarray(z),
                                          jnp.asarray(labels), train=False))
            got = art.call(z, labels)
        else:
            want = tanh_to_u8(model.apply(variables, jnp.asarray(z),
                                          train=False))
            got = art.call(z)
        # f32 renders match bitwise; under bf16 a last-ulp tanh difference
        # between the eager and compiled programs can flip u8 rounding ±1
        tol = 0 if dtype == jnp.float32 else 1
        diff = np.abs(np.asarray(got, np.int16) - np.asarray(want, np.int16))
        ok = int(diff.max()) <= tol
    if not ok:
        print("Error: exported artifact disagrees with the live model")
        sys.exit(1)
    print("Verified: artifact output matches the live model.")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Batch inference with a trained classifier checkpoint (beyond-reference
capability: the reference pipeline can train and analyze but has no
standalone prediction entry point).

Classifies every PNG in --input-dir with a {prefix}resnet50.msgpack
checkpoint, a reference-layout torchvision .pth (what the reference's
train_classifier.py:179-184 writes), or a .stablehlo serving artifact
from src/export_model.py — detected by extension — and writes
predictions.json: per-image predicted label and positive-class
probability, plus summary counts. Decoding uses the native threaded
codec; inference is a jitted, mesh-sharded eval step (artifacts run
their baked program; input size and dtype come from the artifact).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(
        description="Classify a folder of chest X-ray PNGs with a trained "
                    "xgan ResNet-50 checkpoint")
    p.add_argument("--model-path", type=str, required=True,
                   help="e.g. models/baseline_resnet50.msgpack (or a "
                        "torchvision-layout .pth from the reference, or "
                        "a .stablehlo artifact from src/export_model.py)")
    p.add_argument("--input-dir", type=str, required=True)
    p.add_argument("--output", type=str, default="predictions.json")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--cpu", action="store_true")
    from xgan import config
    config.add_compute_dtype_arg(p)
    return p


def main():
    args = build_parser().parse_args()
    from xgan import config
    config.apply_device_flag(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from xgan.io_.checkpoint import load_classifier_variables
    from xgan.models.resnet import ResNet50
    from xgan.native import decode_png_batch
    from xgan.parallel import create_mesh

    if not os.path.exists(args.model_path):
        print(f"Error: model checkpoint not found at {args.model_path}")
        sys.exit(1)
    if not os.path.isdir(args.input_dir):
        print(f"Error: input dir {args.input_dir} not found")
        sys.exit(1)
    files = sorted(f for f in os.listdir(args.input_dir)
                   if f.endswith(".png"))
    if not files:
        print(f"No PNGs found in {args.input_dir}")
        sys.exit(1)
    print(f"Classifying {len(files)} images from {args.input_dir}")

    if args.model_path.endswith(".stablehlo"):
        # serving artifact: the program (dtype included) is baked; the
        # input size comes from its signature / envelope
        from xgan.io_.export import load_exported_with_meta
        try:
            art, _meta = load_exported_with_meta(args.model_path)
            avals = art.in_avals
            if not (len(avals) == 1 and len(avals[0].shape) == 4
                    and str(avals[0].dtype) == "uint8"):
                raise ValueError(
                    "not a classifier artifact: expected one uint8 "
                    "(b,s,s,3) input, got "
                    f"{[(a.shape, str(a.dtype)) for a in avals]}")
        except Exception as e:  # noqa: BLE001 — structured CLI errors
            print(f"Error loading serving artifact: {e}")
            sys.exit(1)
        size = int(avals[0].shape[1])
        if size != args.image_size:
            print(f"Note: artifact takes {size}px input; overriding "
                  f"--image-size {args.image_size}")
            args.image_size = size
        mesh_ctx = create_mesh()
        batch = mesh_ctx.pad_batch(args.batch_size)
        infer = jax.jit(art.call)
        shard = jnp.asarray  # the artifact carries no sharding contract
    else:
        model = ResNet50(num_classes=2,
                         dtype=config.resolve_dtype(args.compute_dtype))
        like = model.init(
            jax.random.key(0),
            jnp.zeros((1, args.image_size, args.image_size, 3)),
            train=False)
        try:
            variables = load_classifier_variables(
                args.model_path, {"params": like["params"],
                                  "batch_stats": like["batch_stats"]})
        except Exception as e:  # noqa: BLE001 — structured CLI errors
            print(f"Error loading classifier checkpoint: {e}")
            print("Ensure --model-path is a classifier .msgpack written "
                  "by src/train_classifier.py, or a torchvision-layout "
                  ".pth (full ResNet-50, 2-way head).")
            sys.exit(1)

        mesh_ctx = create_mesh()
        batch = mesh_ctx.pad_batch(args.batch_size)
        variables = mesh_ctx.replicate(variables)

        from xgan.io_.export import make_classifier_infer
        infer = jax.jit(make_classifier_infer(model, variables))
        shard = mesh_ctx.shard_array

    # Device results stay un-synced inside the loop (jax async dispatch):
    # the host decodes batch i+1 while the device classifies batch i.
    # Labels/probs are (B,) — deferring the device_get costs nothing.
    pending = []
    for start in range(0, len(files), batch):
        chunk = files[start:start + batch]
        paths = [os.path.join(args.input_dir, f) for f in chunk]
        imgs = decode_png_batch(paths, args.image_size)
        if imgs.shape[0] < batch:  # static-shape pad, dropped below
            pad = np.repeat(imgs[-1:], batch - imgs.shape[0], axis=0)
            imgs = np.concatenate([imgs, pad])
        p, pr = infer(shard(imgs))
        pending.append((p, pr, len(chunk)))
    preds, probs = [], []
    for p, pr, n in pending:
        preds.extend(np.asarray(p)[:n].tolist())
        probs.extend(np.asarray(pr)[:n].tolist())

    results = {
        "model": args.model_path,
        "num_images": len(files),
        "positive": int(sum(preds)),
        "negative": int(len(preds) - sum(preds)),
        "predictions": [
            {"file": f, "label": int(l), "prob_positive": round(pp, 6)}
            for f, l, pp in zip(files, preds, probs)],
    }
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"{results['positive']}/{len(files)} predicted positive; "
          f"wrote {args.output}")


if __name__ == "__main__":
    main()

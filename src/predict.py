#!/usr/bin/env python
"""Batch inference with a trained classifier checkpoint (beyond-reference
capability: the reference pipeline can train and analyze but has no
standalone prediction entry point).

Classifies every PNG in --input-dir with a {prefix}resnet50.msgpack
checkpoint — or a reference-layout torchvision .pth (what the reference's
train_classifier.py:179-184 writes), detected by extension — and writes
predictions.json: per-image predicted label and positive-class
probability, plus summary counts. Decoding uses the native threaded
codec; inference is a jitted, mesh-sharded eval step.
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
                        "torchvision-layout .pth from the reference)")
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

    model = ResNet50(num_classes=2,
                     dtype=config.resolve_dtype(args.compute_dtype))
    like = model.init(jax.random.key(0),
                      jnp.zeros((1, args.image_size, args.image_size, 3)),
                      train=False)
    try:
        variables = load_classifier_variables(
            args.model_path, {"params": like["params"],
                              "batch_stats": like["batch_stats"]})
    except Exception as e:  # noqa: BLE001 — structured CLI error contract
        print(f"Error loading classifier checkpoint: {e}")
        print("Ensure --model-path is a classifier .msgpack written by "
              "src/train_classifier.py, or a torchvision-layout .pth "
              "(full ResNet-50, 2-way head).")
        sys.exit(1)

    mesh_ctx = create_mesh()
    batch = mesh_ctx.pad_batch(args.batch_size)
    variables = mesh_ctx.replicate(variables)

    from xgan.io_.export import make_classifier_infer
    infer = jax.jit(make_classifier_infer(model, variables))

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
        p, pr = infer(mesh_ctx.shard_array(imgs))
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

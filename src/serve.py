#!/usr/bin/env python
"""Minimal HTTP model server (beyond-reference capability; the reference
has no serving path at all).

Serves a trained pneumonia classifier over HTTP:

    POST /predict   body = PNG bytes -> {"label": 0|1,
                                         "prob_positive": float}
    GET  /healthz   -> {"ok": true, "model": ..., "image_size": ...}

``--model-path`` accepts a self-contained StableHLO artifact written by
src/export_model.py (.stablehlo — image size is read from the artifact's
input signature, no model flags needed) or a classifier checkpoint
(.msgpack ours / .pth reference-layout, built with --image-size).
Requests are decoded to RGB, bilinear-resized, and classified by the
same uint8->probability program predict.py uses; inference runs jitted
under a lock (one compiled program, any number of request threads).
"""
import argparse
import io
import json
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(
        description="Serve a trained xgan classifier over HTTP")
    p.add_argument("--model-path", type=str, required=True,
                   help=".stablehlo artifact (export_model.py) or "
                        "classifier checkpoint (.msgpack/.pth)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--image-size", type=int, default=224,
                   help="checkpoint inputs only; artifacts carry their "
                        "own input signature")
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--cpu", action="store_true")
    return p


def make_infer(args):
    """Returns (infer(u8 (1,s,s,3)) -> (label, prob), image_size)."""
    import jax
    import jax.numpy as jnp

    if args.model_path.endswith(".stablehlo"):
        from xgan.io_.export import load_exported
        art = load_exported(args.model_path)
        avals = art.in_avals
        # classifier signature: one uint8 (b, s, s, 3) input. A generator
        # artifact (z (b, latent) float32 in) must be rejected with a
        # structured message, not crash at the warm-up call.
        if (len(avals) != 1 or len(avals[0].shape) != 4
                or avals[0].dtype != jnp.uint8):
            raise ValueError(
                f"{args.model_path} is not a classifier artifact "
                f"(input signature {[(a.shape, str(a.dtype)) for a in avals]}; "
                "expected one uint8 (batch, size, size, 3) input — "
                "generator artifacts cannot be served by serve.py)")
        size = avals[0].shape[1]
        # jit the call: eager Exported.call re-traces per request
        run = jax.jit(art.call)

        def infer(u8):
            labels, probs = run(u8)
            return int(labels[0]), float(probs[0])
        return infer, int(size)

    from xgan.io_.checkpoint import load_classifier_variables
    from xgan.io_.export import make_classifier_infer
    from xgan.models.resnet import ResNet50
    model = ResNet50(num_classes=args.num_classes)
    like = model.init(
        jax.random.key(0),
        jnp.zeros((1, args.image_size, args.image_size, 3)), train=False)
    variables = load_classifier_variables(
        args.model_path, {"params": like["params"],
                          "batch_stats": like["batch_stats"]})
    run = jax.jit(make_classifier_infer(model, variables))

    def infer(u8):
        labels, probs = run(u8)
        return int(labels[0]), float(probs[0])
    return infer, args.image_size


def main():
    args = build_parser().parse_args()
    from xgan import config
    config.apply_device_flag(args)

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import numpy as np
    from PIL import Image

    if not os.path.exists(args.model_path):
        print(f"Error: model not found at {args.model_path}")
        sys.exit(1)
    try:
        infer, size = make_infer(args)
        # compile before accepting traffic so the first request is fast;
        # inside the envelope: a malformed artifact must fail structured
        infer(np.zeros((1, size, size, 3), np.uint8))
    except Exception as e:  # noqa: BLE001 — structured CLI error contract
        print(f"Error loading model: {e}")
        sys.exit(1)

    lock = threading.Lock()
    model_name = os.path.basename(args.model_path)

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "model": model_name,
                                 "image_size": size})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                n = -1
            if n <= 0 or n > 64 * 1024 * 1024:
                self._json(400, {"error": "bad Content-Length"})
                return
            try:
                img = Image.open(io.BytesIO(self.rfile.read(n)))
                img = img.convert("RGB")
                if img.size != (size, size):
                    img = img.resize((size, size), Image.BILINEAR)
                u8 = np.asarray(img, np.uint8)[None]
            except Exception as e:  # corrupt/unsupported image
                self._json(400, {"error": f"could not decode image: {e}"})
                return
            with lock:
                label, prob = infer(u8)
            self._json(200, {"label": label, "prob_positive": prob})

        def log_message(self, fmt, *a):  # quiet access log
            pass

    srv = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"Serving {model_name} (image_size={size}) on "
          f"http://{args.host}:{srv.server_address[1]}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()

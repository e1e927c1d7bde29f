#!/usr/bin/env python
"""A/B the serve.py dynamic micro-batching under concurrent load.

Starts src/serve.py as a real subprocess per --max-batch setting, hammers
POST /predict (or /generate with --endpoint generate and a generator
artifact: distinct seeds per request, PNG responses) with --clients
concurrent threads for --seconds, and prints one JSON line per setting
plus the speedup of the largest batch over max-batch=1. The interesting
target is the TPU backend, where the per-dispatch tunnel overhead
dominates a b=1 forward and coalescing is nearly free; on a 1-core CPU
the compute itself serializes so the expected ratio is ~1.0x.

Usage:
  python tools/bench_serve.py --model-path clf.stablehlo \
      [--endpoint predict|generate] [--cpu] [--clients 16] \
      [--seconds 10] [--max-batches 1,8]
"""
import argparse
import io
import json
import os
import queue
import subprocess
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def start_server(model_path, image_size, max_batch, cpu):
    import tempfile
    cmd = [sys.executable, "-u", os.path.join(REPO, "src", "serve.py"),
           "--model-path", model_path, "--port", "0",
           "--image-size", str(image_size), "--max-batch", str(max_batch)]
    if cpu:
        cmd.append("--cpu")
    # stderr to a FILE, not a pipe: on the TPU backend startup compiles
    # 4 bucket programs while jax/libtpu spam stderr — an undrained pipe
    # fills at ~64KB and blocks the child before it prints "Serving"
    errf = tempfile.NamedTemporaryFile("w+", suffix=".serve.err",
                                       delete=False)
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=errf,
                            text=True)
    q = queue.Queue()
    threading.Thread(target=lambda: [q.put(ln) for ln in proc.stdout],
                     daemon=True).start()

    def err_tail():
        errf.flush()
        with open(errf.name) as f:
            return f.read()[-2000:]

    deadline = time.time() + 600
    while time.time() < deadline:
        try:
            line = q.get(timeout=5)
        except queue.Empty:
            if proc.poll() is not None:
                raise RuntimeError(f"server died: {err_tail()}")
            continue
        if "Serving" in line:
            return proc, int(line.rsplit(":", 1)[-1].strip())
    proc.kill()
    raise RuntimeError(f"server did not come up in 600s; stderr tail: "
                       f"{err_tail()}")


def hammer(port, path, bodies, clients, seconds):
    """Concurrent clients cycling through distinct request bodies;
    returns (requests_completed, wall_seconds)."""
    stop = time.time() + seconds
    counts = [0] * clients
    errors = []

    def client(ci):
        i = ci
        while time.time() < stop:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=bodies[i % len(bodies)], method="POST")
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    r.read()  # JSON for /predict, PNG for /generate
                counts[ci] += 1
            except Exception as e:  # noqa: BLE001
                errors.append(str(e))
                return
            i += clients

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise RuntimeError(f"client errors: {errors[:3]}")
    return sum(counts), time.time() - t0


def main():
    import numpy as np
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True,
                    help="classifier .stablehlo / .msgpack / .pth")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--max-batches", type=str, default="1,8")
    ap.add_argument("--endpoint", choices=("predict", "generate"),
                    default="predict",
                    help="generate: --model-path must be a generator "
                         "artifact; requests carry distinct seeds")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--write-detail", action="store_true",
                    help="merge the A/B into BENCH_DETAIL.json under "
                         "'serve_microbatch_ab' (bench_all.py-style "
                         "read-modify-write; other keys untouched)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.endpoint == "generate":
        bodies = [json.dumps({"seed": i}).encode() for i in range(32)]
        path = "/generate"
    else:
        bodies = []
        for _ in range(32):
            img = rng.integers(0, 255,
                               (args.image_size, args.image_size, 3),
                               np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            bodies.append(buf.getvalue())
        path = "/predict"

    results = {}
    for mb in [int(x) for x in args.max_batches.split(",")]:
        proc, port = start_server(args.model_path, args.image_size, mb,
                                  args.cpu)
        try:
            hammer(port, path, bodies, args.clients, 2.0)  # warm
            n, dt = hammer(port, path, bodies, args.clients, args.seconds)
            results[mb] = {"requests": n, "seconds": round(dt, 2),
                           "req_per_sec": round(n / dt, 1)}
        finally:
            proc.terminate()
            proc.wait(timeout=30)
        print(json.dumps({"max_batch": mb, **results[mb]}))
    mbs = sorted(results)
    ratio = None
    if len(mbs) > 1 and results[mbs[0]]["req_per_sec"] > 0:
        ratio = (results[mbs[-1]]["req_per_sec"]
                 / results[mbs[0]]["req_per_sec"])
        print(json.dumps({"metric": "serve_microbatch_speedup",
                          "value": round(ratio, 2),
                          "unit": f"x (max_batch {mbs[-1]} vs {mbs[0]}, "
                                  f"{args.clients} clients)"}))
    if args.write_detail:
        # no jax import here: only the server children touch the device
        # (a parent-side backend init can hang on a dead tunnel)
        out = os.path.join(REPO, "BENCH_DETAIL.json")
        merged = {}
        if os.path.exists(out):
            with open(out) as f:
                merged = json.load(f)
        entry = {"backend": "cpu" if args.cpu else "tpu",
                 "clients": args.clients,
                 "by_max_batch": {str(k): results[k] for k in mbs}}
        if ratio is not None:
            entry["speedup"] = round(ratio, 2)
        key = ("serve_generate_microbatch_ab"
               if args.endpoint == "generate" else "serve_microbatch_ab")
        merged[key] = entry
        with open(out, "w") as f:
            json.dump(merged, f, indent=2)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""--grad-accum A/B: what does microbatch gradient accumulation buy on
TPU?

Two measurements on the UNFROZEN ResNet-50 train step at 224px (the
memory-bound configuration):

1. max batch: largest power-of-two batch whose train step compiles AND
   executes, for K=1 (the fused full-batch backward) vs K=8 (scan over
   8 microbatches — only one microbatch's activations live at a time).
   --remat measured ZERO max-batch gain here (boundary activations
   dominate the block-internal ones it recomputes); grad accumulation
   shrinks the batch dimension itself, so the ceiling should scale ~K×.
2. step time at a shared batch: the cost of serializing the batch into
   K sequential microbatches (pipeline bubbles are nil — it is one
   scan — but smaller matmuls utilize the MXU less).

Usage: python tools/bench_grad_accum.py [--cpu] [--batch 256]
       [--image-size 224] [--max-pow 14] [--ks 1,4,8]

Prints a JSON summary; merge into BENCH_DETAIL.json by hand (entries
are environment-specific).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_step(k: int, batch: int, size: int, dtype):
    import jax
    import jax.numpy as jnp
    from xgan.models.resnet import ResNet50
    from xgan.train.classifier import classifier_optimizer, make_train_step
    from xgan.train.common import ModelState

    model = ResNet50(num_classes=2, dtype=dtype)
    tx = classifier_optimizer(1e-3, freeze_base=False)
    v = model.init(jax.random.key(0), jnp.zeros((2, size, size, 3)),
                   train=False)
    state = ModelState(params=v["params"], batch_stats=v["batch_stats"],
                       opt_state=tx.init(v["params"]))
    step = make_train_step(model, tx, mode="real", dtype=dtype,
                           grad_accum=k)
    rng = np.random.default_rng(0)
    # store sized to the batch: the u8 store is the dominant fixed HBM
    # cost at huge batches; keep it == batch so the search measures the
    # STEP's ceiling, not the store's
    images = jnp.asarray(rng.integers(0, 255, (batch, size, size, 3),
                                      np.uint8))
    labels = jnp.asarray(rng.integers(0, 2, (batch,)).astype(np.int32))
    dummy = jnp.zeros((1, size, size, 3), jnp.uint8)
    dummy_l = jnp.zeros((1,), jnp.int32)
    idx = jnp.arange(batch, dtype=jnp.int32)

    def run(state, i):
        return step(state, images, labels, dummy, dummy_l, idx,
                    jnp.float32(0.0), jax.random.key(i))

    return state, run


def try_batch(k: int, batch: int, size: int, dtype) -> bool:
    """True iff one train step at this batch compiles and runs."""
    import jax
    try:
        state, run = build_step(k, batch, size, dtype)
        state, losses, _, _ = run(state, 0)
        np.asarray(jax.device_get(losses))
        del state
        return True
    except Exception as e:  # RESOURCE_EXHAUSTED arrives as XlaRuntimeError
        msg = str(e)
        if ("RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
                or "Ran out of memory" in msg or "exceeds" in msg
                # the axon remote-compile service surfaces a compile-time
                # HBM OOM as an opaque HTTP 500 (see tools/bench_remat.py)
                or "tpu_compile_helper subprocess exit code" in msg):
            return False
        raise


def step_time(k: int, batch: int, size: int, dtype) -> float:
    """Chain-slope per-step seconds (states threaded; dedup-proof via
    per-step PRNG keys)."""
    import jax
    state, run = build_step(k, batch, size, dtype)

    def chain(state, n, base):
        t0 = time.time()
        out = None
        for t in range(n):
            state, out, _, _ = run(state, base + t)
        np.asarray(jax.device_get(out))
        return time.time() - t0, state

    _, state = chain(state, 2, 0)  # compile + warm
    slopes = []
    for r in range(3):
        t_short, state = chain(state, 2, 100 * r)
        t_long, state = chain(state, 10, 1000 * r)
        slopes.append((t_long - t_short) / 8)
    good = sorted(s for s in slopes if s > 0)
    assert good, f"all slopes non-positive: {slopes}"
    return good[len(good) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256,
                    help="shared batch for the step-time A/B")
    ap.add_argument("--ks", type=str, default="1,4,8")
    ap.add_argument("--min-pow", type=int, default=7,
                    help="max-batch search start (2^p)")
    ap.add_argument("--max-pow", type=int, default=14,
                    help="max-batch search cap (2^p)")
    ap.add_argument("--skip-max-batch", action="store_true")
    ap.add_argument("--skip-step-time", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    backend = jax.default_backend()
    dtype = jnp.float32 if backend == "cpu" else jnp.bfloat16
    size = args.image_size
    ks = [int(s) for s in args.ks.split(",")]
    out = {"backend": backend, "image_size": size,
           "dtype": dtype.__name__, "unfrozen": True}

    if not args.skip_step_time:
        for k in ks:
            t = step_time(k, args.batch, size, dtype)
            out[f"step_ms_k{k}_b{args.batch}"] = round(1e3 * t, 2)
            out[f"imgs_per_s_k{k}_b{args.batch}"] = round(args.batch / t, 1)
            print(f"[k={k}] step {out[f'step_ms_k{k}_b{args.batch}']} ms "
                  f"@ b{args.batch}", flush=True)

    if not args.skip_max_batch:
        for k in (ks[0], ks[-1]):
            best = 0
            for p in range(args.min_pow, args.max_pow + 1):
                b = 2 ** p
                if b % k:
                    continue
                ok = try_batch(k, b, size, dtype)
                print(f"[k={k}] batch {b}: {'ok' if ok else 'OOM'}",
                      flush=True)
                if not ok:
                    break
                best = b
            out[f"max_batch_k{k}"] = best

    out["note"] = ("grad accumulation serializes the batch into K "
                   "microbatches inside one program: activation memory "
                   "~1/K (the ceiling scales with K, unlike --remat "
                   "here), step time grows only if the microbatch "
                   "under-fills the MXU")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

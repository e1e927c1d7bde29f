#!/usr/bin/env python
"""--remat A/B: what does bottleneck-block rematerialization buy on TPU?

Two measurements on the UNFROZEN ResNet-50 train step at 224px (the
memory-bound configuration — frozen training's backward is DCE'd):

1. max batch: largest power-of-two batch whose train step compiles AND
   executes without RESOURCE_EXHAUSTED, with and without --remat. This
   is the headroom claim behind the flag.
2. step time at a shared batch: the FLOP cost of recomputing block
   activations in the backward pass (expected ~1.2-1.4x step time —
   worth it only when the bigger batch matters).

Usage: python tools/bench_remat.py [--cpu] [--batch 128]
       [--image-size 224] [--max-pow 13]

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


def build_step(remat: bool, batch: int, size: int, dtype,
               stages=(3, 4, 6, 3), scope="block"):
    import jax
    import jax.numpy as jnp
    from xgan.models.resnet import ResNet50
    from xgan.train.classifier import classifier_optimizer, make_train_step
    from xgan.train.common import ModelState

    model = ResNet50(num_classes=2, remat=remat, dtype=dtype,
                     stage_sizes=tuple(stages), remat_scope=scope)
    tx = classifier_optimizer(1e-3, freeze_base=False)
    v = model.init(jax.random.key(0), jnp.zeros((2, size, size, 3)),
                   train=False)
    state = ModelState(params=v["params"], batch_stats=v["batch_stats"],
                       opt_state=tx.init(v["params"]))
    step = make_train_step(model, tx, mode="real", dtype=dtype)
    rng = np.random.default_rng(0)
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


def try_batch(remat: bool, batch: int, size: int, dtype,
              stages=(3, 4, 6, 3), scope="block") -> bool:
    """True iff one train step at this batch compiles and runs."""
    import jax
    try:
        state, run = build_step(remat, batch, size, dtype, stages, scope)
        state, losses, _, _ = run(state, 0)
        np.asarray(jax.device_get(losses))
        del state
        return True
    except Exception as e:  # RESOURCE_EXHAUSTED arrives as XlaRuntimeError
        msg = str(e)
        if ("RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
                or "Ran out of memory" in msg or "exceeds" in msg
                # the axon remote-compile service surfaces a compile-time
                # HBM OOM as an opaque HTTP 500 (the 'Ran out of memory in
                # memory space hbm' detail only reaches stderr). In a
                # max-batch search where the previous power of two just
                # compiled, a compile-helper failure IS the OOM signal.
                or "tpu_compile_helper subprocess exit code" in msg):
            return False
        raise


def step_time(remat: bool, batch: int, size: int, dtype,
              stages=(3, 4, 6, 3), scope="block") -> float:
    """Chain-slope per-step seconds (states threaded; dedup-proof via
    per-step PRNG keys)."""
    import jax
    state, run = build_step(remat, batch, size, dtype, stages, scope)

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
    ap.add_argument("--batch", type=int, default=128,
                    help="shared batch for the step-time A/B")
    ap.add_argument("--min-pow", type=int, default=5,
                    help="max-batch search start (2^p)")
    ap.add_argument("--max-pow", type=int, default=13,
                    help="max-batch search cap (2^p)")
    ap.add_argument("--skip-max-batch", action="store_true")
    ap.add_argument("--scope", default="block",
                    choices=["block", "stage", "nested"],
                    help="remat granularity (stage = checkpoint whole "
                         "stages; drops the block-boundary activations "
                         "block scope keeps)")
    ap.add_argument("--stages", type=str, default="3,4,6,3",
                    help="bottleneck stage sizes (e.g. 3,4,23,3 = "
                         "ResNet-101 depth) — for pricing remat on "
                         "deeper backbones")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    backend = jax.default_backend()
    dtype = jnp.float32 if backend == "cpu" else jnp.bfloat16
    size = args.image_size
    stages = tuple(int(x) for x in args.stages.split(","))
    out = {"backend": backend, "image_size": size,
           "dtype": dtype.__name__, "unfrozen": True,
           "stages": list(stages), "scope": args.scope}

    for remat in (False, True):
        tag = "remat" if remat else "plain"
        t = step_time(remat, args.batch, size, dtype, stages,
                      args.scope)
        out[f"step_ms_{tag}_b{args.batch}"] = round(1e3 * t, 2)
        out[f"imgs_per_s_{tag}_b{args.batch}"] = round(args.batch / t, 1)
        print(f"[{tag}] step {out[f'step_ms_{tag}_b{args.batch}']} ms "
              f"@ b{args.batch}", flush=True)

    if not args.skip_max_batch:
        for remat in (False, True):
            tag = "remat" if remat else "plain"
            best = 0
            for p in range(args.min_pow, args.max_pow + 1):
                b = 2 ** p
                ok = try_batch(remat, b, size, dtype, stages,
                               args.scope)
                print(f"[{tag}] batch {b}: {'ok' if ok else 'OOM'}",
                      flush=True)
                if not ok:
                    break
                best = b
            out[f"max_batch_{tag}"] = best

    out["note"] = ("remat trades ~one extra forward of FLOPs for block-"
                   "local activation memory; use when batch/resolution "
                   "OOMs, not for speed")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

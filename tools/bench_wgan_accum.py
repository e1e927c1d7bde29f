#!/usr/bin/env python
"""WGAN-GP --grad-accum A/B on TPU: max batch + step time.

The WGAN-224 step is the most memory-hungry program in the repo (5
critic iterations, each holding the GP double-backward's activations).
``--grad-accum A`` serializes every critic/generator update into A
microbatches inside the one program, so only one microbatch's
activations are live — the effective-batch lever VERDICT r3 (next #6)
asked to be measured for the GAN trainers.

1. max batch: largest power-of-two batch whose fused step compiles AND
   runs, for A=1 vs A=8.
2. step time at a shared batch: the serialization cost.

Usage: python tools/bench_wgan_accum.py [--cpu] [--batch 64]
       [--image-size 224] [--accums 1,8] [--min-pow 5] [--max-pow 12]

Prints a JSON summary; merge into BENCH_DETAIL.json by hand.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_step(accum: int, batch: int, size: int, dtype,
               critic_iters: int = 5, trainer: str = "wgan"):
    import jax
    import jax.numpy as jnp
    from xgan.train.common import adam, create_state

    rng = np.random.default_rng(0)
    # store sized to the batch (see tools/bench_grad_accum.py note)
    images = jnp.asarray(rng.integers(0, 255, (batch, size, size, 3),
                                      np.uint8))
    idx = jnp.arange(batch, dtype=jnp.int32)
    k = jax.random.key(0)

    if trainer == "wgan":
        from xgan.models import wgan
        from xgan.train.wgan import make_wgan_step
        g_model = wgan.Generator(latent_dim=100, feature_maps=64,
                                 image_size=size, dtype=dtype)
        c_model = wgan.Critic(feature_maps=64, image_size=size,
                              dtype=dtype)
        g_tx = adam(2e-4, 0.5, beta2=0.9)
        c_tx = adam(2e-4, 0.5, beta2=0.9)
        g_state = create_state(g_model, g_tx, k, jnp.zeros((2, 100)),
                               train=False)
        c_state = create_state(c_model, c_tx, k,
                               jnp.zeros((2, size, size, 3)),
                               train=False)
        step = make_wgan_step(g_model, c_model, g_tx, c_tx,
                              latent_dim=100, critic_iters=critic_iters,
                              lambda_gp=10.0, dtype=dtype, donate=False,
                              grad_accum=accum)
        holder = {"g": g_state, "c": c_state}

        def run(i):
            holder["g"], holder["c"], d_losses, _ = step(
                holder["g"], holder["c"], images, idx, jax.random.key(i))
            return d_losses

        return holder, run

    if trainer == "dcgan":
        from xgan.models import dcgan
        from xgan.train.gan import make_dcgan_step
        g_model = dcgan.Generator(latent_dim=100, feature_maps=64,
                                  image_size=size, dtype=dtype)
        d_model = dcgan.Discriminator(feature_maps=64, image_size=size,
                                      dtype=dtype)
        g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
        g_state = create_state(g_model, g_tx, k, jnp.zeros((2, 100)),
                               train=False)
        d_state = create_state(d_model, d_tx, k,
                               jnp.zeros((2, size, size, 3)),
                               train=False)
        step = make_dcgan_step(g_model, d_model, g_tx, d_tx,
                               latent_dim=100, dtype=dtype,
                               donate=False, grad_accum=accum)
        holder = {"g": g_state, "d": d_state}

        def run(i):
            holder["g"], holder["d"], metrics = step(
                holder["g"], holder["d"], images, idx, jax.random.key(i))
            return metrics

        return holder, run

    raise ValueError(trainer)


def try_batch(accum: int, batch: int, size: int, dtype,
              trainer: str = "wgan") -> bool:
    import jax
    try:
        holder, run = build_step(accum, batch, size, dtype,
                                 trainer=trainer)
        out = run(0)
        np.asarray(jax.device_get(out))
        holder.clear()
        return True
    except Exception as e:
        msg = str(e)
        if ("RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
                or "Ran out of memory" in msg or "exceeds" in msg
                # axon surfaces compile-time HBM OOM as an opaque HTTP
                # 500 (see tools/bench_remat.py try_batch)
                or "tpu_compile_helper subprocess exit code" in msg):
            return False
        raise


def step_time(accum: int, batch: int, size: int, dtype,
              trainer: str = "wgan") -> float:
    import jax
    _, run = build_step(accum, batch, size, dtype, trainer=trainer)

    def chain(n, base):
        t0 = time.time()
        out = None
        for t in range(n):
            out = run(base + t)
        np.asarray(jax.device_get(out))
        return time.time() - t0

    chain(2, 0)  # compile + warm
    slopes = []
    for r in range(3):
        t_short = chain(2, 100 * r)
        t_long = chain(8, 1000 * r)
        slopes.append((t_long - t_short) / 6)
    good = sorted(s for s in slopes if s > 0)
    assert good, f"all slopes non-positive: {slopes}"
    return good[len(good) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=64,
                    help="shared batch for the step-time A/B (reference "
                         "WGAN default, train_wggan.py:138)")
    ap.add_argument("--accums", type=str, default="1,8")
    ap.add_argument("--min-pow", type=int, default=5)
    ap.add_argument("--max-pow", type=int, default=12)
    ap.add_argument("--skip-max-batch", action="store_true")
    ap.add_argument("--skip-step-time", action="store_true")
    ap.add_argument("--trainer", default="wgan",
                    choices=["wgan", "dcgan"])
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    backend = jax.default_backend()
    dtype = jnp.float32 if backend == "cpu" else jnp.bfloat16
    size = args.image_size
    accums = [int(s) for s in args.accums.split(",")]
    out = {"backend": backend, "image_size": size,
           "dtype": dtype.__name__, "trainer": args.trainer,
           "critic_iters": 5 if args.trainer == "wgan" else None}

    if not args.skip_step_time:
        for a in accums:
            t = step_time(a, args.batch, size, dtype, args.trainer)
            out[f"step_ms_a{a}_b{args.batch}"] = round(1e3 * t, 2)
            out[f"imgs_per_s_a{a}_b{args.batch}"] = round(args.batch / t, 1)
            print(f"[accum={a}] step {out[f'step_ms_a{a}_b{args.batch}']}"
                  f" ms @ b{args.batch}", flush=True)

    if not args.skip_max_batch:
        for a in (accums[0], accums[-1]):
            best = 0
            for p in range(args.min_pow, args.max_pow + 1):
                b = 2 ** p
                if b % a:
                    continue
                ok = try_batch(a, b, size, dtype, args.trainer)
                print(f"[accum={a}] batch {b}: {'ok' if ok else 'OOM'}",
                      flush=True)
                if not ok:
                    break
                best = b
            out[f"max_batch_a{a}"] = best

    print(json.dumps(out))


if __name__ == "__main__":
    main()

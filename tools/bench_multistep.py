#!/usr/bin/env python
"""Measure whether the real training dispatch loop is enqueue-bound, and
what --steps-per-call (K-step lax.scan dispatch) buys.

The epoch loops enqueue one jitted step per Python iteration and fetch
metrics once per epoch (gan_loop.py). On this environment each execute
goes through a remote tunnel RPC, so Python may not be able to enqueue
fast enough to keep the chip busy at small step times. This tool times
the ACTUAL loop pattern (N async dispatches -> one device_get) for K=1
vs the K-step scan program.

Usage: python tools/bench_multistep.py [--size 64] [--batch 128] [--k 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(mesh_ctx, dtype, size, batch, k):
    from xgan.models import dcgan
    from xgan.train.common import adam, create_state
    from xgan.train.gan import make_dcgan_step
    g_model = dcgan.Generator(latent_dim=100, feature_maps=64,
                              image_size=size, dtype=dtype)
    d_model = dcgan.Discriminator(feature_maps=64, image_size=size,
                                  dtype=dtype)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    key = jax.random.key(0)
    g_state = mesh_ctx.replicate(create_state(
        g_model, g_tx, key, jnp.zeros((2, 100)), train=False))
    d_state = mesh_ctx.replicate(create_state(
        d_model, d_tx, key, jnp.zeros((2, size, size, 3)), train=False))
    kwargs = dict(latent_dim=100, dtype=dtype,
                  batch_sharding=mesh_ctx.batch_sharding(4), donate=False)
    step = make_dcgan_step(g_model, d_model, g_tx, d_tx, **kwargs)
    multi = make_dcgan_step(g_model, d_model, g_tx, d_tx,
                            steps_per_call=k, **kwargs)
    n_store = 2048 if size <= 64 else 512
    images = mesh_ctx.replicate(jnp.asarray(
        np.random.default_rng(0).integers(
            0, 255, (n_store, size, size, 3), np.uint8)))
    return step, multi, g_state, d_state, images, n_store


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--steps", type=int, default=64,
                    help="total steps per timed loop")
    args = ap.parse_args()

    from xgan.parallel import create_mesh
    mesh_ctx = create_mesh()
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    step, multi, g_state, d_state, images, n_store = build(
        mesh_ctx, dtype, args.size, args.batch, args.k)
    base_key = jax.random.key(1)
    # Distinct rows per step, converted host->device per dispatch like the
    # real epoch loop (epoch_batches); identical rows would let XLA hoist
    # the gather out of the scan and flatter the multistep number.
    batches = (np.random.default_rng(3)
               .integers(0, n_store, (args.steps, args.batch), np.int64)
               .astype(np.int32))

    # distinct keys per rep: byte-identical replays across reps could be
    # deduplicated by the runtime (CLAUDE.md pitfall) and fake the min()
    def loop_single(n, rep):
        g, d = g_state, d_state
        key = jax.random.fold_in(base_key, rep)
        ms = []
        t0 = time.time()
        for i in range(n):
            g, d, m = step(g, d, images, jnp.asarray(batches[i]),
                           jax.random.fold_in(key, i))
            ms.append(m)
        np.asarray(jax.device_get(jnp.stack(ms)))
        return time.time() - t0

    def loop_multi(n, rep):
        g, d = g_state, d_state
        key = jax.random.fold_in(base_key, 100 + rep)
        ms = []
        t0 = time.time()
        for c in range(n // args.k):
            g, d, m = multi(
                g, d, images,
                jnp.asarray(batches[c * args.k:(c + 1) * args.k]),
                jnp.int32(c * args.k), key)
            ms.append(m)
        np.asarray(jax.device_get(jnp.concatenate(ms)))
        return time.time() - t0

    # warm/compile both
    loop_single(2, 999)
    loop_multi(args.k, 999)

    n = args.steps
    n_multi = (n // args.k) * args.k  # steps loop_multi actually runs
    t_single = min(loop_single(n, r) for r in range(3))
    t_multi = min(loop_multi(n, r) for r in range(3))

    out = {
        "size": args.size, "batch": args.batch, "k": args.k, "steps": n,
        "multi_steps": n_multi,
        "single_dispatch_sec_per_step": t_single / n,
        "single_dispatch_imgs_per_sec": n * args.batch / t_single,
        "multistep_sec_per_step": t_multi / n_multi,
        "multistep_imgs_per_sec": n_multi * args.batch / t_multi,
        "speedup": (t_single / n) / (t_multi / n_multi),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

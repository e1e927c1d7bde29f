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
       [--model dcgan|wgan|cgan]

--model extends the A/B to the WGAN-GP and CGAN trainers (VERDICT r2
next #7): same loop pattern, each trainer's own reference batch size by
default (wgan 64, cgan 32 — train_wggan.py:138, train_cgan.py:261).
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


def build(mesh_ctx, dtype, size, batch, k, model_kind="dcgan"):
    """Returns (call1, callk, n_store): signature-erased dispatchers
    call1(carry, idx, key) -> (carry, metrics) and
    callk(carry, idx_chunk, iters0, key) -> (carry, metrics)."""
    from xgan.train.common import adam, create_state
    key = jax.random.key(0)
    n_store = 2048 if size <= 64 else 512
    images = mesh_ctx.replicate(jnp.asarray(
        np.random.default_rng(0).integers(
            0, 255, (n_store, size, size, 3), np.uint8)))
    shard = mesh_ctx.batch_sharding(4)

    if model_kind == "dcgan":
        from xgan.models import dcgan
        from xgan.train.gan import make_dcgan_step
        g_model = dcgan.Generator(latent_dim=100, feature_maps=64,
                                  image_size=size, dtype=dtype)
        d_model = dcgan.Discriminator(feature_maps=64, image_size=size,
                                      dtype=dtype)
        g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
        g0 = mesh_ctx.replicate(create_state(
            g_model, g_tx, key, jnp.zeros((2, 100)), train=False))
        d0 = mesh_ctx.replicate(create_state(
            d_model, d_tx, key, jnp.zeros((2, size, size, 3)),
            train=False))
        kwargs = dict(latent_dim=100, dtype=dtype, batch_sharding=shard,
                      donate=False)
        step = make_dcgan_step(g_model, d_model, g_tx, d_tx, **kwargs)
        multi = make_dcgan_step(g_model, d_model, g_tx, d_tx,
                                steps_per_call=k, **kwargs)

        def call1(carry, idx, kk):
            g, d, m = step(carry[0], carry[1], images, idx, kk)
            return (g, d), m

        def callk(carry, chunk, it0, kk):
            g, d, m = multi(carry[0], carry[1], images, chunk, it0, kk)
            return (g, d), m

        return call1, callk, (g0, d0), n_store

    if model_kind == "wgan":
        from xgan.models import wgan
        from xgan.train.wgan import make_wgan_step
        g_model = wgan.Generator(latent_dim=100, feature_maps=64,
                                 image_size=size, dtype=dtype)
        c_model = wgan.Critic(feature_maps=64, image_size=size,
                              dtype=dtype)
        # betas (0.5, 0.9) — reference train_wggan.py:53-54
        g_tx, c_tx = adam(2e-4, 0.5, beta2=0.9), adam(2e-4, 0.5, beta2=0.9)
        g0 = mesh_ctx.replicate(create_state(
            g_model, g_tx, key, jnp.zeros((2, 100)), train=False))
        c0 = mesh_ctx.replicate(create_state(
            c_model, c_tx, key, jnp.zeros((2, size, size, 3)),
            train=False))
        kwargs = dict(latent_dim=100, critic_iters=5, lambda_gp=10.0,
                      dtype=dtype, batch_sharding=shard, donate=False)
        step = make_wgan_step(g_model, c_model, g_tx, c_tx, **kwargs)
        multi = make_wgan_step(g_model, c_model, g_tx, c_tx,
                               steps_per_call=k, **kwargs)

        def call1(carry, idx, kk):
            g, c, dl, gl = step(carry[0], carry[1], images, idx, kk)
            return (g, c), gl

        def callk(carry, chunk, it0, kk):
            g, c, dl, gl = multi(carry[0], carry[1], images, chunk, it0,
                                 kk)
            return (g, c), gl

        return call1, callk, (g0, c0), n_store

    if model_kind == "cgan":
        from xgan.models import cgan
        from xgan.models.vgg import VGG16Features
        from xgan.train.cgan import make_cgan_step
        g_model = cgan.Generator(latent_dim=100, feature_maps=32,
                                 image_size=size, dtype=dtype)
        d_model = cgan.Discriminator(feature_maps=32, image_size=size,
                                     dtype=dtype)
        vgg_model = VGG16Features(dtype=dtype)
        g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
        lab = jnp.zeros((2,), jnp.int32)
        g0 = mesh_ctx.replicate(create_state(
            g_model, g_tx, key, jnp.zeros((2, 100)), lab, train=False))
        d0 = mesh_ctx.replicate(create_state(
            d_model, d_tx, key, jnp.zeros((2, size, size, 3)), lab,
            train=False))
        vgg_params = mesh_ctx.replicate(vgg_model.init(
            key, jnp.zeros((1, size, size, 3)))["params"])
        labels_all = mesh_ctx.replicate(jnp.asarray(
            (np.arange(n_store) % 2).astype(np.int32)))
        kwargs = dict(latent_dim=100, dtype=dtype, batch_sharding=shard,
                      donate=False)
        step = make_cgan_step(g_model, d_model, vgg_model, g_tx, d_tx,
                              **kwargs)
        multi = make_cgan_step(g_model, d_model, vgg_model, g_tx, d_tx,
                               steps_per_call=k, **kwargs)

        def call1(carry, idx, kk):
            g, d, m = step(carry[0], carry[1], vgg_params, images,
                           labels_all, idx, jnp.int32(0), kk)
            return (g, d), m

        def callk(carry, chunk, it0, kk):
            g, d, m = multi(carry[0], carry[1], vgg_params, images,
                            labels_all, chunk, jnp.int32(0), it0, kk)
            return (g, d), m

        return call1, callk, (g0, d0), n_store

    raise ValueError(model_kind)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = the model's reference batch "
                         "(dcgan 128, wgan 64, cgan 32)")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--model", default="dcgan",
                    choices=("dcgan", "wgan", "cgan"))
    ap.add_argument("--steps", type=int, default=64,
                    help="total steps per timed loop")
    args = ap.parse_args()
    if not args.batch:
        args.batch = {"dcgan": 128, "wgan": 64, "cgan": 32}[args.model]

    from xgan.parallel import create_mesh
    mesh_ctx = create_mesh()
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    call1, callk, carry0, n_store = build(
        mesh_ctx, dtype, args.size, args.batch, args.k, args.model)
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
        carry = carry0
        key = jax.random.fold_in(base_key, rep)
        ms = []
        t0 = time.time()
        for i in range(n):
            carry, m = call1(carry, jnp.asarray(batches[i]),
                             jax.random.fold_in(key, i))
            ms.append(m)
        np.asarray(jax.device_get(jnp.stack(
            [jnp.atleast_1d(m) for m in ms])))
        return time.time() - t0

    def loop_multi(n, rep):
        carry = carry0
        key = jax.random.fold_in(base_key, 100 + rep)
        ms = []
        t0 = time.time()
        for c in range(n // args.k):
            carry, m = callk(
                carry, jnp.asarray(batches[c * args.k:(c + 1) * args.k]),
                jnp.int32(c * args.k), key)
            ms.append(m)
        np.asarray(jax.device_get(jnp.concatenate(
            [jnp.atleast_1d(m) for m in ms])))
        return time.time() - t0

    # warm/compile both
    loop_single(2, 999)
    loop_multi(args.k, 999)

    n = args.steps
    n_multi = (n // args.k) * args.k  # steps loop_multi actually runs
    t_single = min(loop_single(n, r) for r in range(3))
    t_multi = min(loop_multi(n, r) for r in range(3))

    out = {
        "model": args.model,
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

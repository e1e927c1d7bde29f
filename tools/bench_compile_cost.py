#!/usr/bin/env python
"""Cold-compile cost of the headline bench program vs scan trip count.

bench.py's K=8 scan program costs ~10 min to compile cold through this
backend (VERDICT r2 weak #7). This measures where that cost lives:
`jit(...).lower().compile()` wall time for steps_per_call in {1, 4, 8}.
Each variant uses a DIFFERENT per-run store size so the axon
server's cross-connection compile cache cannot serve a warm entry — the
measured times are genuinely cold.

If compile time is ~flat in K, the cost is the fused step itself on this
backend (a ceiling to document); if it scales with K, a smaller trip
count in bench.py buys most of it back.

Usage: python tools/bench_compile_cost.py [--size 64] [--batch 128]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--ks", default="1,4,8")
    args = ap.parse_args()

    from xgan.models import dcgan
    from xgan.parallel import create_mesh
    from xgan.train.common import adam, create_state
    from xgan.train.gan import make_dcgan_step

    mesh_ctx = create_mesh()
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    batch = mesh_ctx.pad_batch(args.batch)
    g_model = dcgan.Generator(latent_dim=100, feature_maps=64,
                              image_size=args.size, dtype=dtype)
    d_model = dcgan.Discriminator(feature_maps=64, image_size=args.size,
                                  dtype=dtype)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    key = jax.random.key(0)
    g_state = mesh_ctx.replicate(create_state(
        g_model, g_tx, key, jnp.zeros((2, 100)), train=False))
    d_state = mesh_ctx.replicate(create_state(
        d_model, d_tx, key, jnp.zeros((2, args.size, args.size, 3)),
        train=False))

    out = {"size": args.size, "batch": batch,
           "backend": jax.default_backend(), "compile_sec": {}}
    ks = [int(x) for x in args.ks.split(",")]
    for i, k in enumerate(ks):
        # distinct shape -> cache-cold program; the per-RUN offset keeps
        # the promise on re-runs too (the axon server caches compiles
        # across connections, so fixed sizes would measure warm compiles
        # labeled cold the second time)
        n_store = 3500 + (os.getpid() % 499) + 3 * i
        images = mesh_ctx.replicate(jnp.asarray(
            np.random.default_rng(0).integers(
                0, 255, (n_store, args.size, args.size, 3), np.uint8)))
        step = make_dcgan_step(g_model, d_model, g_tx, d_tx,
                               latent_dim=100, dtype=dtype,
                               batch_sharding=mesh_ctx.batch_sharding(4),
                               donate=False, steps_per_call=k)
        if k > 1:
            fake_args = (g_state, d_state, images,
                         jnp.zeros((k, batch), jnp.int32), jnp.int32(0),
                         key)
        else:
            fake_args = (g_state, d_state, images,
                         jnp.zeros((batch,), jnp.int32), key)
        t0 = time.time()
        lowered = step.lower(*fake_args)
        t_lower = time.time() - t0
        t0 = time.time()
        lowered.compile()
        t_compile = time.time() - t0
        out["compile_sec"][str(k)] = {
            "lower": round(t_lower, 2), "compile": round(t_compile, 2),
            "n_store": n_store}
        print(f"k={k}: lower {t_lower:.1f}s compile {t_compile:.1f}s",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

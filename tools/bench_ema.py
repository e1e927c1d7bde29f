#!/usr/bin/env python
"""Price --ema-decay: fused-lerp overhead on the real step.

The EMA update is one elementwise lerp over the generator param tree,
fused into the jitted training step (xgan/train/ema.py). The claim in
DESIGN.md is "effectively free" — this measures it instead of asserting
it: chain-slope timing (CLAUDE.md benching rules: states threaded
through timed calls, distinct rows+keys per rep) of the DCGAN-64 b128
K-step program with ema_decay=None vs 0.999.

Usage: python tools/bench_ema.py [--k 8] [--reps 3] [--cpu] [--json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMAGE_SIZE = 64
BATCH = 128
LATENT = 100
FEATURE_MAPS = 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from xgan.models import dcgan
    from xgan.parallel import create_mesh
    from xgan.train.common import adam, create_state
    from xgan.train.ema import init_ema
    from xgan.train.gan import make_dcgan_step

    backend = jax.default_backend()
    dtype = jnp.float32 if backend == "cpu" else jnp.bfloat16
    mesh_ctx = create_mesh()
    batch = mesh_ctx.pad_batch(BATCH)

    g_model = dcgan.Generator(latent_dim=LATENT, feature_maps=FEATURE_MAPS,
                              image_size=IMAGE_SIZE, dtype=dtype)
    d_model = dcgan.Discriminator(feature_maps=FEATURE_MAPS,
                                  image_size=IMAGE_SIZE, dtype=dtype)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    k0 = jax.random.key(0)
    g_state = mesh_ctx.replicate(create_state(
        g_model, g_tx, k0, jnp.zeros((2, LATENT)), train=False))
    d_state = mesh_ctx.replicate(create_state(
        d_model, d_tx, k0, jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3)),
        train=False))
    images = mesh_ctx.replicate(jnp.asarray(
        np.random.default_rng(0).integers(
            0, 255, (4096, IMAGE_SIZE, IMAGE_SIZE, 3), np.uint8)))
    base_key = jax.random.key(2)
    k = args.k

    def measure(ema_decay):
        step = make_dcgan_step(
            g_model, d_model, g_tx, d_tx, latent_dim=LATENT, dtype=dtype,
            batch_sharding=mesh_ctx.batch_sharding(4), donate=False,
            steps_per_call=k, ema_decay=ema_decay)
        rng = np.random.default_rng(1)
        st = {"g": g_state, "d": d_state,
              "e": init_ema(g_state.params) if ema_decay else None}

        def run(chunk_i):
            idx = jnp.asarray(rng.integers(0, 4096, (k, batch), np.int64)
                              .astype(np.int32))
            if ema_decay:
                st["g"], st["d"], st["e"], m = step(
                    st["g"], st["d"], st["e"], images, idx,
                    jnp.int32(chunk_i * k), base_key)
            else:
                st["g"], st["d"], m = step(st["g"], st["d"], images, idx,
                                           jnp.int32(chunk_i * k), base_key)
            return m

        def chain(n_chunks, base):
            m = None
            t0 = time.time()
            for c in range(n_chunks):
                m = run(base + c)
            np.asarray(jax.device_get(m))
            return time.time() - t0

        chain(2, 0)  # compile + warm
        on_cpu = backend == "cpu"
        n_short, extra = (1, 2) if on_cpu else (2, 10)
        n_long = n_short + extra
        slopes = []
        for rep in range(1 if on_cpu else args.reps):
            t_s = chain(n_short, 100 + 1000 * rep)
            t_l = chain(n_long, 200 + 1000 * rep)
            slopes.append(max((t_l - t_s) / (n_long - n_short) / k, 1e-9))
        slopes.sort()
        return slopes[len(slopes) // 2]

    t_plain = measure(None)
    print(f"# plain: {t_plain*1e3:.3f} ms/step", file=sys.stderr, flush=True)
    t_ema = measure(0.999)
    print(f"# ema:   {t_ema*1e3:.3f} ms/step", file=sys.stderr, flush=True)
    out = {"backend": backend, "k": k, "batch": batch,
           "sec_per_step_plain": round(t_plain, 6),
           "sec_per_step_ema": round(t_ema, 6),
           "ema_overhead_pct": round(100 * (t_ema / t_plain - 1), 2)}
    print(json.dumps(out) if args.json else
          f"{backend} k={k}: plain {t_plain*1e3:.3f} ms/step, "
          f"ema {t_ema*1e3:.3f} ms/step "
          f"({out['ema_overhead_pct']:+.2f}%)")


if __name__ == "__main__":
    main()

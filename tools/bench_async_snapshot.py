#!/usr/bin/env python
"""Measure what SnapshotManager(async_io=True) buys on this backend.

The GAN loops snapshot full train state (params + BN + Adam moments for
G and D) every --checkpoint-interval epochs. A synchronous save blocks
the training loop for the whole device->host transfer + file write; on
this environment the D2H path rides a ~2 MB/s tunnel relay, so the sync
stall is the dominant epoch-boundary cost. The async path pins the
bytes with an on-device copy and returns, the FIFO writer thread doing
the D2H + atomic write while the next epoch computes.

This times, on the real backend with the DCGAN default model sizes:
  sync_save_s   — wall time of SnapshotManager.save(async_io=False)
  async_save_s  — wall time of save(async_io=True) (loop-blocking cost)
  async_total_s — save + flush (the write still happens; it just
                  overlaps compute the sync path cannot)

Writes BENCH_DETAIL-ready JSON to stdout (one line, --json) or a human
table. Usage: python tools/bench_async_snapshot.py [--size 64]
[--reps 3] [--cpu]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from xgan.models import dcgan
    from xgan.parallel.mesh import create_mesh
    from xgan.train.common import adam, create_state
    from xgan.train.snapshot import SnapshotManager

    mesh_ctx = create_mesh()
    key = jax.random.key(0)
    g_model = dcgan.Generator(latent_dim=100, feature_maps=64,
                              image_size=args.size)
    d_model = dcgan.Discriminator(feature_maps=64, image_size=args.size)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    g = mesh_ctx.replicate(create_state(
        g_model, g_tx, key, jnp.zeros((2, 100)), train=False))
    d = mesh_ctx.replicate(create_state(
        d_model, d_tx, key, jnp.zeros((2, args.size, args.size, 3)),
        train=False))
    states = {"g": g, "d": d}
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(states)
                 if hasattr(x, "nbytes"))
    jax.block_until_ready((g.params, d.params))

    out = {"backend": jax.devices()[0].platform,
           "state_mb": round(nbytes / 2**20, 1), "reps": args.reps}
    with tempfile.TemporaryDirectory() as td:
        # warm both paths once (thread start, first D2H) before timing
        for async_io, k_save, k_total in ((False, "sync_save_s", None),
                                          (True, "async_save_s",
                                           "async_total_s")):
            mgr = SnapshotManager(os.path.join(td, "snap.msgpack"),
                                  mesh_ctx, async_io=async_io)
            mgr.save(states, 0, 0)
            mgr.flush()
            saves, totals = [], []
            for i in range(args.reps):
                t0 = time.perf_counter()
                mgr.save(states, i, i)
                saves.append(time.perf_counter() - t0)
                mgr.flush()
                totals.append(time.perf_counter() - t0)
            out[k_save] = round(min(saves), 4)
            if k_total:
                out[k_total] = round(min(totals), 4)
    out["loop_stall_ratio"] = round(out["sync_save_s"]
                                    / max(out["async_save_s"], 1e-9), 1)
    if args.json:
        print(json.dumps(out))
    else:
        print(f"backend={out['backend']} state={out['state_mb']} MB")
        print(f"sync save blocks the loop : {out['sync_save_s']:.3f} s")
        print(f"async save blocks the loop: {out['async_save_s']:.3f} s "
              f"({out['loop_stall_ratio']}x less)")
        print(f"async save+flush total    : {out['async_total_s']:.3f} s "
              f"(overlaps the next epoch's compute)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""ConvTranspose2d(k4,s2,p1) lowering shoot-out on the real TPU.

The dilated lowering multiplies 3/4 zeros (see xgan/ops/conv.py:
conv_transpose2d_phase); this measures whether XLA already elides the
redundancy on TPU or the phase decomposition is a real win, per G-224
layer shape at batch 128 bf16 (VERDICT r1 #2/#8: measure, don't assume).

Timing discipline (CLAUDE.md pitfalls): identical dispatches get
deduplicated by this remote runtime, so each measurement is a K-step
lax.scan whose iterations are data-dependent (x perturbed by 1e-30 * a
reduction of y), and successive CALLS chain x through the previous
call's output. Per-op time = call-slope / K.

Usage: python tools/bench_convt.py [--batch 128] [--grad]
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
from jax import lax

from tools.scan_timing import bench_op  # noqa: F401  (shared discipline)
from xgan.ops.conv import conv2d, conv_transpose2d, conv_transpose2d_phase

K = 16  # scan length per call (bench_grad below; bench_op takes k=)


def bench_grad(op, x, w, iters=6, reps=3):
    """Per-(fwd+bwd) seconds for d/d(x,w) of a NONLINEAR loss, same
    chaining. sum(y) is useless here: its dx is input-independent, so
    XLA hoists the whole backward out of the scan (observed: 0.0 ms
    rows). sum(y^2) keeps dx = 2*convT(y) dependent on x."""
    def loss(x_, w_):
        y = op(x_, w_).astype(jnp.float32)
        return jnp.sum(y * y)

    grad_fn = jax.grad(loss, argnums=(0, 1))

    def body(c, _):
        dx, dw = grad_fn(c, w)
        return c + (dx * 1e-30).astype(c.dtype), jnp.sum(dw)

    f = jax.jit(lambda x0: lax.scan(body, x0, None, length=K)[0])

    def chain(x0, n):
        t0 = time.time()
        for _ in range(n):
            x0 = f(x0)
        np.asarray(jax.device_get(jnp.sum(x0.astype(jnp.float32))))
        return time.time() - t0, x0

    _, x = chain(x, 1)
    slopes = []
    for _ in range(reps):
        t1, x = chain(x, 2)
        t2, x = chain(x, 2 + iters)
        slopes.append((t2 - t1) / iters)
    return max(float(np.median(slopes)) / K, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--grad", action="store_true")
    args = ap.parse_args()

    b = args.batch
    layers = [(7, 512, 256), (14, 256, 128), (28, 128, 64),
              (56, 64, 32), (112, 32, 3)]
    rng = np.random.default_rng(0)

    def dil(x, w):
        return conv_transpose2d(x, w, stride=2, padding=1)

    for h, cin, cout in layers:
        x = jnp.asarray(rng.normal(size=(b, h, h, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(4, 4, cin, cout)), jnp.bfloat16)
        t_dil = bench_op(dil, x, w)
        t_pha = bench_op(conv_transpose2d_phase, x, w)
        flops = 2 * 16 * h * h * cin * cout * b
        row = {"layer": f"{h}->{2*h} c{cin}->{cout}",
               "dilated_ms": round(t_dil * 1e3, 3),
               "phase_ms": round(t_pha * 1e3, 3),
               "speedup": round(t_dil / t_pha, 2),
               "dilated_tflops": round(flops / t_dil / 1e12, 1),
               "phase_tflops": round(flops / t_pha / 1e12, 1)}
        print(json.dumps(row), flush=True)
        if args.grad:
            t_gd = bench_grad(dil, x, w)
            t_gp = bench_grad(conv_transpose2d_phase, x, w)
            row.update({"dilated_grad_ms": round(t_gd * 1e3, 3),
                        "phase_grad_ms": round(t_gp * 1e3, 3),
                        "grad_speedup": round(t_gd / t_gp, 2)})
            print(json.dumps(row), flush=True)

    # D-side k4s2 conv: forward is minimal in XLA; its INPUT-gradient is a
    # dilated transposed conv -> compare autodiff vs the phase custom_vjp.
    from xgan.ops.conv import conv2d_k4s2
    for h, cin, cout in [(112, 32, 64), (56, 64, 128), (28, 128, 256),
                         (14, 256, 512)]:
        x = jnp.asarray(rng.normal(size=(b, h, h, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(4, 4, cin, cout)), jnp.bfloat16)

        def fwd(x_, w_):
            return conv2d(x_, w_, stride=2, padding=1)

        t_fwd = bench_op(fwd, x, w)
        row = {"layer": f"D {h}->{h//2} c{cin}->{cout}",
               "conv_ms": round(t_fwd * 1e3, 3)}
        if args.grad:
            t_g_lax = bench_grad(fwd, x, w)
            t_g_pha = bench_grad(conv2d_k4s2, x, w)
            row.update({"lax_grad_ms": round(t_g_lax * 1e3, 3),
                        "phase_vjp_grad_ms": round(t_g_pha * 1e3, 3),
                        "grad_speedup": round(t_g_lax / t_g_pha, 2)})
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

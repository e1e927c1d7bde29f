#!/usr/bin/env python
"""Pallas fused ConvT kernel vs the two XLA lowerings, on the real TPU.

Compiled-mode correctness first (vs lax), then scan-chained timing (see
tools/bench_convt.py discipline) per G-224 layer, b128 bf16. The fused
affine+relu epilogue rides along in the pallas timing — it replaces work
XLA would also fuse, so compare against dilated+affine+relu as well.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xgan.ops.conv import conv_transpose2d, conv_transpose2d_phase
from xgan.ops.pallas.convt import convt4x4s2_fused



from tools.scan_timing import bench_op  # noqa: E402  (shared discipline)


def main():
    b = 128
    rng = np.random.default_rng(0)
    layers = [(7, 512, 256), (14, 256, 128), (28, 128, 64),
              (56, 64, 32), (112, 32, 3)]

    for h, cin, cout in layers:
        x = jnp.asarray(rng.normal(size=(b, h, h, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(4, 4, cin, cout)), jnp.bfloat16)
        sc = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
        sh = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)

        # compiled correctness vs lax (bf16 tolerance)
        ref = np.asarray(conv_transpose2d(x, w, stride=2, padding=1),
                         np.float32)
        got = np.asarray(convt4x4s2_fused(x, w), np.float32)
        err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-6)
        row = {"layer": f"{h}->{2*h} c{cin}->{cout}",
               "rel_err_vs_lax": round(float(err), 5)}

        def dil(x_, w_):
            return conv_transpose2d(x_, w_, stride=2, padding=1)

        def dil_epi(x_, w_):
            y = dil(x_, w_).astype(jnp.float32)
            return jnp.maximum(y * sc + sh, 0.0).astype(x_.dtype)

        def pal(x_, w_):
            return convt4x4s2_fused(x_, w_)

        def pal_epi(x_, w_):
            return convt4x4s2_fused(x_, w_, sc, sh, act="relu")

        t_dil = bench_op(dil, x, w)
        t_pha = bench_op(conv_transpose2d_phase, x, w)
        t_pal = bench_op(pal, x, w)
        t_dile = bench_op(dil_epi, x, w)
        t_pale = bench_op(pal_epi, x, w)
        flops = 2 * 16 * h * h * cin * cout * b
        row.update({
            "dilated_ms": round(t_dil * 1e3, 3),
            "phase_xla_ms": round(t_pha * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "dilated_affine_relu_ms": round(t_dile * 1e3, 3),
            "pallas_fused_epi_ms": round(t_pale * 1e3, 3),
            "pallas_tflops": round(flops / t_pal / 1e12, 1),
            "pallas_vs_dilated": round(t_dil / t_pal, 2),
            "fused_vs_dilated_epi": round(t_dile / t_pale, 2),
        })
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

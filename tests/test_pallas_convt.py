"""Pallas fused ConvT(k4,s2,p1) kernel: interpret-mode correctness on CPU
(compiled path exercised by tools/bench_pallas_convt.py on hardware)."""
import jax.numpy as jnp
import numpy as np

from xgan.ops.conv import conv_transpose2d
from xgan.ops.pallas.convt import convt4x4s2_fused


def test_convt_kernel_matches_lax():
    rng = np.random.default_rng(0)
    for (b, h, cin, cout) in [(4, 7, 512, 8), (2, 8, 16, 8), (3, 5, 6, 4)]:
        x = jnp.asarray(rng.normal(size=(b, h, h, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(4, 4, cin, cout))
                        .astype(np.float32))
        ref = np.asarray(conv_transpose2d(x, w, stride=2, padding=1))
        got = np.asarray(convt4x4s2_fused(x, w, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_convt_kernel_fused_epilogue():
    rng = np.random.default_rng(1)
    b, h, cin, cout = 2, 6, 12, 8
    x = jnp.asarray(rng.normal(size=(b, h, h, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, cin, cout)).astype(np.float32))
    sc = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    sh = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    ref = np.asarray(conv_transpose2d(x, w, stride=2, padding=1))

    relu = np.maximum(ref * np.asarray(sc) + np.asarray(sh), 0)
    got = np.asarray(convt4x4s2_fused(x, w, sc, sh, act="relu",
                                      interpret=True))
    np.testing.assert_allclose(got, relu, rtol=2e-4, atol=2e-4)

    z = ref * np.asarray(sc) + np.asarray(sh)
    lrelu = np.where(z >= 0, z, 0.2 * z)
    got = np.asarray(convt4x4s2_fused(x, w, sc, sh, act="leaky_relu",
                                      interpret=True))
    np.testing.assert_allclose(got, lrelu, rtol=2e-4, atol=2e-4)


def test_convt_kernel_batch_blocking():
    rng = np.random.default_rng(2)
    b, h, cin, cout = 8, 4, 6, 5
    x = jnp.asarray(rng.normal(size=(b, h, h, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, cin, cout)).astype(np.float32))
    ref = np.asarray(conv_transpose2d(x, w, stride=2, padding=1))
    for bb in (1, 2, 4, 8):
        got = np.asarray(convt4x4s2_fused(x, w, block_b=bb,
                                          interpret=True))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

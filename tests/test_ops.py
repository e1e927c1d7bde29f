"""Geometry + numerics golden tests for the conv/BN primitives.

The 7->14->28->56->112->224 ladder (reference dcgan.py:26-47) is the
mandatory shape contract (SURVEY.md §7 hard part No.7); BN semantics are
checked against hand-computed torch formulas.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.ops import (batch_norm_infer, batch_norm_train, conv2d,
                      conv_transpose2d)


def test_conv_k4s2p1_halves():
    x = jnp.zeros((2, 224, 224, 3))
    w = jnp.zeros((4, 4, 3, 8))
    assert conv2d(x, w, stride=2, padding=1).shape == (2, 112, 112, 8)


def test_conv_k7s1p0_valid():
    x = jnp.zeros((2, 7, 7, 16))
    w = jnp.zeros((7, 7, 16, 1))
    assert conv2d(x, w, stride=1, padding=0).shape == (2, 1, 1, 1)


def test_conv_k3s1p1_same():
    x = jnp.zeros((2, 56, 56, 8))
    w = jnp.zeros((3, 3, 8, 8))
    assert conv2d(x, w, stride=1, padding=1).shape == (2, 56, 56, 8)


@pytest.mark.parametrize("hin,hout", [(1, 7)])
def test_convt_k7s1p0(hin, hout):
    x = jnp.zeros((2, hin, hin, 100))
    w = jnp.zeros((7, 7, 100, 512))
    y = conv_transpose2d(x, w, stride=1, padding=0)
    assert y.shape == (2, hout, hout, 512)


@pytest.mark.parametrize("hin", [7, 14, 28, 56, 112])
def test_convt_k4s2p1_doubles(hin):
    x = jnp.zeros((2, hin, hin, 8))
    w = jnp.zeros((4, 4, 8, 4))
    y = conv_transpose2d(x, w, stride=2, padding=1)
    assert y.shape == (2, 2 * hin, 2 * hin, 4)


def test_convt_matches_torch_geometry():
    """Numerical check against torch.nn.functional.conv_transpose2d."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, 5, 3)).astype(np.float32)
    w = rng.normal(size=(4, 4, 3, 6)).astype(np.float32)

    ours = np.asarray(conv_transpose2d(jnp.asarray(x), jnp.asarray(w),
                                       stride=2, padding=1))

    # torch wants NCHW input and (Cin, Cout, kh, kw) weights; torch's
    # conv_transpose uses the un-flipped kernel where our lhs-dilated conv
    # uses a flipped one — flip to compare geometry AND numerics.
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    wt = torch.from_numpy(np.transpose(w[::-1, ::-1].copy(), (2, 3, 0, 1)))
    ref = torch.nn.functional.conv_transpose2d(xt, wt, stride=2, padding=1)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_batch_norm_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 3, 3, 5)).astype(np.float32) * 2 + 1

    scale = np.ones(5, np.float32) * 1.5
    bias = np.ones(5, np.float32) * 0.25
    rm, rv = np.zeros(5, np.float32), np.ones(5, np.float32)

    y, nm, nv = batch_norm_train(jnp.asarray(x), jnp.asarray(scale),
                                 jnp.asarray(bias), jnp.asarray(rm),
                                 jnp.asarray(rv))

    bn = torch.nn.BatchNorm2d(5)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
    bn.train()
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    yt = bn(xt).detach().numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nm), bn.running_mean.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nv), bn.running_var.numpy(),
                               rtol=1e-4, atol=1e-5)

    # eval mode uses running stats
    bn.eval()
    y2 = batch_norm_infer(jnp.asarray(x), jnp.asarray(scale),
                          jnp.asarray(bias), jnp.asarray(nm), jnp.asarray(nv))
    yt2 = bn(xt).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y2), yt2, rtol=1e-4, atol=1e-4)


def test_convt_phase_matches_dilated():
    """conv_transpose2d_phase (4 k2s1 phase convs + interleave; kept as
    the XGAN_PHASE=1 opt-in after the step-level A/B showed this libtpu
    already lowers the dilated form at ~peak — tools/bench_phase_ab.py)
    is numerically the dilated lowering, across layer shapes and odd
    sizes."""
    from xgan.ops.conv import conv_transpose2d_phase
    rng = np.random.default_rng(0)
    for (h, cin, cout) in [(7, 512, 8), (5, 16, 8), (3, 3, 4), (8, 32, 16)]:
        x = jnp.asarray(rng.normal(size=(2, h, h, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(4, 4, cin, cout)).astype(np.float32))
        a = np.asarray(conv_transpose2d(x, w, stride=2, padding=1))
        b = np.asarray(conv_transpose2d_phase(x, w))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_convt_phase_gradients_match_dilated():
    """Autodiff through the phase form == autodiff through the dilated
    form (both w.r.t. x and w)."""
    from xgan.ops.conv import conv_transpose2d_phase
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 5)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 5, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 12, 12, 3)).astype(np.float32))

    f1 = lambda x, w: jnp.vdot(conv_transpose2d(x, w, stride=2, padding=1), g)
    f2 = lambda x, w: jnp.vdot(conv_transpose2d_phase(x, w), g)
    gx1, gw1 = jax.grad(f1, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(f2, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-4, atol=1e-4)


def test_conv2d_k4s2_custom_vjp_matches_autodiff():
    """conv2d_k4s2 (phase-decomposed input-gradient) == lax autodiff:
    forward bit-exact, dx/dw to f32 reassociation tolerance."""
    from xgan.ops.conv import conv2d_k4s2
    rng = np.random.default_rng(2)
    for (h, cin, cout) in [(8, 16, 8), (14, 6, 10)]:
        x = jnp.asarray(rng.normal(size=(2, h, h, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(4, 4, cin, cout)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(2, h // 2, h // 2, cout))
                        .astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(conv2d_k4s2(x, w)),
            np.asarray(conv2d(x, w, stride=2, padding=1)))
        f1 = lambda x, w: jnp.vdot(conv2d(x, w, stride=2, padding=1), g)
        f2 = lambda x, w: jnp.vdot(conv2d_k4s2(x, w), g)
        gx1, gw1 = jax.grad(f1, argnums=(0, 1))(x, w)
        gx2, gw2 = jax.grad(f2, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                                   rtol=1e-4, atol=1e-4)


def test_layer_phase_optin_matches_default():
    """The XGAN_PHASE=1 opt-in path through Conv/ConvTranspose produces
    the same numbers as the default dilated path (the flag only selects
    the lowering; tools/bench_phase_ab.py is the perf arbiter)."""
    import xgan.models.layers as L
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(2, 4, 4, 6)).astype(np.float32))
    conv = L.Conv(features=5, kernel=4, stride=2, padding=1,
                  phase_grad=True)
    convt = L.ConvTranspose(features=5, kernel=4, stride=2, padding=1)
    pc = conv.init(jax.random.key(0), x)
    pt = convt.init(jax.random.key(1), z)
    orig = L._PHASE_ENABLED
    try:
        L._PHASE_ENABLED = False
        y_conv_a, y_convt_a = conv.apply(pc, x), convt.apply(pt, z)
        L._PHASE_ENABLED = True
        y_conv_b, y_convt_b = conv.apply(pc, x), convt.apply(pt, z)
    finally:
        L._PHASE_ENABLED = orig
    np.testing.assert_allclose(np.asarray(y_conv_a), np.asarray(y_conv_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_convt_a), np.asarray(y_convt_b),
                               rtol=1e-5, atol=1e-5)

"""--remat (activation rematerialization) must be a pure memory/FLOP
trade: the remat'd ResNet-50 computes IDENTICAL numbers — forward
logits, parameter gradients, BN running-stat updates, masked-BN path —
it only changes what the backward pass keeps in HBM. The reference has
no counterpart (torch would use torch.utils.checkpoint); this is the
jax.checkpoint batch-headroom lever from the TPU playbook."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.models.resnet import ResNet50
from xgan.train.classifier import classifier_optimizer, make_train_step
from xgan.train.common import ModelState


def _models(scope="block"):
    m0 = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1))
    m1 = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1), remat=True,
                  remat_scope=scope)
    v = m0.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    return m0, m1, v


@pytest.mark.parametrize("scope", ["block", "stage", "nested"])
def test_remat_param_tree_identical(scope):
    """Checkpoints interop: remat must not rename/move any variable —
    including stage scope, whose lifted function creates the blocks
    inside the checkpoint region but names them into the module's flat
    layer{s}_{b} scope."""
    m0, m1, v = _models(scope)
    v1 = m1.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v1))
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("scope", ["block", "stage", "nested"])
def test_remat_forward_grads_stats_identical(scope):
    m0, m1, v = _models(scope)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32, 32, 3)),
                    jnp.float32)

    def loss(m, params):
        logits, upd = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(logits ** 2), (logits, upd["batch_stats"])

    (l0, (lg0, s0)), g0 = jax.value_and_grad(
        lambda p: loss(m0, p), has_aux=True)(v["params"])
    (l1, (lg1, s1)), g1 = jax.value_and_grad(
        lambda p: loss(m1, p), has_aux=True)(v["params"])
    np.testing.assert_array_equal(np.asarray(lg0), np.asarray(lg1))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s0),
                    jax.tree_util.tree_leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_remat_masked_grads_identical():
    """Eager (un-jitted) masked backward: bitwise-level parity — the
    masked-BN vjp through remat'd blocks is the riskiest custom path."""
    m0, m1, v = _models()
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 32, 32, 3)),
                    jnp.float32)
    mask = jnp.asarray([1, 1, 1, 0], jnp.float32)

    def loss(m, params):
        logits, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mask=mask, mutable=["batch_stats"])
        return jnp.sum((logits * mask[:, None]) ** 2)

    g0 = jax.grad(lambda p: loss(m0, p))(v["params"])
    g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_remat_masked_train_step_identical():
    """Through the real jitted train step, tail mask included."""
    m0, m1, v = _models()

    def run(model):
        tx = classifier_optimizer(1e-3, freeze_base=False)
        # fresh buffers per run: the jitted step donates the state, so
        # sharing v's arrays across runs would leave deleted buffers
        fresh = jax.tree_util.tree_map(jnp.array, v)
        state = ModelState(params=fresh["params"],
                           batch_stats=fresh["batch_stats"],
                           opt_state=tx.init(fresh["params"]))
        step = make_train_step(model, tx, mode="real")
        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.integers(0, 255, (16, 32, 32, 3),
                                          np.uint8))
        labels = jnp.asarray(rng.integers(0, 2, (16,)).astype(np.int32))
        dummy = jnp.zeros((1, 32, 32, 3), jnp.uint8)
        dummy_l = jnp.zeros((1,), jnp.int32)
        mask = jnp.asarray([1.0] * 6 + [0.0] * 2, jnp.float32)
        state, losses, preds, lb = step(
            state, images, labels, dummy, dummy_l,
            jnp.arange(8, dtype=jnp.int32), jnp.float32(0.0),
            jax.random.key(2), mask=mask)
        return (np.asarray(jax.device_get(losses)),
                jax.device_get(state.params))

    l0, p0 = run(m0)
    l1, p1 = run(m1)
    # Under jit the remat'd HLO fuses differently, so reductions reorder
    # (~5e-6 observed on losses); post-Adam params then carry the ±lr
    # envelope for near-zero-gradient coordinates (see tests/test_tp.py).
    # The EAGER test above pins grads/stats to 1e-7 — this one pins the
    # jitted+masked step end-to-end.
    np.testing.assert_allclose(l0, l1, rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2.5e-3)

"""--shard-opt-state (ZeRO-1) correctness: sharding Adam's mu/nu across
the whole mesh must change WHERE the moments live, not what any update
computes. Moments never feed a matmul — the update is elementwise — so
GSPMD slices the all-reduced gradient locally and all-gathers the delta.
The layout annotation does reshape how GSPMD schedules the backward, so
reductions reorder at f32 noise level — semantics identical, bits not
(see the per-test tolerance notes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from xgan.models.resnet import ResNet50
from xgan.parallel import create_mesh
from xgan.parallel.tp import shard_opt_state, shard_over_model
from xgan.train.classifier import classifier_optimizer, make_train_step
from xgan.train.common import ModelState

MIN_F = 64


def _make_state():
    model = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1))
    v = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)),
                   train=False)
    tx = classifier_optimizer(1e-3, freeze_base=False)
    return model, tx, ModelState(params=v["params"],
                                 batch_stats=v["batch_stats"],
                                 opt_state=tx.init(v["params"]))


def _run(mesh_ctx, *, zero1: bool, steps: int = 3):
    model, tx, state = _make_state()
    state = mesh_ctx.replicate(state)
    if zero1:
        state = shard_opt_state(mesh_ctx, state, min_features=MIN_F)
    bsh = mesh_ctx.batch_sharding(4)
    step = make_train_step(model, tx, mode="real", batch_sharding=bsh)
    rng = np.random.default_rng(0)
    images = mesh_ctx.replicate(jnp.asarray(
        rng.integers(0, 255, (64, 32, 32, 3), np.uint8)))
    labels = mesh_ctx.replicate(jnp.asarray(
        rng.integers(0, 2, (64,)).astype(np.int32)))
    dummy = mesh_ctx.replicate(jnp.zeros((1, 32, 32, 3), jnp.uint8))
    dummy_l = mesh_ctx.replicate(jnp.zeros((1,), jnp.int32))
    losses = []
    for i in range(steps):
        idx = jnp.asarray((np.arange(16) + 16 * i) % 64, jnp.int32)
        state, per_loss, _, _ = step(state, images, labels, dummy,
                                     dummy_l, idx, jnp.float32(0.0),
                                     jax.random.key(100 + i))
        losses.append(np.asarray(jax.device_get(per_loss)))
    return np.stack(losses), jax.device_get(state)


def test_zero1_matches_replicated():
    """Same mesh, same steps, moments sharded vs replicated. The moment
    layout annotation propagates into how GSPMD schedules the backward,
    so dW reductions reorder at the ~1e-7 level and Adam amplifies a few
    near-zero-gradient coordinates toward the ±lr envelope (measured
    max 6e-5 over 3 steps at lr=1e-3, 0.17% of coordinates) — losses
    stay tight, params carry the envelope (see tests/test_tp.py)."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    mesh = create_mesh(devices=devs[:8])
    l0, s0 = _run(mesh, zero1=False)
    l1, s1 = _run(mesh, zero1=True)
    np.testing.assert_allclose(l0, l1, rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2.5e-3)


def test_zero1_moments_actually_sharded():
    """Wide moments hold 1/8 of the leaf per device, stay sharded across
    steps, and narrow leaves (fc bias moment, Adam count) replicate."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    mesh_ctx = create_mesh(devices=devs[:8])
    model, tx, state = _make_state()
    state = mesh_ctx.replicate(state)
    state = shard_opt_state(mesh_ctx, state, min_features=MIN_F)

    def wide_moment(st):
        # optax.adam state: (ScaleByAdamState(count, mu, nu), ...)
        return st.opt_state[0].mu["layer4_0"]["conv3"]["kernel"]

    m = wide_moment(state)
    # spec check: GSPMD may normalize ('model','data') (model axis size
    # 1 here) to plain 'data' — assert the SHARD SIZE, which is the
    # memory claim, and accept either spec spelling.
    assert (m.addressable_shards[0].data.shape[3] == m.shape[3] // 8), \
        m.sharding.spec
    count = state.opt_state[0].count
    assert count.sharding.spec == P(), count.sharding.spec

    step = make_train_step(model, tx, mode="real",
                           batch_sharding=mesh_ctx.batch_sharding(4))
    images = mesh_ctx.replicate(jnp.zeros((32, 32, 32, 3), jnp.uint8))
    labels = mesh_ctx.replicate(jnp.zeros((32,), jnp.int32))
    dummy = mesh_ctx.replicate(jnp.zeros((1, 32, 32, 3), jnp.uint8))
    dummy_l = mesh_ctx.replicate(jnp.zeros((1,), jnp.int32))
    state, _, _, _ = step(state, images, labels, dummy, dummy_l,
                          jnp.arange(16, dtype=jnp.int32),
                          jnp.float32(0.0), jax.random.key(1))
    m = wide_moment(state)
    assert (m.addressable_shards[0].data.shape[3] == m.shape[3] // 8), \
        ("re-replicated after one step", m.sharding.spec)


def test_zero1_composes_with_tp():
    """--model-parallel 2 --shard-opt-state: params shard over 'model',
    wide moments over the whole mesh; the step still matches 1-dev at
    the strict pre-update tolerance (first-step losses)."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    l1, _ = _run(create_mesh(devices=devs[:1]), zero1=False, steps=1)

    mesh_ctx = create_mesh(devices=devs[:8], model_parallel=2)
    model, tx, state = _make_state()
    state = shard_over_model(mesh_ctx, state, min_features=MIN_F)
    state = shard_opt_state(mesh_ctx, state, min_features=MIN_F)
    step = make_train_step(model, tx, mode="real",
                           batch_sharding=mesh_ctx.batch_sharding(4))
    rng = np.random.default_rng(0)
    images = mesh_ctx.replicate(jnp.asarray(
        rng.integers(0, 255, (64, 32, 32, 3), np.uint8)))
    labels = mesh_ctx.replicate(jnp.asarray(
        rng.integers(0, 2, (64,)).astype(np.int32)))
    dummy = mesh_ctx.replicate(jnp.zeros((1, 32, 32, 3), jnp.uint8))
    dummy_l = mesh_ctx.replicate(jnp.zeros((1,), jnp.int32))
    state, per_loss, _, _ = step(state, images, labels, dummy, dummy_l,
                                 jnp.arange(16, dtype=jnp.int32),
                                 jnp.float32(0.0), jax.random.key(100))
    np.testing.assert_allclose(l1[0], np.asarray(jax.device_get(per_loss)),
                               rtol=2e-4, atol=2e-5)

"""Scaling-flag COMPOSITION correctness.

Each scaling lever is equality-pinned in isolation (tests/test_tp.py,
test_zero1.py, test_grad_accum.py, test_remat.py), but a production run
turns them on TOGETHER: `--model-parallel 2 --shard-opt-state
--grad-accum K --remat`. The composed program exercises interactions
none of the isolated tests reach — TP-sharded params flowing through
the grad-accum microbatch scan, ZeRO moment layouts updated from
scanned gradients, remat'd bottlenecks recomputing under GSPMD
partitioning — so this file pins: composed (data=4, model=2) ==
single-device plain, for the classifier step wired exactly as
classifier_loop.train_one_run wires it (classifier_loop.py:217-252).

The reference has no counterpart (single-device; SURVEY.md §2.3); these
flags are the rebuild's scaling story and must not drift apart.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.models.resnet import ResNet50
from xgan.parallel import create_mesh
from xgan.parallel.tp import shard_opt_state, shard_over_model
from xgan.train.classifier import (classifier_optimizer, make_eval_step,
                                   make_train_step)
from xgan.train.common import ModelState

MIN_F = 64  # shards the 32px test ResNet's wide tail (see test_tp.py)


def _run(mesh_ctx, *, composed: bool, freeze_base: bool, steps: int,
         grad_accum: int = 2):
    """One classifier training config; `composed=True` = TP + ZeRO +
    remat + grad-accum on an 8-device (data=4, model=2) mesh,
    `composed=False` = the plain replicated single-device program.
    grad-accum stays ON in both (it changes BN semantics by design —
    per-microbatch batch stats — so it must match itself, while
    TP/ZeRO/remat are pure layout/schedule changes)."""
    model = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1),
                     remat=composed)
    variables = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)),
                           train=False)
    tx = classifier_optimizer(1e-3, freeze_base=freeze_base)
    state = ModelState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    if composed:
        state = shard_over_model(mesh_ctx, state, min_features=MIN_F)
        state = shard_opt_state(mesh_ctx, state, min_features=MIN_F)
    else:
        state = mesh_ctx.replicate(state)
    bsh = mesh_ctx.batch_sharding(4)
    step = make_train_step(model, tx, mode="real", batch_sharding=bsh,
                           grad_accum=grad_accum)
    eval_step = make_eval_step(model, batch_sharding=bsh)

    rng = np.random.default_rng(3)
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
    ev = eval_step(state.variables(), images,
                   jnp.arange(16, dtype=jnp.int32), labels)
    return (np.stack(losses), jax.device_get(state),
            [np.asarray(jax.device_get(e)) for e in ev])


@pytest.mark.parametrize("freeze_base", [True, False])
def test_composed_flags_match_single_device(freeze_base):
    """TP(2) + ZeRO-1 + remat + grad-accum(2) on (data=4, model=2) ==
    plain 1-device. Frozen: 3 steps (stable fc-only trajectory pins the
    multi-step composed dispatch); unfrozen: 1 step (multi-step unfrozen
    comparison is chaos-amplified at f32, see test_tp.py). Step-i losses
    are computed BEFORE update i lands, so step-1 loss is layout-free
    and tight; everything post-Adam carries the ±lr near-zero-gradient
    envelope widened by remat's different fusion schedule (~5e-6 under
    jit, tests/test_remat.py) on top of TP/ZeRO reduction reordering."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    steps = 3 if freeze_base else 1
    l1, s1, e1 = _run(create_mesh(devices=devs[:1]), composed=False,
                      freeze_base=freeze_base, steps=steps)
    l8, s8, e8 = _run(create_mesh(devices=devs[:8], model_parallel=2),
                      composed=True, freeze_base=freeze_base, steps=steps)
    np.testing.assert_allclose(l1[0], l8[0], rtol=5e-4, atol=5e-5)
    post_tol = (dict(rtol=1e-3, atol=1e-3) if freeze_base
                else dict(rtol=5e-3, atol=3e-3))
    np.testing.assert_allclose(l1, l8, **post_tol)
    for a, b in zip(e1, e8):
        np.testing.assert_allclose(a, b, **post_tol)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=3e-3)


def test_composed_layouts_stick_across_steps():
    """After a composed step, TP'd params AND ZeRO'd Adam moments must
    come back still sharded — a silent re-replication inside the
    grad-accum scan would defeat both flags' memory purpose while
    producing correct numbers (so only a layout assertion catches it)."""
    from jax.sharding import PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    mesh_ctx = create_mesh(devices=devs[:8], model_parallel=2)
    model = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1), remat=True)
    variables = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)),
                           train=False)
    tx = classifier_optimizer(1e-3, freeze_base=False)
    state = ModelState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    state = shard_over_model(mesh_ctx, state, min_features=MIN_F)
    state = shard_opt_state(mesh_ctx, state, min_features=MIN_F)

    def layouts(st):
        k = st.params["layer4_0"]["conv3"]["kernel"]
        mu = st.opt_state[0].mu["layer4_0"]["conv3"]["kernel"]
        return k, mu

    k0, mu0 = layouts(state)
    assert k0.sharding.spec == P(None, None, None, "model")
    # ZeRO: the moment shards over BOTH axes (8-way on the O dim);
    # GSPMD may normalize the spec spelling, so assert shard SIZES
    assert mu0.addressable_shards[0].data.shape[3] == mu0.shape[3] // 8

    step = make_train_step(model, tx, mode="real",
                           batch_sharding=mesh_ctx.batch_sharding(4),
                           grad_accum=2)
    images = mesh_ctx.replicate(jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 32, 3),
                                          np.uint8)))
    labels = mesh_ctx.replicate(jnp.zeros((32,), jnp.int32))
    dummy = mesh_ctx.replicate(jnp.zeros((1, 32, 32, 3), jnp.uint8))
    dummy_l = mesh_ctx.replicate(jnp.zeros((1,), jnp.int32))
    state, _, _, _ = step(state, images, labels, dummy, dummy_l,
                          jnp.arange(16, dtype=jnp.int32),
                          jnp.float32(0.0), jax.random.key(1))
    k1, mu1 = layouts(state)
    # Assert shard SIZES, not spec spelling: GSPMD propagates the ZeRO'd
    # moments' layout through `params + updates`, so the updated kernel
    # legitimately comes back MORE sharded — P(..., ('model','data')),
    # 8-way — than its TP placement. The property under test is only
    # that nothing re-replicates (O-dim shard strictly smaller than O).
    assert (k1.addressable_shards[0].data.shape[3]
            <= k1.shape[3] // 2), k1.sharding.spec
    assert mu1.addressable_shards[0].data.shape[3] == mu1.shape[3] // 8

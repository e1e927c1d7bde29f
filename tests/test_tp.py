"""Model-axis (tensor) parallelism correctness.

The mesh's second axis ("model") shards the widest layers' params /
optimizer moments / BN statistics (xgan/parallel/tp.py). The load-bearing
property: a (data=D, model=M) run must produce the SAME numbers as the
1-device run — GSPMD's collectives are a layout change, not a math change.
The reference has no counterpart (single-device, SURVEY.md §2.3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from xgan.models.resnet import ResNet50
from xgan.parallel import create_mesh
from xgan.parallel.tp import (model_axis_spec, model_sharding_tree,
                              shard_over_model)
from xgan.train.classifier import (classifier_optimizer, make_eval_step,
                                   make_train_step)
from xgan.train.common import ModelState

MIN_F = 64  # test-size threshold: shards the 32px ResNet's wide tail


def test_model_axis_spec_rules():
    m = 2
    # conv kernel HWIO: shard O when wide+divisible
    assert model_axis_spec((1, 1, 256, 512), m, 64) == P(None, None, None,
                                                         "model")
    assert model_axis_spec((7, 7, 3, 64), m, 256) == P()      # narrow
    assert model_axis_spec((3, 3, 16, 65), m, 64) == P()      # indivisible
    # dense (I, O): row-parallel on I
    assert model_axis_spec((2048, 2), m, 64) == P("model", None)
    assert model_axis_spec((8, 2), m, 64) == P()
    # per-channel vectors
    assert model_axis_spec((512,), m, 64) == P("model")
    assert model_axis_spec((2,), m, 64) == P()
    assert model_axis_spec((), m, 64) == P()                  # scalar


def _make_state(freeze_base: bool):
    model = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1))
    variables = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)),
                           train=False)
    tx = classifier_optimizer(1e-3, freeze_base=freeze_base)
    state = ModelState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    return model, tx, state


def _run(mesh_ctx, *, tp: bool, steps: int = 3, freeze_base: bool = False):
    model, tx, state = _make_state(freeze_base)
    state = (shard_over_model(mesh_ctx, state, min_features=MIN_F)
             if tp else mesh_ctx.replicate(state))
    bsh = mesh_ctx.batch_sharding(4)
    step = make_train_step(model, tx, mode="real", batch_sharding=bsh)
    eval_step = make_eval_step(model, batch_sharding=bsh)

    rng = np.random.default_rng(0)
    images = mesh_ctx.replicate(jnp.asarray(
        rng.integers(0, 255, (64, 32, 32, 3), np.uint8)))
    labels = mesh_ctx.replicate(jnp.asarray(
        rng.integers(0, 2, (64,), np.int64).astype(np.int32)))
    dummy = mesh_ctx.replicate(jnp.zeros((1, 32, 32, 3), jnp.uint8))
    dummy_l = mesh_ctx.replicate(jnp.zeros((1,), jnp.int32))

    losses = []
    for i in range(steps):
        idx = jnp.asarray((np.arange(16) + 16 * i) % 64, jnp.int32)
        state, per_loss, preds, lb = step(
            state, images, labels, dummy, dummy_l, idx,
            jnp.float32(0.0), jax.random.key(100 + i))
        losses.append(np.asarray(jax.device_get(per_loss)))
    ev = eval_step(state.variables(), images,
                   jnp.arange(16, dtype=jnp.int32), labels)
    return (np.stack(losses), jax.device_get(state),
            [np.asarray(jax.device_get(e)) for e in ev])


@pytest.mark.parametrize("freeze_base", [False, True])
def test_tp_matches_single_device(freeze_base):
    """Unfrozen: ONE step, strict — pins gradient + update parity through
    every sharded layer. (Multi-step unfrozen comparison is meaningless
    at f32: random-init train-BN backward chaotically amplifies reduction
    -order noise, the same property that shaped test_torch_trajectory's
    tolerances.) Frozen: 3 steps strict — the fc-only trajectory is
    stable, so this pins multi-step TP dispatch too."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    steps = 3 if freeze_base else 1
    l1, s1, e1 = _run(create_mesh(devices=devs[:1]), tp=False,
                      freeze_base=freeze_base, steps=steps)
    l8, s8, e8 = _run(create_mesh(devices=devs[:8], model_parallel=2),
                      tp=True, freeze_base=freeze_base, steps=steps)
    np.testing.assert_allclose(l1, l8, rtol=2e-4, atol=2e-5)
    # Post-update comparisons carry the Adam step-1 envelope: a ~0
    # gradient coordinate's update is lr*g/(|g|+eps) — reduction-order
    # noise of ~1e-7 flips it by up to ±lr (1e-3), and eval logits
    # inherit that. Strict enough to catch any GSPMD miscompile
    # (order-1 wrong, like the fold-axis canary), loose enough for f32.
    post_tol = dict(rtol=5e-3, atol=3e-3) if not freeze_base else \
        dict(rtol=2e-4, atol=2e-5)
    for a, b in zip(e1, e8):
        np.testing.assert_allclose(a, b, **post_tol)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=3e-3)


def test_tp_shardings_stick_across_steps():
    """Wide leaves must BE sharded over 'model' after placement, and the
    step must return them still sharded (no silent re-replication — that
    would defeat the memory purpose and double per-step traffic)."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    mesh_ctx = create_mesh(devices=devs[:8], model_parallel=2)
    model, tx, state = _make_state(False)
    state = shard_over_model(mesh_ctx, state, min_features=MIN_F)

    def wide_conv_spec(st):
        # a deep wide kernel: stage-4 bottleneck conv3 (1x1xW -> 4W)
        k = st.params["layer4_0"]["conv3"]["kernel"]
        return k.sharding.spec, k

    spec, kernel = wide_conv_spec(state)
    assert spec == P(None, None, None, "model"), spec
    assert kernel.addressable_shards[0].data.shape[3] == kernel.shape[3] // 2

    step = make_train_step(model, tx, mode="real",
                           batch_sharding=mesh_ctx.batch_sharding(4))
    rng = np.random.default_rng(0)
    images = mesh_ctx.replicate(jnp.asarray(
        rng.integers(0, 255, (32, 32, 32, 3), np.uint8)))
    labels = mesh_ctx.replicate(jnp.zeros((32,), jnp.int32))
    dummy = mesh_ctx.replicate(jnp.zeros((1, 32, 32, 3), jnp.uint8))
    dummy_l = mesh_ctx.replicate(jnp.zeros((1,), jnp.int32))
    state, _, _, _ = step(state, images, labels, dummy, dummy_l,
                          jnp.arange(16, dtype=jnp.int32),
                          jnp.float32(0.0), jax.random.key(1))
    spec_after, _ = wide_conv_spec(state)
    assert spec_after == P(None, None, None, "model"), spec_after
    # Adam moment mirrors its parameter's sharding
    mu = jax.tree_util.tree_leaves(
        model_sharding_tree(mesh_ctx, state.opt_state, MIN_F))
    assert any(s.spec == P(None, None, None, "model") for s in mu)


def _dcgan_run(mesh_ctx, *, tp: bool):
    from xgan.models import dcgan
    from xgan.train.common import adam, create_state
    from xgan.train.gan import make_dcgan_step
    g_model = dcgan.Generator(latent_dim=8, feature_maps=32, image_size=32)
    d_model = dcgan.Discriminator(feature_maps=32, image_size=32)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    k = jax.random.key(0)
    place = ((lambda s: shard_over_model(mesh_ctx, s, min_features=MIN_F))
             if tp else mesh_ctx.replicate)
    g_state = place(create_state(g_model, g_tx, k, jnp.zeros((2, 8)),
                                 train=False))
    d_state = place(create_state(d_model, d_tx, k,
                                 jnp.zeros((2, 32, 32, 3)), train=False))
    step = make_dcgan_step(g_model, d_model, g_tx, d_tx, latent_dim=8,
                           batch_sharding=mesh_ctx.batch_sharding(4),
                           donate=False)
    images = mesh_ctx.replicate(jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 32, 3),
                                          np.uint8)))
    g_state, d_state, metrics = step(
        g_state, d_state, images, jnp.arange(16, dtype=jnp.int32),
        jax.random.key(7))
    return (np.asarray(jax.device_get(metrics)),
            jax.device_get(g_state.params))


def test_tp_dcgan_step_matches_single_device():
    """One fused DCGAN step under (data=4, model=2): feature_maps=32
    makes the deep G/D layers 128-256 channels wide, so MIN_F=64 shards
    them. loss/D(x)/D(G(z)) metrics mix pre- and post-D-update forwards,
    so the post-update Adam envelope applies (see the classifier test)."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    m1, p1 = _dcgan_run(create_mesh(devices=devs[:1]), tp=False)
    m8, p8 = _dcgan_run(create_mesh(devices=devs[:8], model_parallel=2),
                        tp=True)
    np.testing.assert_allclose(m1, m8, rtol=5e-3, atol=3e-3)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=3e-3)


def test_resume_replacement_restores_tp_sharding(tmp_path):
    """try_resume hands back REPLICATED states (snapshot.py restores via
    mesh_ctx.replicate — it cannot know the run's placement rule), so the
    trainer loops re-apply shard_over_model/shard_opt_state after resume.
    This pins both halves: the hazard (resumed state IS replicated) and
    the fix (re-placement restores the exact TP layout and values)."""
    from xgan.models import dcgan
    from xgan.train.common import adam, create_state
    from xgan.train.snapshot import SnapshotManager

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    mesh_ctx = create_mesh(devices=devs[:8], model_parallel=2)
    g_model = dcgan.Generator(latent_dim=8, feature_maps=32, image_size=32)
    g_tx = adam(2e-4, 0.5)
    g_state = shard_over_model(
        mesh_ctx,
        create_state(g_model, g_tx, jax.random.key(0), jnp.zeros((2, 8)),
                     train=False),
        min_features=MIN_F)

    def wide_kernel(st):
        # ConvTranspose_0: (1, 1, latent, 8*fm) — O=256 >= MIN_F, sharded
        return st.params["ConvTranspose_0"]["kernel"]

    w = wide_kernel(g_state)
    assert w.addressable_shards[0].data.shape[3] == w.shape[3] // 2

    mgr = SnapshotManager(str(tmp_path / "snap.msgpack"), mesh_ctx)
    mgr.save({"g": g_state}, epoch=1, iters=10)
    out, _, _ = mgr.try_resume("auto", {"g": g_state})

    # the hazard: restored state is replicated
    w_resumed = wide_kernel(out["g"])
    assert w_resumed.addressable_shards[0].data.shape[3] == w.shape[3]

    # the fix the loops apply: re-placement restores layout and values
    replaced = shard_over_model(mesh_ctx, out["g"], min_features=MIN_F)
    w_again = wide_kernel(replaced)
    assert w_again.addressable_shards[0].data.shape[3] == w.shape[3] // 2
    np.testing.assert_array_equal(np.asarray(w_again), np.asarray(w))

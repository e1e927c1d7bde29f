"""Generator-weight EMA (--ema-decay): math, non-interference, dispatch
equivalence, and loop integration with resume.

The reference has no EMA (it trains and samples the raw generator,
train_gan.py:141-146); this is a beyond-reference sample-quality
capability, so the tests pin OUR contract: the lerp is exact, training
is bitwise untouched, K=1 and K>1 dispatch agree, and the EMA tree
rides the snapshot so resumed runs equal uninterrupted ones.
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.models import dcgan
from xgan.parallel import create_mesh
from xgan.train.common import adam, create_state
from xgan.train.ema import ema_update, init_ema
from xgan.train.gan import make_dcgan_step

DECAY = 0.5


@pytest.fixture(scope="module")
def setup():
    mesh_ctx = create_mesh()
    g_model = dcgan.Generator(latent_dim=16, feature_maps=8, image_size=32)
    d_model = dcgan.Discriminator(feature_maps=8, image_size=32)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    k = jax.random.key(0)
    g0 = create_state(g_model, g_tx, k, jnp.zeros((2, 16)), train=False)
    d0 = create_state(d_model, d_tx, k, jnp.zeros((2, 32, 32, 3)),
                      train=False)
    kw = dict(latent_dim=16, batch_sharding=mesh_ctx.batch_sharding(4),
              donate=False)
    plain = make_dcgan_step(g_model, d_model, g_tx, d_tx, **kw)
    with_ema = make_dcgan_step(g_model, d_model, g_tx, d_tx,
                               ema_decay=DECAY, **kw)
    multi_ema = make_dcgan_step(g_model, d_model, g_tx, d_tx,
                                ema_decay=DECAY, steps_per_call=2, **kw)
    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (64, 32, 32, 3), np.uint8))
    return plain, with_ema, multi_ema, g0, d0, images


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def test_ema_math_and_training_noninterference(setup):
    plain, with_ema, _, g0, d0, images = setup
    idx = jnp.arange(16, dtype=jnp.int32)

    # plain trajectory + manual EMA replay
    expected = jax.device_get(g0.params)
    gp, dp = g0, d0
    for t in range(2):
        gp, dp, _ = plain(gp, dp, images, idx, jax.random.key(10 + t))
        expected = jax.tree_util.tree_map(
            lambda e, p: DECAY * e + (1 - DECAY) * np.asarray(p),
            expected, jax.device_get(gp.params))

    ge, de, ema = g0, d0, init_ema(g0.params)
    for t in range(2):
        ge, de, ema, _ = with_ema(ge, de, ema, images, idx,
                                  jax.random.key(10 + t))

    # training itself is BITWISE identical with and without EMA
    for a, b in zip(_leaves(gp.params), _leaves(ge.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(_leaves(dp.params), _leaves(de.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the EMA matches the manual lerp replay (same f32 ops, jit vs eager)
    for a, b in zip(_leaves(expected), _leaves(ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # and it is NOT the raw params (decay 0.5 keeps init memory)
    deltas = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
              for a, b in zip(_leaves(ema), _leaves(ge.params))]
    assert max(deltas) > 0


def test_multistep_ema_equals_single_dispatch(setup):
    _, with_ema, multi_ema, g0, d0, images = setup
    rng = np.random.default_rng(1)
    idx2 = jnp.asarray(rng.integers(0, 64, (2, 16), np.int64).astype(np.int32))
    key = jax.random.key(42)

    gs, ds, es = g0, d0, init_ema(g0.params)
    for t in range(2):
        gs, ds, es, _ = with_ema(gs, ds, es, images, idx2[t],
                                 jax.random.fold_in(key, t))

    gm, dm, em, _ = multi_ema(g0, d0, init_ema(g0.params), images, idx2,
                              jnp.int32(0), key)
    # scan vs unrolled compile to different reduction orders; Adam
    # amplifies the ~1e-7 noise to ~lr (2e-4) on near-zero-gradient
    # coordinates (the repo-wide post-Adam envelope, see test_multistep's
    # cg_tol) and the EMA lerp carries it through — bound by a couple of
    # lr quanta rather than exactness.
    for a, b in zip(_leaves(es), _leaves(em)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)


def _gan_args(fake_dataset, tmp_path, sub, **over):
    base = dict(
        data_dir=fake_dataset["data_dir"],
        model_dir=str(tmp_path / sub / "models"),
        output_dir=str(tmp_path / sub / "results"),
        results_dir=str(tmp_path / sub / "results/metrics"),
        figures_dir=str(tmp_path / sub / "results/figures"),
        num_channels=3, latent_dim=16, feature_maps_g=8, feature_maps_d=8,
        epochs=2, batch_size=8, lr=2e-4, beta1=0.5, workers=0,
        vis_batch_size=8, save_interval=500, checkpoint_interval=1,
        image_size=32, seed=0, compute_dtype="f32",
        cache_dir=str(tmp_path / "cache"), limit_batches=2, trace_dir="",
        ema_decay=0.9, cpu=True)
    base.update(over)
    return argparse.Namespace(**base)


def test_train_dcgan_ema_files_and_resume_equality(fake_dataset, tmp_path):
    """One uninterrupted 2-epoch EMA run vs 1 epoch + resume: the EMA
    tree rides the snapshot, so the resumed run's EMA final must equal
    the uninterrupted one's; the EMA checkpoint pair exists and differs
    from the raw final params."""
    from flax.serialization import msgpack_restore

    from xgan.train.gan_loop import train_dcgan

    a = _gan_args(fake_dataset, tmp_path, "straight")
    train_dcgan(a)
    mdir_a = tmp_path / "straight/models/gan"
    assert (mdir_a / "generator_ema_final.msgpack").exists()

    raw = msgpack_restore(
        (mdir_a / "generator_final.msgpack").read_bytes())
    ema_a = msgpack_restore(
        (mdir_a / "generator_ema_final.msgpack").read_bytes())
    # same structure (directly samplable), different values
    assert jax.tree_util.tree_structure(raw) == \
        jax.tree_util.tree_structure(ema_a)
    dmax = max(float(np.max(np.abs(x - y))) for x, y in zip(
        _leaves(raw["params"]), _leaves(ema_a["params"])))
    assert dmax > 0
    # BN stats are the raw generator's (they are already a running avg)
    for x, y in zip(_leaves(raw["batch_stats"]),
                    _leaves(ema_a["batch_stats"])):
        np.testing.assert_array_equal(x, y)

    b1 = _gan_args(fake_dataset, tmp_path, "resumed", epochs=1)
    train_dcgan(b1)
    b2 = _gan_args(fake_dataset, tmp_path, "resumed", resume_from="auto")
    train_dcgan(b2)
    ema_b = msgpack_restore(
        (tmp_path / "resumed/models/gan/generator_ema_final.msgpack")
        .read_bytes())
    for x, y in zip(_leaves(ema_a), _leaves(ema_b)):
        np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-7)


def test_resume_pre_ema_snapshot_fails_with_hint(tmp_path):
    """Turning --ema-decay ON for a run resumed from a snapshot written
    WITHOUT it must fail with a structured hint (the snapshot has no
    'ema' entry), not a cryptic flax keys message or a silent restart."""
    import jax.numpy as jnp

    from xgan.train.common import ModelState, adam
    from xgan.train.snapshot import SnapshotManager

    def _state(v):
        params = {"w": jnp.full((3, 3), v)}
        tx = adam(1e-3, 0.9)
        return ModelState(params=params, batch_stats={},
                          opt_state=tx.init(params))

    path = str(tmp_path / "old.msgpack")
    mgr = SnapshotManager(path)
    mgr.save({"g": _state(1.0), "d": _state(2.0)}, epoch=3, iters=30)
    with pytest.raises(ValueError, match="predates --ema-decay"):
        mgr.try_resume(path, {"g": _state(0.0), "d": _state(0.0),
                              "ema": {"w": jnp.zeros((3, 3))}})


def test_resume_ema_snapshot_without_flag_fails_with_hint(tmp_path):
    """The reverse of the pre-EMA case: a snapshot WRITTEN with
    --ema-decay resumed without the flag must hint to re-add it, not
    die on a raw flax keys-mismatch."""
    import jax.numpy as jnp

    from xgan.train.common import ModelState, adam
    from xgan.train.snapshot import SnapshotManager

    def _state(v):
        params = {"w": jnp.full((3, 3), v)}
        tx = adam(1e-3, 0.9)
        return ModelState(params=params, batch_stats={},
                          opt_state=tx.init(params))

    path = str(tmp_path / "ema.msgpack")
    mgr = SnapshotManager(path)
    mgr.save({"g": _state(1.0), "d": _state(2.0),
              "ema": {"w": jnp.zeros((3, 3))}}, epoch=3, iters=30)
    with pytest.raises(ValueError, match="re-add --ema-decay"):
        mgr.try_resume(path, {"g": _state(0.0), "d": _state(0.0)})

"""--shard-store correctness: a row-sharded device store must feed every
trainer the SAME batches as the replicated store. The sharded gather
(pipeline.make_sharded_take) assembles rows via a one-owner psum in bf16
— exact for u8 payloads (every value 0..255 is representable and exactly
one shard contributes per row) — so gathers are bit-identical and the
training math downstream is untouched."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.data.pipeline import DeviceStore
from xgan.data.store import ImageStore
from xgan.parallel import create_mesh
from xgan.train.classifier import (classifier_optimizer, make_eval_step,
                                   make_train_step)
from xgan.train.common import ModelState


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    return create_mesh(devices=devs[:8])


def _store(n=20, size=16, seed=0):
    rng = np.random.default_rng(seed)
    return ImageStore(
        images=rng.integers(0, 256, (n, size, size, 3), np.uint8),
        labels=(np.arange(n) % 2).astype(np.int32), size=size)


def test_sharded_store_gather_exact():
    """N=20 pads to 24 over 8 devices (3 rows each); every logical row —
    including the last, next to the pad — gathers bit-exact, and len()
    stays logical."""
    mesh_ctx = _mesh()
    host = _store()
    dev = DeviceStore(host, mesh_ctx, shard=True)
    assert dev.sharded and len(dev) == 20
    assert dev.images.shape[0] == 24  # padded to 8 | N
    assert dev.images.addressable_shards[0].data.shape[0] == 3

    idx = jnp.asarray([0, 19, 7, 19, 3, 12, 1, 0], jnp.int32)
    got = np.asarray(jax.jit(dev.take)(dev.images, idx))
    np.testing.assert_array_equal(got, host.images[np.asarray(idx)])


def _clf_run(mesh_ctx, *, shard: bool, mode: str, seed=0):
    host_real = _store(n=20, seed=1)
    host_synth = _store(n=6, seed=2)
    real = DeviceStore(host_real, mesh_ctx, shard=shard)
    synth = DeviceStore(host_synth, mesh_ctx)

    from xgan.models.resnet import ResNet50
    model = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1))
    v = model.init(jax.random.key(0), jnp.zeros((2, 16, 16, 3)),
                   train=False)
    tx = classifier_optimizer(1e-3, freeze_base=True)
    state = mesh_ctx.replicate(ModelState(
        params=v["params"], batch_stats=v["batch_stats"],
        opt_state=tx.init(v["params"])))
    step = make_train_step(model, tx, mode=mode,
                           batch_sharding=mesh_ctx.batch_sharding(4),
                           real_take=real.take, synth_take=synth.take,
                           n_real=len(real))
    eval_step = make_eval_step(model,
                               batch_sharding=mesh_ctx.batch_sharding(4),
                               take=real.take)
    hi = len(real) + (len(synth) if mode == "concat" else 0)
    idx = jnp.asarray(
        np.random.default_rng(seed).integers(0, hi, (16,)), jnp.int32)
    state, losses, preds, labels = step(
        state, real.images, real.labels, synth.images, synth.labels,
        idx, jnp.float32(0.5), jax.random.key(3))
    ev = eval_step(state.variables(), real.images,
                   jnp.arange(16, dtype=jnp.int32) % len(real),
                   real.labels)
    return ([np.asarray(jax.device_get(x))
             for x in (losses, preds, labels)],
            [np.asarray(jax.device_get(e)) for e in ev])


@pytest.mark.parametrize("mode", ["real", "concat", "mix"])
def test_sharded_store_matches_replicated(mode):
    """One frozen-base train step + one eval per batch-source mode:
    identical labels/preds, losses to f32-reorder tolerance (the gather
    is bit-exact; only the surrounding fusion changes)."""
    mesh_ctx = _mesh()
    (l0, p0, lb0), e0 = _clf_run(mesh_ctx, shard=False, mode=mode)
    (l1, p1, lb1), e1 = _clf_run(mesh_ctx, shard=True, mode=mode)
    np.testing.assert_array_equal(lb0, lb1)  # same rows gathered
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_allclose(l0, l1, rtol=1e-5, atol=1e-6)
    for a, b in zip(e0, e1):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_sharded_store_dcgan_step():
    """The fused DCGAN step trains identically off a sharded store
    (post-D-update metrics carry the Adam envelope, see test_tp)."""
    from xgan.models import dcgan
    from xgan.train.common import adam, create_state
    from xgan.train.gan import make_dcgan_step

    mesh_ctx = _mesh()
    host = _store(n=20, size=32, seed=4)

    def run(shard):
        dev = DeviceStore(host, mesh_ctx, shard=shard)
        g_model = dcgan.Generator(latent_dim=8, feature_maps=8,
                                  image_size=32)
        d_model = dcgan.Discriminator(feature_maps=8, image_size=32)
        g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
        k = jax.random.key(0)
        g_state = mesh_ctx.replicate(create_state(
            g_model, g_tx, k, jnp.zeros((2, 8)), train=False))
        d_state = mesh_ctx.replicate(create_state(
            d_model, d_tx, k, jnp.zeros((2, 32, 32, 3)), train=False))
        step = make_dcgan_step(g_model, d_model, g_tx, d_tx,
                               latent_dim=8, donate=False,
                               batch_sharding=mesh_ctx.batch_sharding(4),
                               store_take=dev.take)
        g_state, d_state, metrics = step(
            g_state, d_state, dev.images,
            jnp.arange(16, dtype=jnp.int32) % 20, jax.random.key(5))
        return (np.asarray(jax.device_get(metrics)),
                jax.device_get(g_state.params))

    m0, p0 = run(False)
    m1, p1 = run(True)
    np.testing.assert_allclose(m0, m1, rtol=5e-3, atol=3e-3)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=3e-3)

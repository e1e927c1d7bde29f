"""Data pipeline unit properties: epoch coverage, padding, normalization."""
import jax
import jax.numpy as jnp
import numpy as np

from xgan.data.pipeline import (DeviceStore, epoch_batches,
                                normalize_images, tanh_to_u8)


def test_device_store_process_local_constructor_equivalent():
    """The multi-host constructor path
    (jax.make_array_from_process_local_data with the replicated sharding,
    DeviceStore's process_count > 1 branch) produces arrays identical to
    the single-process device_put path on the 8-device mesh. A real
    multi-host run additionally needs jax.distributed.initialize(); this
    pins the constructor semantics on this jax version."""
    from xgan.data.store import ImageStore
    from xgan.parallel.mesh import create_mesh

    mesh_ctx = create_mesh()
    rng = np.random.default_rng(0)
    store = ImageStore(images=rng.integers(0, 255, (6, 32, 32, 3),
                                           dtype=np.uint8),
                       labels=np.arange(6, dtype=np.int32), size=32)
    dev = DeviceStore(store, mesh_ctx)

    imgs2 = jax.make_array_from_process_local_data(
        mesh_ctx.replicated(), np.ascontiguousarray(store.images))
    np.testing.assert_array_equal(np.asarray(imgs2), np.asarray(dev.images))
    assert len(imgs2.sharding.device_set) == 8
    assert imgs2.sharding.is_fully_replicated


def test_epoch_batches_full_coverage_then_wrap():
    rng = np.random.default_rng(0)
    for n, b in [(20, 8), (16, 8), (5, 8), (7, 3)]:
        batches = epoch_batches(n, b, rng)
        flat = batches.reshape(-1)
        num_batches = -(-n // b)
        assert batches.shape == (num_batches, b)
        # first n entries are a permutation of range(n)
        assert sorted(flat[:n].tolist()) == list(range(n))
        # padding wraps the same permutation from the start
        pad = num_batches * b - n
        if pad:
            np.testing.assert_array_equal(flat[n:], flat[:pad])


def test_epoch_batches_subset_indices():
    rng = np.random.default_rng(1)
    subset = np.array([3, 9, 11, 20, 21])
    batches = epoch_batches(999, 2, rng, indices=subset)
    flat = set(batches.reshape(-1).tolist())
    assert flat <= set(subset.tolist())
    assert len(set(batches.reshape(-1)[:5].tolist())) == 5


def test_normalize_matches_torchvision_formula():
    u8 = jnp.asarray(np.array([[[[0, 128, 255]]]], np.uint8))
    out = np.asarray(normalize_images(u8))
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    want = (np.array([0, 128, 255]) / 255.0 - mean) / std
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)


def test_tanh_to_u8_clips():
    x = jnp.asarray([[-5.0, -1.0, 0.5, 1.0, 5.0]])
    out = np.asarray(tanh_to_u8(x))
    np.testing.assert_array_equal(out, [[0, 0, 191, 255, 255]])

"""Data pipeline unit properties: epoch coverage, padding, normalization."""
import jax.numpy as jnp
import numpy as np

from xgan.data.pipeline import (epoch_batches, normalize_images,
                                tanh_to_u8)


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

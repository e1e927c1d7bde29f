"""MeshContext unit tests: shapes, padding, shardings, model axis."""
import jax
import numpy as np
import pytest

from xgan.parallel import create_mesh


def test_default_mesh_uses_all_devices():
    ctx = create_mesh()
    assert ctx.n_devices == len(jax.devices())
    assert ctx.n_data == len(jax.devices())


def test_pad_batch():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    ctx = create_mesh(devices=devs[:8])
    assert ctx.pad_batch(8) == 8
    assert ctx.pad_batch(9) == 16
    assert ctx.pad_batch(1) == 8


def test_model_axis_mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    ctx = create_mesh(devices=devs[:8], model_parallel=2)
    assert dict(ctx.mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        create_mesh(devices=devs[:8], data_parallel=3, model_parallel=2)


def test_shard_and_replicate_roundtrip():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    ctx = create_mesh(devices=devs[:8])
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    sharded = ctx.shard_array(x)
    assert sharded.sharding.spec[0] == "data"
    np.testing.assert_array_equal(np.asarray(sharded), x)
    rep = ctx.replicate({"a": x})
    assert rep["a"].sharding.is_fully_replicated

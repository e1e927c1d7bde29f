"""Pallas mixed-source gather: interpret-mode correctness on CPU.

(The compiled-TPU path is exercised by the same code on hardware; this
validates the kernel logic and the mixer/concat integration points.)
"""
import jax
import jax.numpy as jnp
import numpy as np

from xgan.ops.pallas.gather import mixed_gather


def test_mixed_gather_interpret_matches_select():
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.integers(0, 255, (10, 32, 32, 3), np.uint8))
    synth = jnp.asarray(rng.integers(0, 255, (4, 32, 32, 3), np.uint8))
    ridx = jnp.asarray(rng.integers(0, 10, (8,)).astype(np.int32))
    sidx = jnp.asarray(rng.integers(0, 4, (8,)).astype(np.int32))
    mask = jnp.asarray((rng.random(8) < 0.5).astype(np.int32))

    out = mixed_gather(real, synth, ridx, sidx, mask, interpret=True)
    want = np.where(np.asarray(mask)[:, None, None, None],
                    np.asarray(synth)[np.asarray(sidx)],
                    np.asarray(real)[np.asarray(ridx)])
    np.testing.assert_array_equal(np.asarray(out), want)


def test_mixed_gather_spmd_8dev_matches_select():
    """shard_map wrapper on an 8-device ('data','model') CPU mesh
    (interpret mode) == the XLA two-gather+select, with the batch sharded
    over the data axis and the stores replicated (VERDICT r1 #3)."""
    from xgan.ops.pallas.gather import mixed_gather_spmd
    from xgan.parallel.mesh import create_mesh

    mesh_ctx = create_mesh()
    assert mesh_ctx.n_devices == 8
    rng = np.random.default_rng(2)
    real = jnp.asarray(rng.integers(0, 255, (20, 32, 32, 3), np.uint8))
    synth = jnp.asarray(rng.integers(0, 255, (7, 32, 32, 3), np.uint8))
    b = 16  # 2 rows per data shard
    ridx = np.asarray(rng.integers(0, 20, (b,)), np.int32)
    sidx = np.asarray(rng.integers(0, 7, (b,)), np.int32)
    mask = np.asarray(rng.random(b) < 0.5, np.int32)

    sh = mesh_ctx.batch_sharding(1)
    out = mixed_gather_spmd(
        mesh_ctx.replicate(real), mesh_ctx.replicate(synth),
        jax.device_put(ridx, sh), jax.device_put(sidx, sh),
        jax.device_put(mask, sh), sharding=mesh_ctx.batch_sharding(4),
        interpret=True)
    want = np.where(mask[:, None, None, None],
                    np.asarray(synth)[sidx], np.asarray(real)[ridx])
    np.testing.assert_array_equal(np.asarray(out), want)
    # the output really is sharded over the data axis
    assert len(out.sharding.device_set) == 8


def test_mixed_gather_all_one_source():
    rng = np.random.default_rng(1)
    real = jnp.asarray(rng.integers(0, 255, (6, 32, 32, 3), np.uint8))
    synth = jnp.asarray(rng.integers(0, 255, (3, 32, 32, 3), np.uint8))
    idx = jnp.arange(6, dtype=jnp.int32)
    zeros = jnp.zeros((6,), jnp.int32)
    out = mixed_gather(real, synth, idx, zeros, zeros, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(real))
    out = mixed_gather(real, synth, zeros, idx % 3, jnp.ones((6,), jnp.int32),
                       interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(synth)[np.asarray(idx % 3)])

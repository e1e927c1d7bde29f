"""Pallas TPU kernel: mixed-source batch gather with data-dependent DMA.

The curriculum mixer and the concat-augmented batch source pick each
sample from one of TWO HBM-resident stores (real / synthetic). Expressed
in XLA that is two full gathers plus a select — 2x the necessary HBM
traffic (xgan/data/mixer.py, xgan/train/classifier.py:gather_concat).
This kernel issues exactly ONE row DMA per sample, choosing the source
store per scalar-prefetched index — a data-dependent copy XLA cannot
express.

Layout: images are viewed as flat (N, S*S*3) uint8 rows; S*S*3 is a
multiple of 128 lanes for any S % 32 == 0 (e.g. 224px: 150528 = 1176*128),
so rows tile cleanly into VMEM. The per-step output block is written back
to HBM by the pallas pipeline while the next row's DMA is in flight.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mixed_gather_kernel(ridx_ref, sidx_ref, mask_ref, real_ref, synth_ref,
                         out_ref, sem):
    i = pl.program_id(0)

    @pl.when(mask_ref[i] == 0)
    def _():
        cp = pltpu.make_async_copy(real_ref.at[ridx_ref[i]], out_ref.at[0],
                                   sem)
        cp.start()
        cp.wait()

    @pl.when(mask_ref[i] != 0)
    def _():
        cp = pltpu.make_async_copy(synth_ref.at[sidx_ref[i]],
                                   out_ref.at[0], sem)
        cp.start()
        cp.wait()


def mixed_gather_spmd(real_u8: jnp.ndarray, synth_u8: jnp.ndarray,
                      real_idx: jnp.ndarray, synth_idx: jnp.ndarray,
                      use_synth: jnp.ndarray, *, sharding=None,
                      interpret: bool = False) -> jnp.ndarray:
    """``mixed_gather`` that also runs under SPMD.

    The pallas custom call does not auto-partition under jit-with-sharding
    (round-1 limitation: the kernel was gated to single-device). Here the
    kernel is wrapped in ``jax.shard_map`` over the batch-sharding's data
    axis: stores stay replicated on every device, each device runs the
    kernel on its local batch rows, and the output comes back sharded
    exactly like the XLA two-gather+select it replaces.

    ``sharding``: the batch NamedSharding (dim 0 = data axis) or None for
    the plain single-program call.
    """
    if sharding is None:
        return mixed_gather(real_u8, synth_u8, real_idx, synth_idx,
                            use_synth, interpret=interpret)
    from jax.sharding import PartitionSpec as P
    mesh = sharding.mesh
    axis = sharding.spec[0]
    if axis is None or mesh.shape[axis] == 1:
        return mixed_gather(real_u8, synth_u8, real_idx, synth_idx,
                            use_synth, interpret=interpret)
    fn = functools.partial(mixed_gather, interpret=interpret)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis), check_vma=False,
    )(real_u8, synth_u8, real_idx, synth_idx, use_synth)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mixed_gather(real_u8: jnp.ndarray, synth_u8: jnp.ndarray,
                 real_idx: jnp.ndarray, synth_idx: jnp.ndarray,
                 use_synth: jnp.ndarray, *,
                 interpret: bool = False) -> jnp.ndarray:
    """Per-sample select-gather.

    real_u8: (Nr, S, S, 3) u8; synth_u8: (Ns, S, S, 3) u8 (same S);
    real_idx/synth_idx: (B,) int32; use_synth: (B,) bool/int32 mask.
    Returns (B, S, S, 3) u8 with row i taken from the masked source.
    """
    b = real_idx.shape[0]
    s = real_u8.shape[1]
    d = s * s * 3
    assert d % 128 == 0, "image row bytes must tile into 128 lanes"
    rows = d // 128
    real_flat = real_u8.reshape(real_u8.shape[0], rows, 128)
    synth_flat = synth_u8.reshape(synth_u8.shape[0], rows, 128)
    mask = use_synth.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, rows, 128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _mixed_gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, 128), jnp.uint8),
        interpret=interpret,
    )(real_idx.astype(jnp.int32), synth_idx.astype(jnp.int32), mask,
      real_flat, synth_flat)
    return out.reshape(b, s, s, 3)

"""Model-axis (tensor) parallelism: parameter sharding over ``"model"``.

The reference is single-device (SURVEY.md §2.3) — this subsystem has no
reference counterpart. It makes the mesh's second axis real: with
``--model-parallel N`` the widest layers' parameters (and their optimizer
moments and BatchNorm statistics) are sharded N-ways over the ``"model"``
axis instead of replicated, and XLA/GSPMD inserts the collectives that
keep the math identical to the replicated run (all-gather on use, or
channel-sharded activations flowing through, reduce-scatter on the
gradient). DP composes orthogonally on the ``"data"`` axis of the same
mesh.

Why: at ResNet-50/DCGAN scale replicated params fit easily and TP only
adds collective traffic — it is measured overhead here, not a win. The
capability matters when a future model's params + Adam moments + BN
stats exceed one chip's HBM: sharding the wide layers is what lets the
framework scale past that wall without code changes. Equality with the
replicated run is pinned by tests/test_tp.py at every mesh split.

Sharding rule (shape-based, applied leaf-wise to the whole ModelState so
Adam's mu/nu pick up exactly their parameter's sharding):

- conv kernels (H, W, I, O): shard O — output-channel ("column") parallel;
  activations downstream of the conv are channel-sharded and the next
  conv's contraction over I triggers GSPMD's reduce.
- dense kernels (I, O): shard I — row-parallel (ResNet's fc is (2048, 2):
  its O is tiny, its I matches the channel-sharded features feeding it).
- 1-D per-channel vectors (BN scale/bias, running mean/var, conv biases):
  sharded iff the channel count matches a shardable width.
- scalars / small leaves: replicated.

A leaf is shardable when its rule dimension is >= ``min_features`` AND
divisible by the model-axis size; everything else replicates, so narrow
early layers stay local and only the wide tail pays collective traffic.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from xgan.parallel.mesh import MeshContext

MIN_FEATURES = 256  # ResNet-50: shards stages conv3_x..conv5_x + fc


def model_axis_spec(shape, model_size: int, min_features: int,
                    axis_name: str = "model") -> P:
    """PartitionSpec for one leaf under the rule in the module docstring."""
    def ok(dim):
        return dim >= min_features and dim % model_size == 0

    if len(shape) == 4 and ok(shape[3]):          # conv kernel HWIO
        return P(None, None, None, axis_name)
    if len(shape) == 2 and ok(shape[0]):          # dense (I, O): row-parallel
        return P(axis_name, None)
    if len(shape) == 1 and ok(shape[0]):          # per-channel vector
        return P(axis_name)
    return P()


def model_sharding_tree(mesh_ctx: MeshContext, tree,
                        min_features: int = MIN_FEATURES):
    """A pytree of NamedShardings (same structure as ``tree``)."""
    m = mesh_ctx.mesh.shape[mesh_ctx.model_axis]

    def leaf(x):
        spec = model_axis_spec(np.shape(x), m, min_features,
                               mesh_ctx.model_axis)
        return NamedSharding(mesh_ctx.mesh, spec)

    return jax.tree_util.tree_map(leaf, tree)


def shard_over_model(mesh_ctx: MeshContext, tree,
                     min_features: int = MIN_FEATURES):
    """Place ``tree`` with wide leaves sharded over the model axis.

    With model_parallel == 1 this is exactly ``mesh_ctx.replicate``.
    """
    if mesh_ctx.mesh.shape[mesh_ctx.model_axis] == 1:
        return mesh_ctx.replicate(tree)
    return jax.device_put(tree, model_sharding_tree(mesh_ctx, tree,
                                                    min_features))


def shard_opt_state(mesh_ctx: MeshContext, state,
                    min_features: int = MIN_FEATURES):
    """ZeRO-1-style optimizer-state sharding (``--shard-opt-state``).

    Adam's mu/nu are 2x the parameter memory and are touched only by the
    elementwise update — they never feed a matmul — so unlike weights
    they can shard over EVERY mesh axis at once with no algorithmic
    consequence: each device keeps 1/n_devices of the moments,
    GSPMD slices the (replicated, already all-reduced) gradient locally
    for the update and all-gathers the parameter delta once per step —
    the same traffic class as the existing gradient all-reduce.
    Semantics are unchanged (pinned by tests/test_zero1.py; bitwise it
    reorders f32 reductions like any GSPMD re-layout).

    Leaves reuse the model-axis shape rule with the axis set to the
    whole mesh ``(model, data)``; narrow/indivisible leaves (early conv
    moments, fc bias, Adam's step counter) stay replicated — the wide
    tail is where the memory lives. Returns ``state`` with only
    ``opt_state`` re-placed, so it composes with/after
    :func:`shard_over_model` (a wide moment then shards over model AND
    data instead of model alone).
    """
    n = mesh_ctx.n_devices
    if n == 1:
        return state
    axes = (mesh_ctx.model_axis, mesh_ctx.data_axis)

    def leaf(x):
        spec = model_axis_spec(np.shape(x), n, min_features, axes)
        return NamedSharding(mesh_ctx.mesh, spec)

    placed = jax.device_put(
        state.opt_state,
        jax.tree_util.tree_map(leaf, state.opt_state))
    return state.replace(opt_state=placed)


def model_parallel_from_args(args) -> int:
    """CLI-facing validation of --model-parallel: N must divide the
    available device count (the mesh is (devices/N, N)). Degrades to
    replicated params with a visible note instead of crashing — the same
    convention as --steps-per-call on the classifier."""
    n = getattr(args, "model_parallel", 1) or 1
    if n <= 1:
        return 1
    import jax
    ndev = len(jax.devices())
    if ndev % n != 0:
        print(f"Note: --model-parallel {n} does not divide the {ndev} "
              f"available device(s); training with replicated params.")
        return 1
    return n

"""Device mesh + named shardings — the framework's single topology owner.

The reference is single-process single-device (SURVEY.md §2.3: no DDP/NCCL
anywhere); its only "device story" is a per-script ``torch.device`` flag.
Here the same slot is a first-class mesh abstraction:

- one ``jax.sharding.Mesh`` with axes ``("data", "model")`` — the GAN and
  classifier workloads are batch-parallel convnets, so "data" carries the
  parallelism (DP) and "model" carries tensor parallelism of the widest
  layers (``--model-parallel N`` via xgan/parallel/tp.py; size 1 =
  replicated, the default and the fastest at these model scales);
- batches are sharded ``P("data", ...)``, parameters replicated;
- XLA inserts the gradient all-reduces and the cross-replica BatchNorm
  reductions over ICI automatically — there is no hand-written collective
  in the training code.

Tests emulate an 8-device mesh on CPU via
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` (see tests/conftest.py);
the same code runs unchanged on a real v5e slice.

Multi-host: call ``jax.distributed.initialize()`` before ``create_mesh``
and it spans all hosts' devices (jax.devices() is global). The only
host-local adjustment needed is building global arrays from per-host data
(``jax.make_array_from_process_local_data``) in DeviceStore — single-slice
v5e-8 (the BASELINE.json target) needs none of this.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshContext:
    mesh: Mesh
    data_axis: str = "data"
    model_axis: str = "model"

    @property
    def n_data(self) -> int:
        return self.mesh.shape[self.data_axis]

    @property
    def n_devices(self) -> int:
        return int(np.prod(list(self.mesh.shape.values())))

    def batch_sharding(self, ndim: int = 1) -> NamedSharding:
        """Shard dim 0 over the data axis; replicate the rest."""
        return NamedSharding(
            self.mesh, P(self.data_axis, *([None] * (ndim - 1))))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def pad_batch(self, n: int) -> int:
        """Smallest multiple of n_data >= n (static-shape batch padding)."""
        d = self.n_data
        return ((n + d - 1) // d) * d

    def shard_array(self, x):
        """Device-put a host array with its batch dim sharded over data."""
        return jax.device_put(x, self.batch_sharding(np.ndim(x)))

    def replicate(self, tree):
        return jax.device_put(tree, self.replicated())


def create_mesh(devices: Optional[Sequence] = None,
                data_parallel: Optional[int] = None,
                model_parallel: int = 1) -> MeshContext:
    """Build the ("data", "model") mesh over all (or the given) devices.

    data_parallel defaults to n_devices // model_parallel.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (
        f"{data_parallel} x {model_parallel} != {n} devices")
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return MeshContext(mesh=Mesh(arr, ("data", "model")))

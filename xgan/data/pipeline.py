"""Device-resident data pipeline: on-device gather + fused preprocessing.

Replaces the reference's torchvision transform stack (data_loader.py:17-29:
Resize(224) -> RandomHorizontalFlip -> ToTensor -> Normalize(ImageNet)) with
an on-device path: the uint8 store lives in HBM; each step a (B,) int32
index vector is the only host->device traffic. Gather, u8->f32, random
horizontal flip, ImageNet normalization and the bf16 cast are one fused XLA
program (the resize already happened once at store-build time — the
reference's Resize is deterministic, so decode-once is semantics-preserving).

All functions here are jit-safe and shard the produced batch over the mesh
data axis via sharding constraints.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def epoch_batches(n: int, batch_size: int, rng: np.random.Generator,
                  *, shuffle: bool = True,
                  indices: Optional[np.ndarray] = None) -> np.ndarray:
    """(num_batches, batch_size) int32 index matrix for one epoch.

    ``indices`` restricts to a subset (k-fold splits). The tail batch is
    padded by wrapping around the shuffled order so every batch has a
    static shape (a jit requirement); num_batches = ceil(n/B), matching
    the reference DataLoader's batch count per epoch.
    """
    idx = np.arange(n, dtype=np.int32) if indices is None \
        else np.asarray(indices, np.int32)
    n = idx.shape[0]
    if shuffle:
        idx = rng.permutation(idx).astype(np.int32)
    num_batches = (n + batch_size - 1) // batch_size
    padded = np.resize(idx, (num_batches * batch_size,))
    return padded.reshape(num_batches, batch_size)


def normalize_images(u8: jnp.ndarray, *, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 (B,S,S,3) -> ImageNet-normalized images."""
    x = u8.astype(jnp.float32) * (1.0 / 255.0)
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.astype(dtype)


def random_flip(u8: jnp.ndarray, key) -> jnp.ndarray:
    """Per-sample random horizontal flip (p=0.5), on device."""
    flip = jax.random.bernoulli(key, 0.5, (u8.shape[0],))
    return jnp.where(flip[:, None, None, None], u8[:, :, ::-1, :], u8)


def gather_preprocess(images_u8: jnp.ndarray, idx: jnp.ndarray, key,
                      *, train: bool, dtype=jnp.float32,
                      batch_sharding=None, take=None) -> jnp.ndarray:
    """HBM store (N,S,S,3) u8 + (B,) idx -> normalized (B,S,S,3) batch.

    Intended to be called inside a jitted step; when ``batch_sharding``
    (a NamedSharding over the mesh data axis) is given, the gathered batch
    is constrained to it so downstream conv work is data-parallel.
    ``take`` overrides the row gather (DeviceStore.take — the sharded
    store's psum gather under --shard-store).
    """
    batch = (take or take_rows)(images_u8, idx)
    if batch_sharding is not None:
        batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
    if train:
        batch = random_flip(batch, key)
    return normalize_images(batch, dtype=dtype)


def denormalize_to_unit(x: jnp.ndarray) -> jnp.ndarray:
    """Invert ImageNet normalization back to [0,1] (clipped)."""
    y = x.astype(jnp.float32) * IMAGENET_STD + IMAGENET_MEAN
    return jnp.clip(y, 0.0, 1.0)


def tanh_to_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Generator output in [-1,1] -> uint8 via x*0.5+0.5.

    This is the reference's synthetic-image export transform
    (generate_synthetic.py:53) — preserved exactly, including the quirk
    that training images were ImageNet-normalized while exports assume a
    [-1,1] range (SURVEY.md §7 quirks).
    """
    y = jnp.clip(x.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
    return jnp.round(y * 255.0).astype(jnp.uint8)


def minmax_to_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Global min-max rescale -> uint8, the reference's SAMPLE-SHEET
    transform (torchvision save_image(normalize=True),
    train_gan.py:169) — used for visualization grids only; exports use
    tanh_to_u8."""
    x = x.astype(jnp.float32)
    lo, hi = jnp.min(x), jnp.max(x)
    y = (x - lo) / jnp.maximum(hi - lo, 1e-12)
    return jnp.round(y * 255.0).astype(jnp.uint8)


def take_rows(images_u8: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """The replicated-store gather (default everywhere)."""
    return jnp.take(images_u8, idx, axis=0)


def make_sharded_take(mesh_ctx, shard_rows: int):
    """Row gather from a store sharded over ALL mesh devices on dim 0.

    Each device owns a contiguous ``shard_rows`` block. For a (B,) index
    vector every device gathers its local hits, zeroes the misses, and a
    ``psum`` over the whole mesh assembles the batch — exactly one owner
    contributes per row, so the sum is exact (contributions ride bf16,
    where every u8 value is exactly representable, halving the
    all-reduce bytes vs int32). Per step this costs one B-sized image
    all-reduce over ICI in exchange for holding 1/n_devices of the
    dataset per chip — the HBM lever for datasets that outgrow
    replication (26k RSNA images at 224px replicate at ~4 GB/chip; at
    448px or web-scale counts replication stops fitting next to the
    model).

    Returned callable is jit/scan-safe (a shard_map region); use it in
    place of :func:`take_rows` inside steps.
    """
    mesh = mesh_ctx.mesh
    axes = (mesh_ctx.data_axis, mesh_ctx.model_axis)
    from jax.sharding import PartitionSpec as P

    def take(images_u8, idx):
        def local(block, idx):
            lin = (jax.lax.axis_index(axes[0]) * mesh.shape[axes[1]]
                   + jax.lax.axis_index(axes[1]))
            rel = idx - lin * shard_rows
            hit = (rel >= 0) & (rel < shard_rows)
            rows = jnp.take(block, jnp.clip(rel, 0, shard_rows - 1),
                            axis=0)
            rows = jnp.where(hit[:, None, None, None],
                             rows.astype(jnp.bfloat16), jnp.bfloat16(0))
            return jax.lax.psum(rows, axes)

        out = jax.shard_map(local, mesh=mesh, in_specs=(P(axes), P()),
                            out_specs=P(), check_vma=False)(images_u8,
                                                            idx)
        return out.astype(jnp.uint8)

    return take


class DeviceStore:
    """An ImageStore pushed to device HBM (replicated over the mesh, or
    row-sharded across all devices with ``shard=True``).

    Multi-host: ``jax.device_put`` cannot address other hosts' devices,
    so when the mesh spans processes the global replicated arrays are
    assembled with ``jax.make_array_from_process_local_data`` — every
    process contributes its (identical, fully replicated) local copy and
    receives a global jax.Array usable inside pjit'd steps. Call
    ``jax.distributed.initialize()`` before ``create_mesh`` (see
    xgan/parallel/mesh.py docstring); single-process meshes take the
    plain device_put path.

    ``shard=True`` (``--shard-store``): images are padded to a multiple
    of n_devices (``len()`` still reports the LOGICAL count — indices
    never reference pad rows) and placed row-sharded over the whole
    mesh; ``self.take`` becomes the psum-assembling sharded gather
    (:func:`make_sharded_take`). Labels stay replicated (4 bytes/row).
    Multi-host (r4): the sharded placement spans processes via
    ``jax.make_array_from_callback`` — every process holds the full
    decoded store on host here, and the callback hands each local
    device exactly its global row block, so per-device HBM is still
    1/n_devices of the dataset; the ``take`` gather's psum rides the
    cross-process collective transport (executed end-to-end by
    tests/test_multiprocess.py's worker).
    """

    def __init__(self, store, mesh_ctx=None, shard: bool = False):
        self.size = store.size
        self.labels_host = np.asarray(store.labels, np.int32)
        imgs = np.ascontiguousarray(store.images)
        labels = self.labels_host
        self._n = imgs.shape[0]
        self.take = take_rows
        if shard and mesh_ctx is not None and mesh_ctx.n_devices > 1:
            n_dev = mesh_ctx.n_devices
            padded = ((self._n + n_dev - 1) // n_dev) * n_dev
            if padded != self._n:
                imgs = np.concatenate(
                    [imgs, np.zeros((padded - self._n,) + imgs.shape[1:],
                                    imgs.dtype)])
            from jax.sharding import NamedSharding, PartitionSpec as P
            spec = P((mesh_ctx.data_axis, mesh_ctx.model_axis))
            sh = NamedSharding(mesh_ctx.mesh, spec)
            if jax.process_count() > 1:
                # cannot device_put onto other hosts' devices; the
                # callback route feeds each ADDRESSABLE device its
                # global index block regardless of device ordering
                self.images = jax.make_array_from_callback(
                    imgs.shape, sh, lambda idx: imgs[idx])
                self.labels = jax.make_array_from_process_local_data(
                    mesh_ctx.replicated(), labels)
            else:
                self.images = jax.device_put(imgs, sh)
                self.labels = jax.device_put(labels,
                                             mesh_ctx.replicated())
            self.take = make_sharded_take(mesh_ctx, padded // n_dev)
        elif mesh_ctx is not None and jax.process_count() > 1:
            self.images = jax.make_array_from_process_local_data(
                mesh_ctx.replicated(), imgs)
            self.labels = jax.make_array_from_process_local_data(
                mesh_ctx.replicated(), labels)
        elif mesh_ctx is not None:
            self.images = jax.device_put(imgs, mesh_ctx.replicated())
            self.labels = jax.device_put(labels, mesh_ctx.replicated())
        else:
            self.images = jax.device_put(imgs)
            self.labels = jax.device_put(labels)

    @property
    def sharded(self) -> bool:
        return self.take is not take_rows

    def __len__(self) -> int:
        # logical row count — pad rows (shard mode) are not addressable
        return self._n

"""Decode-once image store: PNG -> resized uint8 array, cached on disk.

The reference decodes every PNG with PIL on every epoch in DataLoader worker
processes (reference data_loader.py:103-115, :189-197). On TPU the right
shape is decode ONCE to a uint8 (N, S, S, 3) array, memory-map it, push it
to HBM, and do all per-step work (gather, flip, normalize, mix) on device —
the dataset at 224px is ~4 GB uint8, which fits HBM with room to spare and
removes the host from the steady-state loop entirely (SURVEY.md §7 hard
part No.5).

Decode-error / missing-file behavior matches the reference: a black image
is substituted (data_loader.py:52-55, :108-110).
"""
from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image


def _decode_resize(path: str, size: int) -> np.ndarray:
    try:
        img = Image.open(path).convert("RGB")
    except Exception as e:  # missing or corrupt -> black (reference behavior)
        print(f"Warning: could not load image {path}: {e}")
        return np.zeros((size, size, 3), np.uint8)
    if img.size != (size, size):
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


def _decode_all(paths: List[str], size: int) -> np.ndarray:
    """Decode+resize a path list; native threaded codec when available
    (xgan.native, PIL-equivalent resampling), PIL otherwise."""
    try:
        from xgan import native
        if native._load():
            return native.decode_png_batch(paths, size)
    except Exception as e:
        print(f"Note: native decoder unavailable ({e}); using PIL.")
    images = np.empty((len(paths), size, size, 3), np.uint8)
    for i, p in enumerate(paths):
        images[i] = _decode_resize(p, size)
        if (i + 1) % 2000 == 0:
            print(f"  decoded {i + 1}/{len(paths)} images")
    return images


def _cache_key(paths: Sequence[str], size: int) -> str:
    h = hashlib.sha256()
    h.update(str(size).encode())
    for p in paths:
        h.update(p.encode())
        try:
            h.update(str(os.path.getmtime(p)).encode())
        except OSError:
            h.update(b"missing")
    return h.hexdigest()[:16]


@dataclass
class ImageStore:
    """uint8 (N, S, S, 3) image array + int32 labels, host-side."""
    images: np.ndarray
    labels: np.ndarray
    size: int

    def __len__(self) -> int:
        return self.images.shape[0]

    @staticmethod
    def build(paths: List[str], labels: np.ndarray, size: int,
              cache_dir: Optional[str] = None,
              name: str = "store") -> "ImageStore":
        """Decode (or load cached) images at the given square size."""
        labels = np.asarray(labels, np.int32)
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            key = _cache_key(paths, size)
            npy = os.path.join(cache_dir, f"{name}_{key}.npy")
            meta = os.path.join(cache_dir, f"{name}_{key}.json")
            if os.path.exists(npy) and os.path.exists(meta):
                images = np.load(npy, mmap_mode="r")
                return ImageStore(images=images, labels=labels, size=size)

        images = _decode_all(paths, size)

        if cache_dir:
            # temp-file + atomic rename: concurrent processes (every
            # multi-host process builds the same cache) must never see a
            # half-written .npy — a plain np.save(final_path) truncates
            # the file another process may be mmap-loading (SIGBUS)
            tmp = f"{npy[:-4]}.tmp{os.getpid()}.npy"  # np.save appends
            np.save(tmp, images)                      # .npy otherwise
            os.replace(tmp, npy)
            tmp_meta = f"{meta}.tmp.{os.getpid()}"
            with open(tmp_meta, "w") as f:
                json.dump({"n": len(paths), "size": size}, f)
            os.replace(tmp_meta, meta)
            images = np.load(npy, mmap_mode="r")
        return ImageStore(images=images, labels=labels, size=size)


def decode_folder_store(folder: str, size: int, label: int = 1,
                        cache_dir: Optional[str] = None,
                        name: str = "synthetic") -> ImageStore:
    """Store over every *.png in a folder with a fixed label.

    Mirrors the reference SyntheticDataset (data_loader.py:31-60): all
    synthetic images carry the positive label by default.
    """
    files = sorted(os.path.join(folder, f) for f in os.listdir(folder)
                   if f.endswith(".png"))
    print(f"Found {len(files)} synthetic images in {folder}")
    labels = np.full((len(files),), label, np.int32)
    return ImageStore.build(files, labels, size, cache_dir=cache_dir,
                            name=name)

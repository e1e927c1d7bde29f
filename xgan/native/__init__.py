"""ctypes bindings for the native PNG codec, with PIL fallback.

``encode_png_batch(images, paths)`` / ``decode_png_batch(paths, size)``
use the threaded C++ codec when the shared library is present (built on
first use); otherwise they fall back to PIL so the framework works with no
toolchain. ``HAVE_NATIVE`` reports which path is active.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB = None
HAVE_NATIVE = False


def _load():
    global _LIB, HAVE_NATIVE
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.abspath(__file__))
    so = os.path.join(here, "libxganpng.so")
    cpp = os.path.join(here, "png_writer.cpp")
    # Rebuild when missing OR stale: a checkout that built the .so before
    # a png_writer.cpp (or build-recipe) change would otherwise keep
    # running the old binary while tests of the new behavior go green
    # against a fresh build.
    build_py = os.path.join(here, "build.py")
    srcs = [p for p in (cpp, build_py) if os.path.exists(p)]
    stale = (os.path.exists(so) and srcs
             and max(os.path.getmtime(p) for p in srcs)
             > os.path.getmtime(so))
    if not os.path.exists(so) or stale:
        try:
            from xgan.native.build import build
            build(verbose=False)
        except Exception as e:  # no toolchain: PIL fallback (or stale .so)
            if stale:
                print(f"Note: could not rebuild stale native codec ({e}); "
                      "using PIL.")
                _LIB = False
                return False
            print(f"Note: native PNG codec unavailable ({e}); using PIL.")
            _LIB = False
            return False
    try:
        lib = ctypes.CDLL(so)
        lib.xgan_encode_png_batch.restype = ctypes.c_int
        lib.xgan_encode_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int]
        lib.xgan_decode_png_batch.restype = ctypes.c_int
        lib.xgan_decode_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        _LIB = lib
        HAVE_NATIVE = True
    except Exception as e:
        print(f"Note: native PNG codec failed to load ({e}); using PIL.")
        _LIB = False
    return _LIB


def _paths_array(paths: List[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def encode_png_batch(images: np.ndarray, paths: List[str],
                     compress_level: int = 1,
                     n_threads: Optional[int] = None) -> int:
    """Write (B, H, W, 3) uint8 images to PNG files. Returns #failures."""
    assert images.ndim == 4 and images.shape[-1] == 3
    assert images.shape[0] == len(paths)
    lib = _load()
    if lib:
        images = np.ascontiguousarray(images, np.uint8)
        n, h, w, _ = images.shape
        threads = n_threads or min(8, os.cpu_count() or 1)
        return lib.xgan_encode_png_batch(
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, h, w, _paths_array(paths), compress_level, threads)
    from PIL import Image
    failures = 0
    for img, path in zip(images, paths):
        try:
            Image.fromarray(img).save(path)
        except Exception:
            failures += 1
    return failures


def decode_png_batch(paths: List[str], size: int,
                     n_threads: Optional[int] = None) -> np.ndarray:
    """Decode+resize PNGs to a (B, size, size, 3) uint8 array.
    Failures become black images (reference data-layer behavior)."""
    lib = _load()
    if lib:
        out = np.empty((len(paths), size, size, 3), np.uint8)
        threads = n_threads or min(8, os.cpu_count() or 1)
        lib.xgan_decode_png_batch(
            _paths_array(paths), len(paths), size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
        return out
    from xgan.data.store import _decode_resize
    return np.stack([_decode_resize(p, size) for p in paths]) \
        if paths else np.zeros((0, size, size, 3), np.uint8)

"""Native PNG codec tests: roundtrip, PIL-resize parity, store integration,
PIL fallback equivalence."""
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def native_lib():
    from xgan import native
    if not native._load():
        pytest.skip("native codec unavailable (no toolchain)")
    return native


def test_encode_decode_roundtrip(native_lib, tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (6, 48, 48, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"im_{i}.png") for i in range(6)]
    assert native_lib.encode_png_batch(imgs, paths) == 0
    # PIL must read back our PNGs bit-exactly (interop with everything else)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(
            np.asarray(Image.open(p).convert("RGB")), imgs[i])
    back = native_lib.decode_png_batch(paths, 48)
    np.testing.assert_array_equal(back, imgs)


def test_native_resize_matches_pil(native_lib, tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    p = str(tmp_path / "r.png")
    Image.fromarray(img).save(p)
    for target in (48, 32, 120):
        ours = native_lib.decode_png_batch([p], target)[0]
        pil = np.asarray(Image.open(p).convert("RGB").resize(
            (target, target), Image.BILINEAR))
        diff = np.abs(ours.astype(int) - pil.astype(int))
        assert diff.max() <= 1, f"target {target}: max diff {diff.max()}"


def test_decode_missing_file_black(native_lib, tmp_path):
    out = native_lib.decode_png_batch([str(tmp_path / "missing.png")], 16)
    assert (out == 0).all()  # black substitute (reference behavior)


def test_decode_corrupt_inputs_black(native_lib, tmp_path):
    """Corrupt files must never crash the process and must come back as
    black images (reference data_loader.py:108-110 substitutes on ANY
    decode error, not just FileNotFoundError), with good neighbors in the
    same batch unaffected."""
    import binascii
    import struct

    rng = np.random.default_rng(3)
    good = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
    good_p = str(tmp_path / "good.png")
    Image.fromarray(good).save(good_p)

    garbage_p = str(tmp_path / "garbage.png")
    with open(garbage_p, "wb") as f:
        f.write(b"not a png at all" * 64)

    truncated_p = str(tmp_path / "truncated.png")
    with open(truncated_p, "wb") as f:
        f.write(open(good_p, "rb").read()[:40])  # mid-IHDR cutoff

    # Crafted headers with huge claimed dimensions. A stub IDAT chunk is
    # REQUIRED: png_read_info keeps reading chunks until it sees IDAT, so
    # without one it longjmps on EOF before the decoder's dimension
    # guard ever runs and the test passes vacuously (verified with a
    # libpng probe). With the IDAT present, read_info returns the claimed
    # dimensions and the guard must reject them — instead of the 12 GB
    # row buffer (huge) or the ~GB-scale h*size resize intermediate
    # (tall) throwing bad_alloc and terminating the process.
    def craft(path, w, h):
        def chunk(typ, data):
            return (struct.pack(">I", len(data)) + typ + data +
                    struct.pack(">I",
                                binascii.crc32(typ + data) & 0xffffffff))
        import zlib
        with open(path, "wb") as f:
            f.write(b"\x89PNG\r\n\x1a\n")
            f.write(chunk(b"IHDR",
                          struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
            f.write(chunk(b"IDAT", zlib.compress(b"\x00")))

    huge_p = str(tmp_path / "huge.png")      # 12 GB row buffer if decoded
    craft(huge_p, 65535, 65535)
    tall_p = str(tmp_path / "tall.png")      # passes a w*h cap alone
    craft(tall_p, 64, 1_000_000)

    out = native_lib.decode_png_batch(
        [garbage_p, good_p, truncated_p, huge_p, tall_p], 24)
    assert (out[0] == 0).all()
    np.testing.assert_array_equal(out[1], good)
    assert (out[2] == 0).all()
    assert (out[3] == 0).all()
    assert (out[4] == 0).all()


def test_store_corrupt_image_black(tmp_path):
    """ImageStore.build black-substitutes corrupt entries regardless of
    which codec (native or PIL) decodes them."""
    from xgan.data.store import ImageStore
    rng = np.random.default_rng(4)
    good = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    gp = str(tmp_path / "ok.png")
    Image.fromarray(good).save(gp)
    bp = str(tmp_path / "bad.png")
    with open(bp, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n broken")

    store = ImageStore.build([gp, bp], np.zeros(2, np.int32), 32)
    np.testing.assert_array_equal(store.images[0], good)
    assert (store.images[1] == 0).all()


def test_store_uses_same_values_as_pil_path(tmp_path):
    """ImageStore.build output must be invariant to the codec used."""
    from xgan.data.store import ImageStore, _decode_resize
    rng = np.random.default_rng(2)
    paths = []
    for i in range(4):
        img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        p = str(tmp_path / f"s_{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    store = ImageStore.build(paths, np.zeros(4, np.int32), 32)
    pil = np.stack([_decode_resize(p, 32) for p in paths])
    diff = np.abs(store.images.astype(int) - pil.astype(int))
    assert diff.max() <= 1

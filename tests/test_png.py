"""Stdlib PNG codec tests (lwsnet_tpu.data.png) — the zero-dependency tail
of the decode chain (native C++ -> PIL -> stdlib)."""

import os

import numpy as np
import pytest

from lwsnet_tpu.data import png
from lwsnet_tpu.data import transforms as T

GOLDEN = "/root/reference/reference/left_test.png"


@pytest.mark.parametrize("shape,dtype", [
    ((37, 53, 3), np.uint8),
    ((37, 53), np.uint8),
    ((37, 53), np.uint16),
    ((37, 53, 4), np.uint8),
])
def test_roundtrip(tmp_path, shape, dtype):
    rng = np.random.default_rng(0)
    hi = np.iinfo(dtype).max + 1
    arr = rng.integers(0, hi, shape).astype(dtype)
    p = str(tmp_path / "t.png")
    png.write_png(p, arr)
    out = png.read_png(p)
    assert out.shape == arr.shape and out.dtype == arr.dtype
    np.testing.assert_array_equal(out, arr)


def test_decodes_golden_pair():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden image unavailable")
    arr = png.read_png(GOLDEN)
    assert arr.shape == (375, 1242, 3) and arr.dtype == np.uint8
    # Stable content fingerprint of the committed reference image: catches
    # filter-reconstruction bugs (all five filter types appear in real
    # encoder output) without needing PIL for a cross-check.
    assert int(arr.astype(np.int64).sum()) == 133521368


def test_decode_matches_pil_when_available():
    try:
        import PIL.Image as PIL_Image
    except Exception as e:  # ImportError, or OSError on a degraded disk
        pytest.skip(f"PIL unavailable: {e}")
    if not os.path.exists(GOLDEN):
        pytest.skip("golden image unavailable")
    ref = np.asarray(PIL_Image.open(GOLDEN).convert("RGB"))
    np.testing.assert_array_equal(png.read_png(GOLDEN), ref)


def test_all_filter_types_roundtrip(tmp_path):
    """Force every PNG filter type through the decoder by hand-building a
    file whose rows each use a different filter."""
    import struct
    import zlib

    rng = np.random.default_rng(1)
    h, w, c = 5, 16, 3
    arr = rng.integers(0, 256, (h, w, c)).astype(np.uint8)
    bpp = c

    # Apply the PNG filters forward (encoder side), one type per row.
    rows = arr.reshape(h, -1).astype(np.int32)
    scan = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        f = y % 5
        row = rows[y]
        left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if f == 0:
            enc = row
        elif f == 1:
            enc = row - left
        elif f == 2:
            enc = row - prev
        elif f == 3:
            enc = row - ((left + prev) >> 1)
        else:  # paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = row - pred
        scan.append(f)
        scan.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    p = str(tmp_path / "filters.png")
    with open(p, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n")
        fh.write(chunk(b"IHDR", ihdr))
        fh.write(chunk(b"IDAT", zlib.compress(bytes(scan))))
        fh.write(chunk(b"IEND", b""))

    np.testing.assert_array_equal(png.read_png(p), arr)


def test_transforms_chain_without_pil(tmp_path, monkeypatch):
    """decode_image_u8 / load_disparity_kitti work with PIL forced off."""
    monkeypatch.setattr(T, "_pil_image", lambda: None)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (12, 20, 3)).astype(np.uint8)
    d16 = rng.integers(0, 65536, (12, 20)).astype(np.uint16)
    pi, pd = str(tmp_path / "i.png"), str(tmp_path / "d.png")
    png.write_png(pi, img)
    png.write_png(pd, d16)
    np.testing.assert_array_equal(T.decode_image_u8(pi), img)
    np.testing.assert_allclose(T.load_disparity_kitti(pd),
                               d16.astype(np.float32) / 256.0)

"""Native C++ data-path tests: decode parity vs PIL, fused crop/normalize."""

import os
import subprocess

import numpy as np
import pytest

try:
    import PIL.Image as Image
except Exception as _e:  # ImportError, or OSError on a degraded disk
    pytest.skip(f"PIL unavailable: {_e}", allow_module_level=True)

from lwsnet_tpu.data import native
from lwsnet_tpu.data import transforms as T

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = "/root/reference/reference/left_test.png"


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not native.available():
        try:
            subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           check=True, capture_output=True)
        except (subprocess.CalledProcessError, OSError) as e:
            pytest.skip(f"native toolchain unavailable: {e}")
    if not native.available():
        pytest.skip("native library failed to build")


def test_decode_rgb_matches_pil():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden image unavailable")
    ours = native.decode_png(GOLDEN)
    ref = np.asarray(Image.open(GOLDEN).convert("RGB"))
    assert ours.shape[:2] == ref.shape[:2]
    np.testing.assert_array_equal(ours[..., :3], ref)


def test_decode_synthetic_rgb(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(native.decode_png(p), img)


def test_decode_16bit_disparity(tmp_path):
    rng = np.random.default_rng(1)
    d16 = rng.integers(0, 65536, (23, 41), dtype=np.uint16)
    p = str(tmp_path / "d.png")
    Image.fromarray(d16).save(p)
    out = native.decode_png(p)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, d16)


def test_loaders_route_through_native(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 20, 3), dtype=np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(img).save(p)
    np.testing.assert_allclose(T.load_image(p), img.astype(np.float32) / 255,
                               atol=1e-7)

    d16 = rng.integers(0, 60000, (16, 20), dtype=np.uint16)
    pd = str(tmp_path / "disp.png")
    Image.fromarray(d16).save(pd)
    np.testing.assert_allclose(T.load_disparity_kitti(pd),
                               d16.astype(np.float32) / 256, atol=1e-7)


def test_crop_normalize_fused():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
    out = native.crop_normalize_u8(img, 5, 7, 16, 24,
                                   T.IMAGENET_MEAN, T.IMAGENET_STD)
    ref = (img[5:21, 7:31].astype(np.float32) / 255.0
           - T.IMAGENET_MEAN) / T.IMAGENET_STD
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_crop_disparity_fused():
    rng = np.random.default_rng(4)
    d16 = rng.integers(0, 65536, (30, 40), dtype=np.uint16)
    out = native.crop_disparity_u16(d16, 3, 4, 10, 12)
    np.testing.assert_allclose(out, d16[3:13, 4:16].astype(np.float32) / 256,
                               atol=1e-7)


def test_corrupt_png_rejected(tmp_path):
    p = str(tmp_path / "bad.png")
    with open(p, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nGARBAGE")
    with pytest.raises(ValueError):
        native.decode_png(p)

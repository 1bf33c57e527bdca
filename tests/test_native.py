"""Native C++ data-path (native/stereoio.cpp) vs the pure-Python fallbacks."""

import os

import numpy as np
import pytest

from aswstereomatch_tpu.utils import evaluate, io, native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def test_pnm_roundtrip_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    gray = np.round(rng.uniform(0, 255, (13, 17))).astype(np.float32)
    p = str(tmp_path / "x.pgm")
    io.write_pgm(p, gray)
    np.testing.assert_array_equal(native.read_pnm(p), io.read_pnm(p))
    np.testing.assert_array_equal(native.read_pnm(p), gray)

    # native writer -> python reader
    p2 = str(tmp_path / "y.pgm")
    native.write_pgm(p2, gray)
    np.testing.assert_array_equal(io.read_pnm(p2), gray)


def test_ppm_color(tmp_path):
    rng = np.random.default_rng(1)
    img = np.round(rng.uniform(0, 255, (9, 11, 3))).astype(np.uint8)
    p = str(tmp_path / "c.ppm")
    with open(p, "wb") as f:
        f.write(b"P6\n# comment\n11 9\n255\n" + img.tobytes())
    np.testing.assert_array_equal(native.read_pnm(p), io.read_pnm(p))


def test_pfm_matches_python(tmp_path):
    rng = np.random.default_rng(2)
    disp = rng.uniform(0, 64, (21, 34)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    io.write_pfm(p, disp)
    np.testing.assert_array_equal(native.read_pfm(p), io.read_pfm(p))
    np.testing.assert_array_equal(native.read_pfm(p), disp)


def test_bad_delta_matches_python():
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 32, (40, 50)).astype(np.float32)
    b = a + rng.normal(0, 2, a.shape).astype(np.float32)
    valid = rng.random(a.shape) > 0.3
    got = native.bad_delta(a, b, 2.0, valid)
    want = evaluate.bad_delta(a, b, 2.0, valid)
    assert abs(got - want) < 1e-9
    assert abs(native.epe(a, b, valid) - np.abs(a - b)[valid].mean()) < 1e-5


def _cv2():
    try:
        import cv2

        return cv2
    except Exception:
        return None


def test_png_roundtrip_gray8(tmp_path):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (37, 53)).astype(np.float32)
    p = str(tmp_path / "g8.png")
    native.write_png(p, img)
    back = native.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_roundtrip_rgb8(tmp_path):
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (21, 34, 3)).astype(np.float32)
    p = str(tmp_path / "rgb.png")
    native.write_png(p, img)
    back = native.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_roundtrip_gray16_kitti_gt(tmp_path):
    """KITTI-convention uint16 GT: write disp*256, read via the dataset path."""
    rng = np.random.default_rng(7)
    disp = np.round(rng.uniform(0, 128, (25, 40)) * 256) / 256
    disp[rng.random(disp.shape) > 0.8] = 0.0  # invalid marks
    p = str(tmp_path / "gt.png")
    io.save_disparity_gt_png(p, disp)
    got, valid = io.read_gt_disparity(p, "kitti")
    np.testing.assert_allclose(got, disp.astype(np.float32), atol=1 / 512)
    np.testing.assert_array_equal(valid, disp > 0)


@pytest.mark.skipif(_cv2() is None, reason="cv2 unavailable")
def test_png_decode_matches_cv2_encoders(tmp_path):
    """Decode cv2-written PNGs (which use real scanline filters) exactly."""
    cv2 = _cv2()
    rng = np.random.default_rng(8)
    # smooth gradients make cv2 pick non-trivial filters (Sub/Up/Paeth)
    y, x = np.mgrid[0:48, 0:64]
    gray8 = ((y * 3 + x * 2) % 256).astype(np.uint8)
    p = str(tmp_path / "cv_g8.png")
    assert cv2.imwrite(p, gray8)
    np.testing.assert_array_equal(native.read_png(p), gray8.astype(np.float32))

    bgr = np.stack(
        [gray8, (x % 256).astype(np.uint8), rng.integers(0, 256, gray8.shape, dtype=np.uint8)],
        axis=-1,
    )
    p = str(tmp_path / "cv_rgb.png")
    assert cv2.imwrite(p, bgr)
    got = native.read_png(p)
    np.testing.assert_array_equal(got, bgr[..., ::-1].astype(np.float32))

    g16 = ((y * 977 + x * 3001) % 65536).astype(np.uint16)
    p = str(tmp_path / "cv_g16.png")
    assert cv2.imwrite(p, g16)
    np.testing.assert_array_equal(native.read_png(p), g16.astype(np.float32))


@pytest.mark.skipif(_cv2() is None, reason="cv2 unavailable")
def test_png_encode_readable_by_cv2(tmp_path):
    cv2 = _cv2()
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (30, 41)).astype(np.float32)
    p = str(tmp_path / "ours.png")
    native.write_png(p, img)
    got = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(got.astype(np.float32), img)

    disp16 = rng.integers(0, 65536, (22, 31)).astype(np.float32)
    p16 = str(tmp_path / "ours16.png")
    native.write_png(p16, disp16, bit_depth=16)
    got16 = cv2.imread(p16, cv2.IMREAD_UNCHANGED)
    assert got16.dtype == np.uint16
    np.testing.assert_array_equal(got16.astype(np.float32), disp16)

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

"""Native host runtime: correctness vs NumPy, with and without the library."""

import numpy as np
import pytest

from octane_tpu.io import native


@pytest.fixture(scope="module")
def lib_built():
    ok = native.native_available()
    if not ok:
        pytest.skip("native library unavailable (no toolchain)")
    return ok


class TestNative:
    def test_requantize(self, lib_built):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (257, 511)).astype(np.float32)
        vmin, vmax, scale, offset = 85.0, 325.0, 0.04, -0.5
        got = native.requantize(img, vmin, vmax, scale, offset)
        # reference order/precision (oct_interp.cc:431): /255 in double,
        # truncate to float32, then the int16 C-cast
        span = np.float64(vmax) - np.float64(vmin)
        rad = (img.astype(np.float64) / 255.0 * span + vmin).astype(np.float32)
        want = ((rad - np.float32(offset)) / np.float32(scale)).astype(np.int16)
        np.testing.assert_array_equal(got, want)

    def test_requantize_negative_truncation(self, lib_built):
        # C int16 cast truncates toward zero, like numpy astype
        img = np.asarray([[0.0, 1.7, 254.9]], np.float32)
        got = native.requantize(img, -100.0, 100.0, 1.0, 0.0)
        want = (((img * np.float32(200.0 / 255.0) + np.float32(-100.0))
                 - 0.0) / 1.0).astype(np.int16)
        np.testing.assert_array_equal(got, want)

    def test_epe_stats(self, lib_built):
        rng = np.random.default_rng(2)
        u1 = rng.normal(0, 1, (100, 100)).astype(np.float32)
        v1 = rng.normal(0, 1, (100, 100)).astype(np.float32)
        u2 = u1 + 0.05
        v2 = v1.copy()
        mean, mx, frac = native.epe_stats(u1, v1, u2, v2, thresh=0.1)
        assert mean == pytest.approx(0.05, rel=1e-4)
        assert mx == pytest.approx(0.05, rel=1e-4)
        assert frac == 0.0

    def test_numpy_fallback_paths(self, monkeypatch):
        monkeypatch.setattr(native, "_load", lambda: None)
        img = np.full((4, 4), 128.0, np.float32)
        got = native.requantize(img, 0.0, 255.0, 1.0, 0.0)
        np.testing.assert_array_equal(got, np.full((4, 4), 128, np.int16))
        m, mx, fr = native.epe_stats(img, img, img, img)
        assert m == 0.0

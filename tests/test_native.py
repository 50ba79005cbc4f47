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
    def test_unpack_calibrate(self, lib_built):
        rng = np.random.default_rng(0)
        counts = rng.integers(-2000, 14000, (257, 511)).astype(np.int16)
        got = native.unpack_calibrate(counts, 0.04, -0.5)
        want = counts.astype(np.float32) * np.float32(0.04) + np.float32(-0.5)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_extract_tile_halo(self, lib_built):
        rng = np.random.default_rng(1)
        src = rng.normal(0, 1, (37, 53)).astype(np.float32)
        got = native.extract_tile_halo(src, (8, 24), (16, 40), 5)
        want = np.pad(src, 5, mode="edge")[8:24 + 10, 16:40 + 10]
        np.testing.assert_array_equal(got, want)

    def test_tile_halo_at_edges(self, lib_built):
        src = np.arange(20, dtype=np.float32).reshape(4, 5)
        got = native.extract_tile_halo(src, (0, 4), (0, 5), 2)
        want = np.pad(src, 2, mode="edge")
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
        counts = np.arange(10, dtype=np.int16)
        got = native.unpack_calibrate(counts, 2.0, 1.0)
        np.testing.assert_allclose(got, counts * 2.0 + 1.0)
        src = np.ones((6, 6), np.float32)
        assert native.extract_tile_halo(src, (0, 6), (0, 6), 1).shape == (8, 8)
        m, mx, fr = native.epe_stats(src, src, src, src)
        assert m == 0.0

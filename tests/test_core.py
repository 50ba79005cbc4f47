"""Unit tests for core numerics against the loop-level oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from octane_tpu.core.interp import bicubic_sample, bilinear_sample
from octane_tpu.core.gaussian import gaussian_kernel_1d, blur_separable, solver_filtsize
from octane_tpu.core.zoom import (
    zoom_size, pyramid_downsample, zoom_in_flow, zoom_out_image, zoom_in_image)
from octane_tpu.core.normalize import band_min_max, normalize_image
from octane_tpu.core.bc import clamp_shift, mirror_shift

import reference_impl as ref


def _img(h=17, w=23, seed=3):
    rng = np.random.default_rng(seed)
    return rng.normal(100, 30, (h, w)).astype(np.float32)


class TestBC:
    def test_clamp_shift(self):
        a = jnp.asarray(_img())
        out = clamp_shift(a, 2, -1)
        np.testing.assert_array_equal(np.asarray(out[:, -1]), np.asarray(a[:, -1]))
        np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(a[:, 2]))

    def test_mirror_shift(self):
        a = jnp.asarray(_img())
        west = mirror_shift(a, -1, -1)
        np.testing.assert_array_equal(np.asarray(west[:, 0]), np.asarray(a[:, 1]))
        east = mirror_shift(a, 1, -1)
        np.testing.assert_array_equal(np.asarray(east[:, -1]), np.asarray(a[:, -2]))


class TestInterp:
    def test_bicubic_matches_oracle(self):
        img = _img()
        h, w = img.shape
        rng = np.random.default_rng(0)
        xs = rng.uniform(-1.5, w + 1.5, 64).astype(np.float32)
        ys = rng.uniform(-1.5, h + 1.5, 64).astype(np.float32)
        got = np.asarray(bicubic_sample(jnp.asarray(img), xs, ys))
        want = np.array([ref.bicubic(img, x, y) for x, y in zip(xs, ys)])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_bilinear_interior(self):
        img = _img()
        got = float(bilinear_sample(jnp.asarray(img), jnp.float32(3.5), jnp.float32(4.25)))
        want = (0.5 * (0.75 * img[4, 3] + 0.25 * img[5, 3])
                + 0.5 * (0.75 * img[4, 4] + 0.25 * img[5, 4]))
        assert abs(got - want) < 1e-4


class TestGaussian:
    def test_kernel_matches_oracle(self):
        k = gaussian_kernel_1d(1.2, 5)
        np.testing.assert_allclose(k, ref.gaussian_kernel(1.2, 5), rtol=1e-6)

    def test_blur_matches_oracle(self):
        img = _img()
        fs = 5
        k = gaussian_kernel_1d(1.04, fs)
        got = np.asarray(blur_separable(jnp.asarray(img), k, fs))
        want = ref.blur(img, np.asarray(k, np.float64), fs)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


class TestZoom:
    def test_zoom_size(self):
        assert zoom_size(512, 0.5) == 256
        assert zoom_size(21, 0.5) == 11
        assert zoom_size(5424, 0.125) == 678

    def test_pyramid_downsample_matches_oracle(self):
        img = _img(20, 26)
        got = np.asarray(pyramid_downsample(jnp.asarray(img), 0.5))
        want = ref.solver_downsample(img, 0.5)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_zoom_in_flow_matches_oracle(self):
        flow = _img(9, 11) / 30.0
        nyy, nxx = 18, 22
        got = np.asarray(zoom_in_flow(jnp.asarray(flow), (nyy, nxx), 0.5))
        want = ref.zoom_in_flow(flow, nxx, nyy, np.float32(0.5))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_zoom_roundtrip_shape(self):
        img = _img(32, 40)
        down = zoom_out_image(jnp.asarray(img), 0.5)
        assert down.shape == (16, 20)
        up = zoom_in_image(down, (32, 40), True)
        assert up.shape == (32, 40)
        up_nn = zoom_in_image(down, (32, 40), False)
        assert up_nn.shape == (32, 40)


class TestNormalize:
    def test_band_table(self):
        assert band_min_max(13) == (-1.6443, 185.5699)
        assert band_min_max(7) == (0.0, 2.0)     # meteorological sub-range
        with pytest.raises(ValueError):
            band_min_max(17)

    def test_rescale_endpoints(self):
        out = np.asarray(normalize_image(np.array([3.0, 6.0]), 3.0, 6.0))
        np.testing.assert_allclose(out, [0.0, 255.0])


class TestBoundedOps:
    """Trailing-padding variants must match unpadded ops at true positions."""

    def test_clamp_shift_bounded(self):
        import jax.numpy as jnp
        from octane_tpu.core.bc import clamp_shift
        rng = np.random.default_rng(0)
        a = rng.normal(0, 1, (7, 9)).astype(np.float32)
        ap = np.pad(a, ((0, 3), (0, 5)), mode="edge")
        for off in (-2, -1, 1, 2):
            for axis, tn in ((-1, 9), (-2, 7)):
                want = np.asarray(clamp_shift(jnp.asarray(a), off, axis))
                got = np.asarray(clamp_shift(jnp.asarray(ap), off, axis, tn))
                np.testing.assert_array_equal(got[:7, :9], want)

    def test_mirror_shift_bounded(self):
        import jax.numpy as jnp
        from octane_tpu.core.bc import mirror_shift
        rng = np.random.default_rng(1)
        a = rng.normal(0, 1, (6, 11)).astype(np.float32)
        ap = np.pad(a, ((0, 2), (0, 1)), mode="edge")
        for off in (-1, 1):
            for axis, tn in ((-1, 11), (-2, 6)):
                want = np.asarray(mirror_shift(jnp.asarray(a), off, axis))
                got = np.asarray(mirror_shift(jnp.asarray(ap), off, axis, tn))
                np.testing.assert_array_equal(got[:6, :11], want)

    def test_pyramid_downsample_bounded(self):
        import jax.numpy as jnp
        from octane_tpu.core.zoom import pyramid_downsample, zoom_size
        rng = np.random.default_rng(2)
        h, w = 27, 25
        a = rng.normal(50, 10, (h, w)).astype(np.float32)
        factor = 0.5
        want = np.asarray(pyramid_downsample(jnp.asarray(a), factor))
        hp, wp = 32, 28
        ap = np.pad(a, ((0, hp - h), (0, wp - w)), mode="edge")
        got = np.asarray(pyramid_downsample(jnp.asarray(ap), factor,
                                            true_in=(h, w)))
        tny, tnx = zoom_size(h, factor), zoom_size(w, factor)
        np.testing.assert_array_equal(got[:tny, :tnx], want)

    def test_zoom_in_flow_bounded(self):
        import jax.numpy as jnp
        from octane_tpu.core.zoom import zoom_in_flow, zoom_size
        rng = np.random.default_rng(3)
        ch, cw = 14, 13          # coarse true dims
        fh, fw = 27, 25          # fine true dims (zoom_size of 0.5 pyramid)
        a = rng.normal(0, 2, (ch, cw)).astype(np.float32)
        want = np.asarray(zoom_in_flow(jnp.asarray(a), (fh, fw), 0.5))
        ap = np.pad(a, ((0, 2), (0, 1)), mode="edge")      # padded coarse
        got = np.asarray(zoom_in_flow(jnp.asarray(ap), (32, 28), 0.5,
                                      true_in=(ch, cw), true_out=(fh, fw)))
        # the longer (zero-tap) matmul contraction may reassociate: ~1 ulp
        np.testing.assert_allclose(got[:fh, :fw], want, atol=2e-6, rtol=0)


class TestRowsRegrid:
    """Host-sharded regrid helpers: exact output row blocks of the full
    regrid from margin-extended source hyperslabs."""

    def _src(self):
        rng = np.random.default_rng(0)
        return rng.normal(100, 30, (97, 130)).astype(np.float32)

    def test_zoom_out_rows_exact(self):
        import jax.numpy as jnp
        from octane_tpu.core.zoom import zoom_out_image, zoom_out_image_rows
        src = self._src()
        f = 48 / 130
        full = np.asarray(zoom_out_image(jnp.asarray(src), f))
        nyy = full.shape[0]
        for r0, r1 in ((0, 7), (5, 20), (nyy - 6, nyy)):
            blk = np.asarray(zoom_out_image_rows(
                lambda s0, s1: src[s0:s1], 97, 130, f, (r0, r1)))
            np.testing.assert_array_equal(blk, full[r0:r1])

    def test_zoom_in_rows_exact(self):
        import jax.numpy as jnp
        from octane_tpu.core.zoom import zoom_in_image, zoom_in_image_rows
        src = self._src()
        for bic in (True, False):
            full = np.asarray(zoom_in_image(jnp.asarray(src), (201, 260), bic))
            for r0, r1 in ((0, 9), (50, 101), (195, 201)):
                blk = np.asarray(zoom_in_image_rows(
                    lambda s0, s1: src[s0:s1], 97, 130, (201, 260),
                    (r0, r1), bic))
                np.testing.assert_array_equal(blk, full[r0:r1])

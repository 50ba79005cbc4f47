"""Navigation and calibration tests."""

import math

import numpy as np
import jax.numpy as jnp

from octane_tpu.io.datamodel import NavConstants
from octane_tpu.nav.goes import (
    goes_latlon, goes_xy_from_latlon, planck_temp, kappa_reflectance,
    limb_ramp, navcal_goes)
from octane_tpu.nav.polar import polar_latlon
from octane_tpu.nav.mercator import mercator_latlon
from octane_tpu.nav.winds import haversine_m, pix2uv, uv2pix

# GOES-16 ABI constants (from the product file metadata format the reader
# ingests; values are the operational GOES-East set)
G16 = NavConstants(
    grid="goes",
    req=6378137.0, rpol=6356752.31414, pph=35786023.0,
    lam0=math.radians(-75.0), lpo=-75.0,
    x_scale=5.6e-05, x_offset=-0.101332, y_scale=-5.6e-05, y_offset=0.128212,
    nx=100, ny=100, min_x=0, min_y=0,
)


class TestFixedGrid:
    def test_subpoint(self):
        # note: exactly y=0 is flagged off-earth by the reference's sz==0
        # guard (oct_pix2uv_cuda.cu:119), so probe just off the equator line
        eps = 1e-7
        lat, lon = goes_latlon(jnp.asarray([eps]), jnp.asarray([eps]), G16)
        assert abs(float(lat[0])) < 1e-2
        assert abs(float(lon[0]) + 75.0) < 1e-2

    def test_roundtrip(self):
        xs = jnp.asarray(np.linspace(-0.08, 0.08, 10))   # avoids exact 0
        ys = jnp.asarray(np.linspace(-0.08, 0.08, 10))
        xg, yg = jnp.meshgrid(xs, ys)
        lat, lon = goes_latlon(xg, yg, G16)
        x2, y2 = goes_xy_from_latlon(lat, lon, G16)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(xg), atol=1e-9)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(yg), atol=1e-9)

    def test_off_disk_guard(self):
        lat, lon = goes_latlon(jnp.asarray([0.2]), jnp.asarray([0.2]), G16)
        assert float(lat[0]) == -999.0 and float(lon[0]) == -999.0
        xs, ys = goes_xy_from_latlon(jnp.asarray([0.0]), jnp.asarray([105.0]), G16)
        assert float(xs[0]) == -999.0   # far side of the earth


class TestCalibration:
    def test_planck_roundtrip(self):
        # band-13-like constants
        fk1, fk2, bc1, bc2 = 10803.3, 1392.74, 0.07544, 0.99975
        t = 270.0
        rad = fk1 / (math.exp(fk2 / (bc1 + bc2 * t)) - 1.0)
        got = float(planck_temp(jnp.asarray([rad]), fk1, fk2, bc1, bc2)[0])
        assert abs(got - t) < 1e-3

    def test_kappa(self):
        assert abs(float(kappa_reflectance(jnp.asarray([100.0]), 0.0015)[0]) - 0.15) < 1e-9

    def test_limb_ramp(self):
        vals = np.asarray(limb_ramp(jnp.asarray([0.0, 0.0205, 0.0211, 0.0213])))
        assert vals[0] == 1.0 and vals[1] == 1.0
        assert 0.0 < vals[2] < 1.0
        assert vals[3] == 0.0

    def test_navcal_normalizes(self):
        h = w = 8
        counts = jnp.full((h, w), 1000, jnp.int16)
        nav = NavConstants(grid="goes", x_scale=5.6e-05, x_offset=-0.000224 * 4,
                           y_scale=-5.6e-05, y_offset=0.000224 * 4,
                           rad_scale=(0.05, 1, 1), rad_offset=(-0.1, 0, 0),
                           req=G16.req, rpol=G16.rpol, pph=G16.pph, lam0=G16.lam0)
        data, lat, lon = navcal_goes(counts, jnp.arange(w), jnp.arange(h), nav,
                                     norm_min=0.0, norm_max=100.0, donav=True)
        want = (1000 * 0.05 - 0.1) / 100.0 * 255.0
        np.testing.assert_allclose(np.asarray(data), want, rtol=1e-5)
        assert np.isfinite(np.asarray(lat)).all()


class TestFlatGrids:
    def test_polar_pole_centre(self):
        nav = NavConstants(grid="polar", lat1=90.0, lon0_deg=0.0, R=6371000.0)
        lat, lon = polar_latlon(jnp.asarray([0.0]), jnp.asarray([0.0]), nav)
        assert abs(float(lat[0]) - 90.0) < 1e-6

    def test_polar_offset_south(self):
        nav = NavConstants(grid="polar", lat1=90.0, lon0_deg=0.0, R=6371000.0)
        # 111 km toward -y from the pole: about one degree down, lon 180
        lat, lon = polar_latlon(jnp.asarray([0.0]), jnp.asarray([-111195.0]), nav)
        assert abs(float(lat[0]) - 89.0) < 0.01

    def test_mercator(self):
        nav = NavConstants(grid="mercator", lon1=0.0, R=6371000.0)
        lat, lon = mercator_latlon(jnp.asarray([0.0]), jnp.asarray([0.0]), nav)
        assert abs(float(lat[0])) < 1e-9 and abs(float(lon[0])) < 1e-9
        lat, lon = mercator_latlon(jnp.asarray([6371000.0 * math.radians(10)]),
                                   jnp.asarray([0.0]), nav)
        assert abs(float(lon[0]) - 10.0) < 1e-6


class TestWinds:
    def test_haversine_equator_degree(self):
        d = float(haversine_m(0.0, 0.0, 0.0, 1.0))
        assert abs(d - 6371000.0 * math.radians(1.0)) < 1.0

    def test_pix2uv_translation_sign(self):
        h = w = 16
        nav = NavConstants(
            grid="goes", req=G16.req, rpol=G16.rpol, pph=G16.pph,
            lam0=G16.lam0, x_scale=5.6e-05, x_offset=-8.5 * 5.6e-05,
            y_scale=-5.6e-05, y_offset=8.5 * 5.6e-05,
            g2x_offset=-8.5 * 5.6e-05, g2y_offset=8.5 * 5.6e-05)
        u = np.full((h, w), 2.0, np.float32)      # eastward 2 px
        v = np.zeros((h, w), np.float32)
        uw, vw, ur, vr = pix2uv(u, v, nav, dt=600.0, grid="goes")
        uw = np.asarray(uw, np.float64) / 100.0
        # 2 px * 2 km / 600 s ~ 6.7 m/s eastward at the subpoint
        assert uw[8, 8] > 5.0
        assert abs(np.asarray(vr)[8, 8]) == 0
        np.testing.assert_array_equal(np.asarray(ur)[8, 8], 200)

    def test_uv2pix_roundtrip(self):
        h = w = 16
        nav = NavConstants(
            grid="goes", req=G16.req, rpol=G16.rpol, pph=G16.pph,
            lam0=G16.lam0, x_scale=5.6e-05, x_offset=-8.5 * 5.6e-05,
            y_scale=-5.6e-05, y_offset=8.5 * 5.6e-05,
            g2x_offset=-8.5 * 5.6e-05, g2y_offset=8.5 * 5.6e-05)
        ii = np.arange(w)
        jj = np.arange(h)
        xg = (ii * nav.x_scale + nav.x_offset)[None, :].repeat(h, 0)
        yg = (jj * nav.y_scale + nav.y_offset)[:, None].repeat(w, 1)
        lat, lon = goes_latlon(jnp.asarray(xg), jnp.asarray(yg), nav)
        u = np.full((h, w), 1.5, np.float32)
        v = np.full((h, w), -0.8, np.float32)
        uw, vw, _, _ = pix2uv(u, v, nav, dt=600.0, grid="goes")
        up, vp = uv2pix(np.asarray(uw) / 100.0, np.asarray(vw) / 100.0,
                        lat, lon, ii, jj, nav, 600.0, grid="goes")
        # round trip within the short-encoding quantization (~0.01 m/s)
        np.testing.assert_allclose(np.asarray(up), u, atol=0.05)
        np.testing.assert_allclose(np.asarray(vp), v, atol=0.05)

    def test_sector_move_guard(self):
        nav = NavConstants(grid="goes", x_offset=0.0, g2x_offset=0.5)
        u = np.ones((4, 4), np.float32)
        uw, vw, ur, vr = pix2uv(u, u, nav, dt=60.0)
        assert not np.asarray(uw).any() and not np.asarray(ur).any()

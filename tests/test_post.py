"""Post-processing tests: bilateral smoothing and temporal interpolation."""

import numpy as np
import jax.numpy as jnp

from octane_tpu.post.srsal import srsal_smooth
from octane_tpu.post.temporal import forward_splat, fill_holes, interpolate_frame

import reference_impl as ref


class TestSrsal:
    def test_matches_oracle(self):
        rng = np.random.default_rng(11)
        # window half-width is 18: image dims must exceed it for the oracle's
        # single-reflection boundary to be well-defined
        h, w = 22, 20
        u = rng.normal(0, 2, (h, w)).astype(np.float32)
        v = rng.normal(0, 2, (h, w)).astype(np.float32)
        cth = rng.uniform(0, 12000, (h, w)).astype(np.float32)
        want_u, want_v = ref.srsal(u, v, cth)
        got_u, got_v = srsal_smooth(jnp.asarray(u), jnp.asarray(v), jnp.asarray(cth))
        np.testing.assert_allclose(np.asarray(got_u), want_u, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_v), want_v, rtol=1e-4, atol=1e-4)

    def test_uniform_cth_is_gaussian_of_flow(self):
        h = w = 40
        u = np.zeros((h, w), np.float32)
        u[20, 20] = 1.0
        cth = np.full((h, w), 5000.0, np.float32)
        su, _ = srsal_smooth(jnp.asarray(u), jnp.asarray(u), jnp.asarray(cth))
        su = np.asarray(su)
        assert su.max() < 1.0 and su.min() >= 0.0
        assert abs(su.sum() - 1.0) < 0.05      # mass-preserving smoothing


class TestSplat:
    def test_matches_serial_oracle(self):
        rng = np.random.default_rng(13)
        h, w = 12, 14
        im1 = rng.normal(120, 20, (h, w)).astype(np.float32)
        im2 = rng.normal(120, 20, (h, w)).astype(np.float32)
        u = rng.normal(0, 1.5, (h, w)).astype(np.float32)
        v = rng.normal(0, 1.5, (h, w)).astype(np.float32)
        want_ut, want_vt = ref.warpflow(u, v, im1, im2, 0.5)
        got_ut, got_vt = forward_splat(
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(im1), jnp.asarray(im2),
            jnp.float32(0.5))
        np.testing.assert_allclose(np.asarray(got_ut), want_ut, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_vt), want_vt, atol=1e-5)

    def test_fill_holes_completes(self):
        ut = np.full((8, 8), -999.0, np.float32)
        ut[4, 4] = 2.0
        vt = ut.copy()
        fu, fv = fill_holes(jnp.asarray(ut), jnp.asarray(vt))
        assert (np.asarray(fu) > -998).all()
        np.testing.assert_allclose(np.asarray(fu), 2.0, atol=1e-5)


class TestInterpolateFrame:
    def test_static_scene_identity(self):
        rng = np.random.default_rng(17)
        im = rng.uniform(0, 255, (1, 16, 16)).astype(np.float32)
        z = jnp.zeros((16, 16), jnp.float32)
        img, occ = interpolate_frame(z, z, jnp.asarray(im), jnp.asarray(im), 0.5)
        # the reference's oct_bc(x, nx-1) clamp rewrites the final row/col
        # from row/col n-2 (oct_interp.cc:316-319), so compare the interior
        np.testing.assert_allclose(np.asarray(img)[:, :-1, :-1],
                                   im[:, :-1, :-1], atol=1e-3)
        np.testing.assert_allclose(np.asarray(img)[:, -1, :-1],
                                   im[:, -2, :-1], atol=1e-3)
        assert not np.asarray(occ).any()

    def test_translation_midpoint(self):
        h = w = 32
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        blob = lambda cx: (200 * np.exp(-(((xx - cx) ** 2 + (yy - 16) ** 2) / 18.0)))
        im1 = blob(12)[None]
        im2 = blob(16)[None]
        u = jnp.full((h, w), 4.0, jnp.float32)
        v = jnp.zeros((h, w), jnp.float32)
        img, _ = interpolate_frame(u, v, jnp.asarray(im1), jnp.asarray(im2), 0.5)
        mid = blob(14)
        err = np.abs(np.asarray(img)[0, 4:-4, 4:-4] - mid[4:-4, 4:-4]).max()
        assert err < 12.0      # sub-pixel blend error only

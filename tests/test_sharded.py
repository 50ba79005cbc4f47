"""Distributed correctness on a virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octane_tpu.config import OFConfig
from octane_tpu.flow.variational import variational_flow
from octane_tpu.flow.stencil import warp_bilinear_dense
from octane_tpu.parallel.mesh import make_mesh, flow_sharding
from octane_tpu.parallel.halo import halo_pad2d
from octane_tpu.parallel.sharded import make_sharded_warp, sharded_variational_flow

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _pair(h, w, shift=3.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    mk = lambda cx: 200 * np.exp(-(((xx - cx) ** 2 + (yy - h / 2) ** 2)
                                   / (2 * (w / 10) ** 2))) + 30
    return mk(w / 2 - shift / 2), mk(w / 2 + shift / 2)


class TestHalo:
    def test_halo_pad_matches_pad_edge(self):
        mesh = make_mesh((2, 4))
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (16, 32)).astype(np.float32)
        halo = 3

        @jax.jit
        def padded(x):
            from jax.sharding import PartitionSpec as P
            f = jax.shard_map(
                lambda b: halo_pad2d(b, halo),
                mesh=mesh, in_specs=P("dy", "dx"),
                out_specs=P("dy", "dx"))
            return f(x)

        out = np.asarray(padded(jax.device_put(x, flow_sharding(mesh))))
        # reassemble: each shard block is (8+2h, 8+2h); check one interior shard
        hl, wl = 8, 8
        blk = out.reshape(2, hl + 2 * halo, 4, wl + 2 * halo)
        b01 = blk[0, :, 1, :]     # shard (0,1)
        want = np.pad(x, halo, mode="edge")[0:hl + 2 * halo,
                                            wl:2 * wl + 2 * halo]
        np.testing.assert_array_equal(b01, want)


class TestShardedWarp:
    def test_matches_dense_for_small_flow(self):
        mesh = make_mesh((2, 4))
        h, w = 32, 64
        rng = np.random.default_rng(1)
        fields = rng.normal(0, 1, (3, h, w)).astype(np.float32)
        u = rng.uniform(-2.5, 2.5, (h, w)).astype(np.float32)
        v = rng.uniform(-2.5, 2.5, (h, w)).astype(np.float32)
        want, bx, by = warp_bilinear_dense(
            jnp.asarray(fields), jnp.asarray(u), jnp.asarray(v))
        warp = make_sharded_warp(mesh, (h, w), halo=6)
        got, gbx, gby = jax.jit(warp)(
            jax.device_put(jnp.asarray(fields),
                           jax.sharding.NamedSharding(
                               mesh, jax.sharding.PartitionSpec(None, "dy", "dx"))),
            jax.device_put(jnp.asarray(u), flow_sharding(mesh)),
            jax.device_put(jnp.asarray(v), flow_sharding(mesh)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(gbx), np.asarray(bx))
        np.testing.assert_array_equal(np.asarray(gby), np.asarray(by))


class TestShardedSolve:
    def test_matches_single_device(self):
        h = w = 64
        im1, im2 = _pair(h, w)
        z = np.zeros((h, w), np.float32)
        cfg = OFConfig(kiters=3, halo_warp=8)
        u1, v1 = variational_flow(im1, im2, z, z, cfg)
        mesh = make_mesh((2, 4))
        u2, v2 = sharded_variational_flow(im1, im2, z, z, cfg, mesh)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-3)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-3)

    def test_1d_mesh(self):
        h = w = 32
        im1, im2 = _pair(h, w, shift=1.5)
        z = np.zeros((h, w), np.float32)
        cfg = OFConfig(kiters=2, halo_warp=4, cgiters=10)
        u1, v1 = variational_flow(im1, im2, z, z, cfg)
        mesh = make_mesh((1, 8))
        u2, v2 = sharded_variational_flow(im1, im2, z, z, cfg, mesh)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-3)

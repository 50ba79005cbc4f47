"""The real Pallas kernels under shard_map, in interpret mode on CPU.

These run the ACTUAL sharded kernel code paths (banded fused CG with
ppermuted ghost strips; the warp kernel over halo-padded shard blocks with
the edge-band patches) on the 8-virtual-device CPU mesh -- the Mosaic
lowering itself is validated separately on hardware (tools/tpu_checks.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octane_tpu.parallel.mesh import make_mesh


@pytest.fixture
def interpret_pallas(monkeypatch):
    import octane_tpu.ops.pallas.cg as cgmod
    import octane_tpu.ops.pallas.sor as sormod
    import octane_tpu.ops.pallas.warp as warpmod
    import octane_tpu.parallel.sharded as sh

    monkeypatch.setenv("OCTANE_PALLAS_INTERPRET", "1")

    def clear():
        cgmod._build.cache_clear()
        sormod._build.cache_clear()
        warpmod._build.cache_clear()
        warpmod._stats_build.cache_clear()
        sh._warp_cache.clear()
        sh._sharded_program_cache.clear()

    clear()
    yield
    clear()


def _system(h, w, quad, seed=1):
    from octane_tpu.flow.stencil import StencilSystem

    rng = np.random.default_rng(seed)

    def arr(lo, hi):
        return jnp.asarray(rng.uniform(lo, hi, (h, w)).astype(np.float32))

    offd = ((jnp.float32(-1),) * 4 if quad
            else tuple(-arr(0.3, 1.0) for _ in range(4)))
    return StencilSystem(arr(4.5, 9.0), arr(-0.2, 0.2), arr(4.5, 9.0),
                         *offd, arr(-100, 100), arr(-100, 100))


@pytest.mark.parametrize("quad", [True, False])
def test_sharded_fused_cg_matches_pcg(interpret_pallas, quad):
    from octane_tpu.flow.stencil import apply_stencil
    from octane_tpu.flow.cg import pcg_solve
    from octane_tpu.parallel.cg import make_sharded_fused_cg, \
        sharded_cg_available

    mesh = make_mesh((2, 4))
    h, w = 128, 256
    assert sharded_cg_available((h, w), 8)
    s = _system(h, w, quad)
    du, dv = pcg_solve(
        lambda a, b: apply_stencil(s, a, b),
        s.a1, s.a4, s.bu, s.bv, jnp.float32(1e-8), 10)
    cg_fn = make_sharded_fused_cg(mesh)
    fu, fv = jax.jit(lambda s: cg_fn(s, jnp.float32(1e-8), 10))(s)
    scale = float(jnp.abs(du).max())
    d = max(float(jnp.abs(fu - du).max()), float(jnp.abs(fv - dv).max()))
    assert d / scale < 1e-4, f"rel diff {d / scale:.2e} (quad={quad})"


@pytest.mark.parametrize("quad", [True, False])
@pytest.mark.parametrize("iters", [8, 13])
def test_sharded_fused_sor_matches_xla_sor(interpret_pallas, quad, iters):
    """The temporal blocking AND the band split are exact, and the psum'd
    residual only gates the (never-binding) stopping rule -- so the sharded
    multi-sweep kernel runs the same sweep math as the single-device XLA
    sweep, including the remainder pass (13 -> 8+5, same kernel at a
    dynamic sweep count).  The CPU assertion is ulp-bounded: in interpret
    mode the kernel inlines into a different XLA program than the sweep,
    and XLA deletes ``optimization_barrier`` before codegen, so
    cross-program FMA-contraction drift of ~1e-7 relative per sweep is
    irreducible (see tests/test_sor_kernel.py).  Bitwise band-split
    invariance is asserted on hardware by tools/tpu_checks.py check_sor."""
    from octane_tpu.flow.cg import sor_solve
    from octane_tpu.parallel.sor import (make_sharded_fused_sor,
                                         sharded_sor_available)

    mesh = make_mesh((2, 4))
    h, w = 256, 256
    assert sharded_sor_available((h, w), 8)
    s = _system(h, w, quad)
    du, dv = jax.jit(lambda s, it=iters: sor_solve(s, 1e-8, it))(s)
    sor_fn = make_sharded_fused_sor(mesh)
    fu, fv = jax.jit(lambda s, it=iters: sor_fn(s, jnp.float32(1e-8), it))(s)
    scale = float(jnp.abs(du).max())
    d = max(float(jnp.abs(fu - du).max()), float(jnp.abs(fv - dv).max()))
    assert d / scale < 2e-5, f"rel diff {d / scale:.2e} (quad={quad})"


@pytest.mark.slow
def test_sharded_flow_solver_sor(interpret_pallas):
    """End-to-end sharded program with solver='sor': the banded multi-sweep
    kernel engages (cg_levels) and matches the single-device XLA-SOR
    program."""
    from octane_tpu.config import OFConfig
    from octane_tpu.flow.variational import variational_flow
    import octane_tpu.parallel.sharded as sh

    mesh = make_mesh((2, 4))
    h, w = 256, 256
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    im1 = (150 * np.exp(-(((xx - 100) ** 2 + (yy - 128) ** 2) / 600.0))
           + 30 + 10 * np.sin(xx / 7.0)).astype(np.float32)[None]
    im2 = (150 * np.exp(-(((xx - 103) ** 2 + (yy - 127) ** 2) / 600.0))
           + 30 + 10 * np.sin((xx - 3) / 7.0)).astype(np.float32)[None]
    z = np.zeros((h, w), np.float32)
    cfg_x = OFConfig(kiters=1, cgiters=8, solver="sor", use_pallas=False)
    want_u, want_v = variational_flow(im1, im2, z, z, cfg_x)
    cfg_p = cfg_x.replace(use_pallas=True)
    got_u, got_v = sh.sharded_variational_flow(im1, im2, z, z, cfg_p, mesh)
    assert sh.last_program_info["cg_levels"] == frozenset({0})
    scale = float(jnp.abs(want_u).max()) + 1e-6
    d = max(float(jnp.abs(got_u - want_u).max()),
            float(jnp.abs(got_v - want_v).max()))
    assert d / scale < 1e-3, f"rel diff {d / scale:.2e}"


def test_sharded_warp_pallas_matches_dense(interpret_pallas):
    from octane_tpu.flow.stencil import warp_bilinear_dense
    from octane_tpu.parallel.sharded import make_sharded_warp

    mesh = make_mesh((2, 4))
    h, w = 64, 128
    rng = np.random.default_rng(5)
    fields = jnp.asarray(rng.normal(0, 1, (3, h, w)).astype(np.float32))
    # displacements within reach, INCLUDING samples pushed into the
    # sub-pixel extrapolation bands at the right/bottom edges
    u = jnp.asarray(rng.uniform(-5, 5, (h, w)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-5, 5, (h, w)).astype(np.float32))
    u = u.at[:, -1].set(0.7)      # px in (w-1, w): extrapolation band
    v = v.at[-1, :].set(0.4)      # py in (h-1, h)
    warp = make_sharded_warp(mesh, (h, w), halo=8)
    assert warp is not None
    got, gbx, gby = warp(fields, u, v)
    want, bx, by = warp_bilinear_dense(fields, u, v)
    np.testing.assert_array_equal(np.asarray(gbx), np.asarray(bx))
    np.testing.assert_array_equal(np.asarray(gby), np.asarray(by))
    # positions are shifted into the halo frame, so (ii + halo) + u rounds
    # differently than ii + u by ~1 ulp -> float-level (not bitwise) parity;
    # bilinear continuity bounds the effect even at integer crossings
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)


@pytest.mark.slow
def test_sharded_flow_with_pallas_kernels(interpret_pallas):
    """End-to-end: the sharded program with the Pallas warp + banded CG
    engaged must match the plain XLA solve."""
    from octane_tpu.config import OFConfig
    from octane_tpu.flow.variational import variational_flow
    from octane_tpu.parallel.sharded import sharded_variational_flow

    mesh = make_mesh((2, 4))
    h, w = 128, 256
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    im1 = (150 * np.exp(-(((xx - 100) ** 2 + (yy - 64) ** 2) / 600.0))
           + 30 + 10 * np.sin(xx / 7.0)).astype(np.float32)[None]
    im2 = (150 * np.exp(-(((xx - 103) ** 2 + (yy - 63) ** 2) / 600.0))
           + 30 + 10 * np.sin((xx - 3) / 7.0)).astype(np.float32)[None]
    z = np.zeros((h, w), np.float32)
    cfg_x = OFConfig(kiters=1, cgiters=8, use_pallas=False)
    want_u, want_v = variational_flow(im1, im2, z, z, cfg_x)
    cfg_p = OFConfig(kiters=1, cgiters=8, use_pallas=True)
    got_u, got_v = sharded_variational_flow(im1, im2, z, z, cfg_p, mesh)
    scale = float(jnp.abs(want_u).max()) + 1e-6
    d = max(float(jnp.abs(got_u - want_u).max()),
            float(jnp.abs(got_v - want_v).max()))
    assert d / scale < 1e-3, f"rel diff {d / scale:.2e}"

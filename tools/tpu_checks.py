"""On-TPU correctness checks (run manually: python tools/tpu_checks.py).

The CI test suite runs on CPU where the Pallas kernels are disabled; this
script verifies on real hardware that
  * the Pallas warp kernel is bit-exact vs the XLA gather sampler at
    block-divisible AND arbitrary (real GOES sector) shapes,
  * displacement MAGNITUDE is unlimited (data-driven window origins):
    a 500-px uniform displacement is still bit-exact,
  * within-block displacement SPREAD beyond the window slack is detected
    by ``row_spread_within_reach`` (the pipeline's post-hoc warning),
  * the full solve with Pallas kernels matches the solve without them,
    including a 100-px translation.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp


def _check_shape(h, w, umax, vmax, label, ubias=0.0, vbias=0.0):
    from octane_tpu.ops.pallas.warp import make_pallas_warp
    from octane_tpu.flow.stencil import warp_bilinear_dense

    rng = np.random.default_rng(h * 7 + w)
    fields = jnp.asarray(rng.normal(0, 1, (6, h, w)).astype(np.float32))
    u = jnp.asarray((ubias + rng.uniform(-umax, umax, (h, w))).astype(np.float32))
    v = jnp.asarray((vbias + rng.uniform(-vmax, vmax, (h, w))).astype(np.float32))
    warp = make_pallas_warp((h, w))
    assert warp is not None, f"pallas warp unavailable at {h}x{w}"
    got, gbx, gby = jax.jit(warp)(fields, u, v)
    want, bx, by = jax.jit(warp_bilinear_dense)(fields, u, v)
    d = float(jnp.abs(got - want).max())
    assert d == 0.0, f"warp mismatch {d} at {h}x{w} ({label})"
    assert bool((gbx == bx).all() and (gby == by).all())
    print(f"warp {h}x{w} ({label}): bit-exact")


def check_warp():
    from octane_tpu.ops.pallas.warp import (
        pallas_warp_available, row_spread_within_reach)

    assert pallas_warp_available((5424, 5424))     # full-disk 2 km
    assert pallas_warp_available((21696, 21696))   # full-disk 0.5 km
    _check_shape(512, 512, 12, 12, "divisible")
    _check_shape(500, 500, 12, 12, "odd both")
    _check_shape(678, 1356, 20, 12, "pyramid of 5424")
    _check_shape(512, 5424, 30, 12, "full-disk width")
    # magnitude is unlimited: a jet-scale uniform displacement stays exact
    _check_shape(512, 640, 10, 10, "500-px jet", ubias=500.0, vbias=-120.0)
    _check_shape(512, 640, 10, 10, "negative jet", ubias=-300.0, vbias=77.0)
    # spread overflow is detected (not silently OK'd) by the post-hoc check
    rng = np.random.default_rng(0)
    v_wild = rng.uniform(-60, 60, (512, 640)).astype(np.float32)
    u_ok = rng.uniform(-10, 10, (512, 640)).astype(np.float32)
    assert not row_spread_within_reach(u_ok, v_wild, (512, 640))
    assert row_spread_within_reach(u_ok, 0 * v_wild, (512, 640))


def check_solver():
    from octane_tpu.config import OFConfig
    from octane_tpu.flow.variational import flow_program

    for hw in (512, 500):
        yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32)
        im1 = 200 * np.exp(-(((xx - 200) ** 2 + (yy - 256) ** 2) / 800.0)) + 30
        im2 = 200 * np.exp(-(((xx - 203) ** 2 + (yy - 256) ** 2) / 800.0)) + 30
        z = jnp.zeros((hw, hw), jnp.float32)
        args = (jnp.asarray(im1[None]), jnp.asarray(im2[None]), z, z)
        u1, v1 = flow_program(OFConfig(kiters=3, use_pallas=True), (hw, hw), 1)(*args)
        u2, v2 = flow_program(OFConfig(kiters=3, use_pallas=False), (hw, hw), 1)(*args)
        du = float(jnp.abs(u1 - u2).max())
        dvv = float(jnp.abs(v1 - v2).max())
        print(f"solver {hw} pallas-vs-xla: max |du|={du:.2e} |dv|={dvv:.2e}")
        # budget per path: the warp is bit-exact; the fused Pallas CG is
        # algorithmically exact (Chronopoulos-Gear == PCG, f64 rel 3e-13)
        # but its per-band tree dots + scalar recurrence reassociate vs
        # XLA's global sums (f32 per-solve rel ~4e-7..1e-4), and 27
        # relinearized solves compound that to ~1e-3 px end-to-end --
        # still ~65x below the 0.1-px EPE budget
        assert du < 5e-3 and dvv < 5e-3


def check_fused_cg():
    """Fused Pallas PCG vs the XLA loop: same Jacobi math/update order,
    per-band tree dots (float-level tolerance)."""
    from octane_tpu.flow.stencil import StencilSystem, apply_stencil
    from octane_tpu.flow.cg import pcg_solve
    from octane_tpu.ops.pallas.cg import pcg_solve_fused

    # 500: h % 64 != 0 exercises the row-padding decoupling (the real
    # full-disk case -- 5424 % 64 = 48) in BOTH quad and robust modes
    for h, w in ((512, 640), (500, 640)):
        rng = np.random.default_rng(1)

        def arr(lo, hi):
            return jnp.asarray(rng.uniform(lo, hi, (h, w)).astype(np.float32))

        diag = (arr(4.5, 9.0), arr(4.5, 9.0))
        offd = tuple(-arr(0.3, 1.0) for _ in range(4))
        rhs = (arr(-100, 100), arr(-100, 100))
        systems = {
            "robust": StencilSystem(diag[0], arr(-0.2, 0.2), diag[1],
                                    *offd, *rhs),
            "quad": StencilSystem(diag[0], arr(-0.2, 0.2), diag[1],
                                  *(jnp.float32(-1),) * 4, *rhs),
        }
        for name, s in systems.items():
            du, dv = jax.jit(lambda s: pcg_solve(
                lambda a, b: apply_stencil(s, a, b),
                s.a1, s.a4, s.bu, s.bv, jnp.float32(1e-8), 30))(s)
            fu, fv = jax.jit(
                lambda s: pcg_solve_fused(s, jnp.float32(1e-8), 30))(s)
            scale = float(jnp.abs(du).max())
            d = max(float(jnp.abs(fu - du).max()),
                    float(jnp.abs(fv - dv).max()))
            print(f"fused cg {name} {h}x{w}: rel diff {d / scale:.2e}")
            assert d / scale < 5e-4


def check_sor():
    """Multi-sweep temporally-blocked Pallas SOR vs the XLA red-black
    sweep: the overlap-band blocking is exact, so the budget is BIT-EXACT
    (same update order, division not reciprocal), including the remainder
    pass (iters=13 -> 8+5) and row padding (500 % 64 != 0)."""
    from octane_tpu.flow.stencil import StencilSystem
    from octane_tpu.flow.cg import sor_solve
    from octane_tpu.ops.pallas.sor import sor_solve_fused

    for h, w in ((512, 640), (500, 640)):
        rng = np.random.default_rng(2)

        def arr(lo, hi):
            return jnp.asarray(rng.uniform(lo, hi, (h, w)).astype(np.float32))

        diag = (arr(4.5, 9.0), arr(4.5, 9.0))
        rhs = (arr(-100, 100), arr(-100, 100))
        systems = {
            "robust": StencilSystem(diag[0], arr(-0.2, 0.2), diag[1],
                                    *tuple(-arr(0.3, 1.0) for _ in range(4)),
                                    *rhs),
            "quad": StencilSystem(diag[0], arr(-0.2, 0.2), diag[1],
                                  *(jnp.float32(-1),) * 4, *rhs),
        }
        for name, s in systems.items():
            for iters in (8, 13):
                du, dv = jax.jit(
                    lambda s, it=iters: sor_solve(s, 1e-8, it))(s)
                fu, fv = jax.jit(
                    lambda s, it=iters: sor_solve_fused(s, 1e-8, it))(s)
                d = max(float(jnp.abs(fu - du).max()),
                        float(jnp.abs(fv - dv).max()))
                print(f"fused sor {name} {h}x{w} iters={iters}: "
                      f"max abs diff {d:.2e}")
                assert d == 0.0, "fused SOR must be bit-exact"


def check_sor_solver_epe():
    """End-to-end: solver='sor' (fused kernel) vs the reference-exact
    PCG-30 program at a product-like shape -- the promotion evidence.
    Budget: mean EPE well under the 0.1-px product budget (measured
    ~0.006 px mean / ~0.02 px p99, scale-independent 512..2712)."""
    from octane_tpu.config import OFConfig
    from octane_tpu.flow.variational import flow_program

    hw = 1356   # 5424-pyramid shape
    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32)
    rng = np.random.default_rng(3)
    im1 = (120 * np.exp(-(((xx - 400) ** 2 + (yy - 500) ** 2) / 9000.0))
           + 50 * np.sin(xx / 9.0) * np.cos(yy / 7.0) + 60
           + rng.normal(0, 2, (hw, hw))).astype(np.float32)
    im2 = (120 * np.exp(-(((xx - 402.4) ** 2 + (yy - 500) ** 2) / 9000.0))
           + 50 * np.sin((xx - 2.4) / 9.0) * np.cos(yy / 7.0) + 60
           + rng.normal(0, 2, (hw, hw))).astype(np.float32)
    z = jnp.zeros((hw, hw), jnp.float32)
    args = (jnp.asarray(im1[None]), jnp.asarray(im2[None]), z, z)
    up, vp = flow_program(OFConfig(kiters=4), (hw, hw), 1)(*args)
    us, vs = flow_program(OFConfig(kiters=4, solver="sor"), (hw, hw), 1)(*args)
    epe = np.sqrt((np.asarray(us) - np.asarray(up)) ** 2
                  + (np.asarray(vs) - np.asarray(vp)) ** 2)
    print(f"sor-30 vs pcg-30 flow {hw}^2: EPE mean {epe.mean():.4f} "
          f"p99 {np.percentile(epe, 99):.4f} max {epe.max():.4f}")
    assert epe.mean() < 0.02 and np.percentile(epe, 99) < 0.05


def check_bilateral():
    """Pallas SRSAL kernel vs the XLA fori_loop path (same taps/boundary;
    accumulation order differs -> float-level tolerance)."""
    import unittest.mock as mock
    import octane_tpu.post.srsal as srsal_mod
    from octane_tpu.ops.pallas import bilateral as bl

    for h, w in ((512, 512), (500, 700)):
        rng = np.random.default_rng(h + w)
        u = jnp.asarray(rng.normal(0, 3, (h, w)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 3, (h, w)).astype(np.float32))
        cth = jnp.asarray(rng.normal(8000, 40, (h, w)).astype(np.float32))
        kern = bl.make_pallas_bilateral((h, w))
        assert kern is not None
        gu, gv = jax.jit(kern)(u, v, cth)
        with mock.patch.object(bl, "pallas_bilateral_available",
                               lambda s: False):
            wu, wv = srsal_mod.srsal_smooth(u, v, cth)
        du = float(jnp.abs(gu - wu).max() / jnp.abs(wu).max())
        dvv = float(jnp.abs(gv - wv).max() / jnp.abs(wv).max())
        print(f"bilateral {h}x{w}: rel |du|={du:.2e} |dv|={dvv:.2e}")
        assert du < 1e-5 and dvv < 1e-5


def check_reach_recovery():
    """A 100-px translation (beyond kernel reach at the finest level) must
    still produce correct flow through the guarded Pallas path."""
    from octane_tpu.config import OFConfig
    from octane_tpu.flow.variational import flow_program

    h, w = 512, 1024
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    shift = 100.0

    def scene(s):
        return (120 * np.exp(-(((xx - s - w / 2) ** 2 + (yy - h / 2) ** 2)
                               / (2 * 50.0 ** 2)))
                + 40 * np.sin((xx - s) / 17.0) * np.cos(yy / 13.0) + 60)

    im1, im2 = scene(0.0), scene(shift)
    u0 = jnp.full((h, w), np.float32(shift * 0.9))   # first guess near truth
    z = jnp.zeros((h, w), jnp.float32)
    u, v = flow_program(OFConfig(kiters=1, lambdac=0.05), (h, w), 1)(
        jnp.asarray(im1[None], jnp.float32), jnp.asarray(im2[None], jnp.float32),
        u0, z)
    c = np.s_[64:-64, 256:-256]
    err = float(jnp.abs(u[c] - shift).mean())
    print(f"100-px translation: mean |u - 100| = {err:.3f} px")
    # the lambdac hint biases toward the 90-px first guess; the XLA path
    # lands at ~0.96 px with these settings, so <2 px means the Pallas
    # windows followed the 100-px displacement rather than clamping
    assert err < 2.0, "large-displacement recovery failed"


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    check_warp()
    check_solver()
    check_fused_cg()
    check_sor()
    check_sor_solver_epe()
    check_bilateral()
    check_reach_recovery()
    print("all TPU checks passed")

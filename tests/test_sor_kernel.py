"""Parity tests for the multi-sweep red-black SOR Pallas kernel.

The kernel (ops/pallas/sor.py) runs the same sweep math as the XLA
red-black sweep (flow/cg.py sor_solve) through temporal blocking, colour
packing and band decomposition.  On CPU these tests run the kernel in
interpret mode, where the kernel body is INLINED into the surrounding XLA
program -- and XLA deletes ``optimization_barrier`` late in its pipeline
(optimized HLO contains zero ``opt-barrier`` ops), so codegen-level FMA
contraction differs between compilation contexts and bitwise equality
between separately compiled programs is NOT an achievable contract (the
measured cross-program drift is ~1e-7 relative per sweep and does not
accumulate: SOR's contraction damps it).  CPU assertions are therefore
ulp-bounded; the BITWISE contracts -- same-Mosaic-executable pass-split
invariance and the empirical kernel-vs-twin agreement -- are asserted on
hardware by tools/tpu_checks.py check_sor every round.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octane_tpu.flow.stencil import StencilSystem
from octane_tpu.flow.cg import sor_solve
from octane_tpu.ops.pallas.sor import sor_solve_fused


def _make_sys(h, w, quad, seed=0):
    rng = np.random.default_rng(seed)

    def f(lo, hi):
        return jnp.asarray(rng.uniform(lo, hi, (h, w)).astype(np.float32))

    if quad:
        a5 = a6 = a7 = a8 = jnp.float32(-1.0)
    else:
        a5, a6, a7, a8 = (-f(0.2, 1.2) for _ in range(4))
    # diag dominated by the +4/psistot smoothness terms, like the real system
    a1, a4, a2 = f(4.5, 9.0), f(4.5, 9.0), f(-0.4, 0.4)
    return StencilSystem(a1, a2, a4, a5, a6, a7, a8, f(-1, 1), f(-1, 1))


def _assert_close(a, b, rel=2e-5):
    """Ulp-bounded agreement: max |a - b| relative to the iterate scale.
    Observed cross-program drift is ~5e-6 relative after 30 sweeps; rel
    gives ~4x headroom while still catching any real defect (a wrong
    neighbour, mirror, coefficient or sweep count shows up at >= 1e-2)."""
    a = np.asarray(a)
    b = np.asarray(b)
    scale = max(np.abs(a).max(), 1e-3)
    d = np.abs(a - b).max() / scale
    assert d < rel, f"rel diff {d:.3e} exceeds {rel:.0e}"


class TestSorKernel:
    @pytest.mark.parametrize("shape", [(128, 256), (133, 257), (200, 300)])
    @pytest.mark.parametrize("quad", [True, False])
    def test_matches_xla_sweep(self, shape, quad):
        h, w = shape
        sysm = _make_sys(h, w, quad)
        du0, dv0 = sor_solve(sysm, 1e-8, 8)
        du1, dv1 = sor_solve_fused(sysm, 1e-8, 8, interpret=True)
        _assert_close(du0, du1)
        _assert_close(dv0, dv1)

    @pytest.mark.parametrize("iters", [3, 5, 8, 13, 16, 30])
    def test_remainder_pass(self, iters):
        """Iteration counts that don't divide the 8-sweep pass run an extra
        remainder pass through the SAME kernel at a dynamic sweep count --
        30 is the production default cgiters; results must match the XLA
        sweep sweep-for-sweep (ulp-bounded; see module docstring)."""
        sysm = _make_sys(150, 260, False, seed=1)
        du0, dv0 = sor_solve(sysm, 1e-8, iters)
        du1, dv1 = sor_solve_fused(sysm, 1e-8, iters, interpret=True)
        _assert_close(du0, du1)
        _assert_close(dv0, dv1)

    def test_pass_split_invariance(self):
        """run(x, 5 then 3) vs run(x, 8): the dynamic sweep count feeds one
        kernel, so any split of the sweep budget across passes agrees (the
        hand-off through unpack -> HBM -> repack and the ghost-strip plumbing
        is exact; on hardware the shared Mosaic executable makes this
        bitwise -- asserted by tools/tpu_checks.py check_sor)."""
        from octane_tpu.ops.pallas import sor as S

        h, w = 150, 260
        sysm = _make_sys(h, w, False, seed=2)
        wp = -(-w // 256) * 256
        call, hp, _, ho = S._build(h, wp, False, 1.9, True,
                                   true_h=h, true_w=w)
        cf = S.build_cf(sysm, hp, wp, False)
        x0 = jnp.zeros((2, hp, wp), jnp.float32)

        def sc(ns):
            return jnp.array([0, 0, ns], jnp.int32)

        whole, _ = call(sc(8), x0, cf)
        part, _ = call(sc(5), x0, cf)
        split, _ = call(sc(3), part, cf)
        _assert_close(whole, split, rel=1e-5)

    def test_omega_threads_through(self):
        sysm = _make_sys(128, 256, False, seed=2)
        du0, _ = sor_solve(sysm, 1e-8, 6, omega=1.5)
        du1, _ = sor_solve_fused(sysm, 1e-8, 6, omega=1.5, interpret=True)
        _assert_close(du0, du1)
        du2, _ = sor_solve_fused(sysm, 1e-8, 6, omega=1.9, interpret=True)
        assert float(jnp.abs(du1 - du2).max()) > 1e-4

    def test_full_grid_residual_stopping(self):
        """The per-pass stopping residual is the FULL-GRID ||b - A x||^2 of
        the incoming iterate (red rows from the first half-sweep, black
        rows from a dedicated evaluation at the same iterate) -- the same
        quantity flow.cg.sor_solve's rule tests, NOT the red half only."""
        from octane_tpu.flow.stencil import apply_stencil
        from octane_tpu.ops.pallas import sor as S

        h, w = 128, 256
        sysm = _make_sys(h, w, False, seed=4)
        wp = w
        call, hp, _, _ = S._build(h, wp, False, 1.9, True,
                                  true_h=h, true_w=w)
        cf = S.build_cf(sysm, hp, wp, False)
        # nonzero incoming iterate so red and black residuals differ; the
        # padding rows/cols stay zero (their identity equations contribute
        # zero residual only at x == 0, which is where the solver keeps
        # them)
        rng = np.random.default_rng(5)
        x = jnp.zeros((2, hp, wp), jnp.float32).at[:, :h, :w].set(
            jnp.asarray(rng.normal(0, 0.3, (2, h, w)).astype(np.float32)))
        _, res = call(jnp.array([0, 0, 1], jnp.int32), x, cf)
        got = float(jnp.sum(res, dtype=jnp.float32))
        au, av = apply_stencil(sysm, x[0, :h, :w], x[1, :h, :w])
        want = float(jnp.sum((sysm.bu - au) ** 2, dtype=jnp.float32)
                     + jnp.sum((sysm.bv - av) ** 2, dtype=jnp.float32))
        assert abs(got - want) / want < 1e-5, (got, want)

    def test_tol_stops_converged_system(self):
        """When the tolerance binds, the fused path stops within one pass of
        the XLA sweep-granular check, skips the remainder pass, and meets
        the same residual bound.  (omega=1 -- plain Gauss-Seidel -- because
        the random test system is not SPD, unlike the real Euler-Lagrange
        system, so over-relaxation has no convergence guarantee here.)"""
        from octane_tpu.flow.stencil import apply_stencil

        sysm = _make_sys(128, 256, False, seed=3)
        tol = 1e-3
        du, dv = sor_solve_fused(sysm, tol, 259, omega=1.0, interpret=True)
        au, av = apply_stencil(sysm, du, dv)
        resid = float(jnp.sum((sysm.bu - au) ** 2 + (sysm.bv - av) ** 2))
        assert resid <= tol


class TestSorEndToEnd:
    @pytest.mark.slow
    def test_flow_program_uses_fused_sor(self, monkeypatch):
        """solver='sor' + interpret-mode Pallas: the full pyramid program
        routes through the fused kernel and matches the XLA-SOR program
        (ulp-bounded; see module docstring)."""
        monkeypatch.setenv("OCTANE_PALLAS_INTERPRET", "1")
        from octane_tpu.config import OFConfig
        import octane_tpu.flow.variational as varmod

        h = w = 144
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        im1 = 150 * np.exp(-((xx - 70) ** 2 + (yy - 70) ** 2) / 500) + 40
        im2 = 150 * np.exp(-((xx - 72) ** 2 + (yy - 70) ** 2) / 500) + 40
        g1 = jnp.asarray(im1[None])
        g2 = jnp.asarray(im2[None])
        z = jnp.zeros((h, w), jnp.float32)

        cfg = OFConfig(kiters=1, cgiters=8, liters=1, gnc_steps=2,
                       solver="sor", use_pallas=True)
        varmod._program_cache.clear()
        u1, v1 = varmod.flow_program(cfg, (h, w), 1)(g1, g2, z, z)

        # same program with ONLY the fused-SOR selection disabled (the
        # Pallas warp stays in both) -- isolates the solver swap
        import octane_tpu.ops.pallas.sor as sormod
        monkeypatch.setattr(sormod, "pallas_sor_available", lambda s: False)
        varmod._program_cache.clear()
        u0, v0 = varmod.flow_program(cfg, (h, w), 1)(g1, g2, z, z)
        varmod._program_cache.clear()
        # flow magnitudes are O(1) px; the solver iterate drift is ~1e-5 px
        assert float(jnp.abs(u0 - u1).max()) < 1e-4
        assert float(jnp.abs(v0 - v1).max()) < 1e-4

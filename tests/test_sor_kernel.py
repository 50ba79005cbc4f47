"""Parity tests for the multi-sweep red-black SOR Pallas kernel.

The kernel (ops/pallas/sor.py) claims BIT-EXACT equivalence to the XLA
red-black SOR (flow/cg.py sor_solve) -- the temporal blocking recomputes
overlap rows rather than approximating them -- so these tests assert
exact equality in interpret mode, across odd shapes (band padding), both
GNC coefficient modes, and iteration counts that exercise the remainder
pass.  Hardware (Mosaic) parity is covered by tools/tpu_checks.py.
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


class TestSorKernel:
    @pytest.mark.parametrize("shape", [(128, 256), (133, 257), (200, 300)])
    @pytest.mark.parametrize("quad", [True, False])
    def test_bit_exact_vs_xla(self, shape, quad):
        h, w = shape
        sysm = _make_sys(h, w, quad)
        du0, dv0 = sor_solve(sysm, 1e-8, 8)
        du1, dv1 = sor_solve_fused(sysm, 1e-8, 8, interpret=True)
        np.testing.assert_array_equal(np.asarray(du0), np.asarray(du1))
        np.testing.assert_array_equal(np.asarray(dv0), np.asarray(dv1))

    @pytest.mark.parametrize("iters", [3, 8, 13])
    def test_remainder_pass(self, iters):
        """Iteration counts that don't divide the 8-sweep pass run an extra
        remainder kernel; results must still match sweep-for-sweep."""
        sysm = _make_sys(150, 260, False, seed=1)
        du0, dv0 = sor_solve(sysm, 1e-8, iters)
        du1, dv1 = sor_solve_fused(sysm, 1e-8, iters, interpret=True)
        np.testing.assert_array_equal(np.asarray(du0), np.asarray(du1))
        np.testing.assert_array_equal(np.asarray(dv0), np.asarray(dv1))

    def test_omega_threads_through(self):
        sysm = _make_sys(128, 256, False, seed=2)
        du0, _ = sor_solve(sysm, 1e-8, 6, omega=1.5)
        du1, _ = sor_solve_fused(sysm, 1e-8, 6, omega=1.5, interpret=True)
        np.testing.assert_array_equal(np.asarray(du0), np.asarray(du1))
        du2, _ = sor_solve_fused(sysm, 1e-8, 6, omega=1.9, interpret=True)
        assert float(jnp.abs(du1 - du2).max()) > 0.0

    def test_tol_stops_converged_system(self):
        """When the tolerance binds, the fused path stops within one pass of
        the XLA sweep-granular check and meets the same residual bound.
        (omega=1 -- plain Gauss-Seidel -- because the random test system is
        not SPD, unlike the real Euler-Lagrange system, so over-relaxation
        has no convergence guarantee here.)"""
        from octane_tpu.flow.stencil import apply_stencil

        sysm = _make_sys(128, 256, False, seed=3)
        tol = 1e-3
        du, dv = sor_solve_fused(sysm, tol, 256, omega=1.0, interpret=True)
        au, av = apply_stencil(sysm, du, dv)
        resid = float(jnp.sum((sysm.bu - au) ** 2 + (sysm.bv - av) ** 2))
        assert resid <= tol


class TestSorEndToEnd:
    def test_flow_program_uses_fused_sor(self, monkeypatch):
        """solver='sor' + interpret-mode Pallas: the full pyramid program
        routes through the fused kernel and matches the XLA-SOR program
        bit-for-bit."""
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
        np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))

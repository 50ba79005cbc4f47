"""Fused Pallas assembly (ops.pallas.assemble) in interpret mode on CPU.

Validates the warp -> assemble -> SOR fused chain against the XLA assembly
path: the kernel must emit the exact build_cf coefficient stack (same plane
order, padding identity rows, hoisted rdet) and the ||b||^2 stopping seed.
Cross-program agreement is ulp-bounded, not bitwise (the SOR kernel's
documented contract: XLA deletes optimization_barrier late, so FMA
contraction varies between separately compiled programs); feeding BOTH
paths the same warp samples isolates the assembly itself to < ~1e-6 rel.
tools/tpu_checks.py check_assemble re-records the on-chip delta each round.
"""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture
def interpret_pallas(monkeypatch):
    import octane_tpu.ops.pallas.assemble as asmmod
    import octane_tpu.ops.pallas.sor as sormod
    import octane_tpu.ops.pallas.warp as warpmod

    monkeypatch.setenv("OCTANE_PALLAS_INTERPRET", "1")

    def clear():
        asmmod._build.cache_clear()
        sormod._build.cache_clear()
        warpmod._build.cache_clear()
        warpmod._stats_build.cache_clear()

    clear()
    yield
    clear()


def _inputs(h, w, seed=0):
    from octane_tpu.core.gradients import gradient_4th

    rng = np.random.default_rng(seed)
    g1 = jnp.asarray(rng.normal(100, 30, (1, h, w)).astype(np.float32))
    g2 = jnp.asarray(rng.normal(100, 30, (1, h, w)).astype(np.float32))
    u = jnp.asarray(rng.uniform(-3, 3, (h, w)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-3, 3, (h, w)).astype(np.float32))
    gx1, gy1 = gradient_4th(g1, None)
    gx2, gy2 = gradient_4th(g2, None)
    gxx, _ = gradient_4th(gx2, None)
    gxy, gyy = gradient_4th(gy2, None)
    stack = jnp.concatenate([g2, gx2, gy2, gxx, gxy, gyy], axis=0)
    return g1, g2, gx1, gy1, gx2, gy2, gxx, gxy, gyy, u, v, stack


@pytest.mark.parametrize("quad", [True, False])
def test_fused_assemble_matches_xla_cf(interpret_pallas, quad):
    """Same-samples comparison: the fused kernel's coefficient stack must
    match assemble + build_cf to float-noise level on every plane,
    including the padded identity rows and the rdet plane."""
    from octane_tpu.flow.stencil import assemble
    from octane_tpu.ops.pallas.sor import build_cf
    from octane_tpu.ops.pallas.assemble import (fused_geometry,
                                                make_fused_assemble)
    from octane_tpu.ops.pallas.warp import make_pallas_warp

    h, w = 136, 280
    (g1, g2, gx1, gy1, gx2, gy2, gxx, gxy, gyy, u, v, stack) = _inputs(h, w)
    uhat, vhat = u * 0.5, v * 0.5
    alpha, lam_a = jnp.float32(5.0), jnp.float32(0.2)
    lambdac = jnp.float32(0.1)
    al1 = jnp.float32(1.0 if quad else 0.5)

    pad_shape = fused_geometry((h, w), 13)
    hp, wp = pad_shape
    wf = make_pallas_warp((h, w), pad_to=pad_shape, crop=False)
    stack_p = wf.pad(stack)

    def pad2(a):
        return jnp.pad(a, ((0, hp - h), (0, wp - w)))

    g1s = jnp.pad(jnp.concatenate([g1, gx1, gy1], axis=0),
                  ((0, 0), (0, hp - h), (0, wp - w)))
    u_p, v_p = pad2(u), pad2(v)
    smp, bcx, bcy = wf(stack_p, u_p, v_p)

    # both paths consume the SAME samples (hardware makes them bit-equal;
    # CPU interpret mode does not -- see module docstring)
    def fixed_warp(s, uu, vv):
        return smp[:, :h, :w], bcx[:h, :w], bcy[:h, :w]

    sysm = assemble(g1, g2, gx1, gy1, gx2, gy2, gxx, gxy, gyy,
                    u, v, uhat, vhat, al1, alpha, lam_a, lambdac, True,
                    warp_fn=fixed_warp, al1_static=1.0 if quad else None)
    want = np.asarray(build_cf(sysm, hp, wp, quad))

    asm = make_fused_assemble((h, w), pad_shape, 1, quad, True,
                              interpret=True)
    got_cf, got_r0 = asm(al1, lambdac, alpha, lam_a, g1s, smp, bcx, bcy,
                         u_p, v_p, pad2(uhat), pad2(vhat))
    got = np.asarray(got_cf)

    assert got.shape == want.shape
    rel = np.abs(got - want) / (np.abs(want) + 1.0)
    assert rel.max() < 2e-6, rel.max()
    # padded rows are exact identity equations (bitwise)
    np.testing.assert_array_equal(got[:, h:], want[:, h:])
    np.testing.assert_array_equal(got[:, :, w:], want[:, :, w:])
    r0_want = float(jnp.sum(sysm.bu ** 2) + jnp.sum(sysm.bv ** 2))
    assert abs(float(got_r0) - r0_want) <= 1e-6 * r0_want


def test_solve_level_fused_matches_plain(interpret_pallas):
    """Whole-level equivalence: the fully fused chain (fused_asm path)
    vs the XLA-assembly + fused-SOR path, same settings, remainder-pass
    iteration count.  Tolerance covers interpret mode's cross-program
    warp/solver drift; on chip the chain is checked by tpu_checks."""
    from octane_tpu.flow.variational import solve_level
    from octane_tpu.ops.pallas.assemble import fused_geometry
    from octane_tpu.ops.pallas.warp import make_pallas_warp

    h, w = 136, 280
    rng = np.random.default_rng(7)
    base = rng.normal(100, 25, (h, w + 8)).astype(np.float32)
    g1 = jnp.asarray(base[:, 2:2 + w][None])
    g2 = jnp.asarray(base[:, 0:w][None])          # ~2 px true shift
    z = jnp.zeros((h, w), jnp.float32)
    args = (jnp.float32(5.0), jnp.float32(0.2), jnp.float32(0.05),
            jnp.float32(1e-8))
    kw = dict(liters=2, cgiters=13, gnc_steps=3, dozim=True, solver="sor")

    pad_shape = fused_geometry((h, w), 13)
    wf_f = make_pallas_warp((h, w), pad_to=pad_shape, crop=False)
    uf, vf = solve_level(g1, g2, z, z, z, z, *args, **kw,
                         warp_fn=wf_f, fused_asm=pad_shape)

    wf_p = make_pallas_warp((h, w))
    up, vp = solve_level(g1, g2, z, z, z, z, *args, **kw,
                         warp_fn=wf_p, fused_cg=True)

    du = np.abs(np.asarray(uf) - np.asarray(up))
    dv = np.abs(np.asarray(vf) - np.asarray(vp))
    # interpret mode re-compiles the warp into a different surrounding
    # program per path, so its ~1 ulp sample drift is amplified by the
    # near-singular psi terms over 6 relinearizations; the bulk of the
    # field still agrees to ~1e-3 px and hardware is far tighter
    # (check_assemble records the on-chip delta)
    assert du.max() < 2e-2 and dv.max() < 2e-2, (du.max(), dv.max())
    assert np.percentile(du, 99) < 2e-3 and np.percentile(dv, 99) < 2e-3
    # and the solve did real work (moved toward the -2 px shift; a single
    # level from zero init recovers only part of it)
    interior = np.asarray(uf)[8:-8, 8:-8]
    assert float(np.mean(interior)) < -0.05
    assert float(np.std(interior)) > 1e-3

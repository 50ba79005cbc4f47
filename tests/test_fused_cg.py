"""Fused Pallas PCG vs the XLA loop, in interpret mode on CPU.

The real-hardware run is covered by tools/tpu_checks.py::check_fused_cg;
these interpret-mode tests guard the kernel's index/boundary logic where CPU
CI can see it -- in particular the hp-h row-padding decoupling (h % 64 != 0,
the real full-disk case: 5424 % 64 = 48), which in quad mode once polluted
the SMEM dot products through the scalar -1 off-diagonals.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octane_tpu.flow.stencil import StencilSystem, apply_stencil
from octane_tpu.flow.cg import pcg_solve
from octane_tpu.ops.pallas.cg import pcg_solve_fused


def _system(h, w, quad, seed=1):
    rng = np.random.default_rng(seed)

    def arr(lo, hi):
        return jnp.asarray(rng.uniform(lo, hi, (h, w)).astype(np.float32))

    diag = (arr(4.5, 9.0), arr(4.5, 9.0))
    rhs = (arr(-100, 100), arr(-100, 100))
    if quad:
        offd = (jnp.float32(-1),) * 4
    else:
        offd = tuple(-arr(0.3, 1.0) for _ in range(4))
    return StencilSystem(diag[0], arr(-0.2, 0.2), diag[1], *offd, *rhs)


@pytest.mark.parametrize("quad", [True, False])
@pytest.mark.parametrize("h", [128, 96])   # 96: hp-h = 32 padded rows
def test_fused_matches_xla_pcg(h, quad):
    w = 256
    s = _system(h, w, quad)
    du, dv = pcg_solve(
        lambda a, b: apply_stencil(s, a, b),
        s.a1, s.a4, s.bu, s.bv, jnp.float32(1e-8), 12)
    fu, fv = pcg_solve_fused(s, jnp.float32(1e-8), 12, interpret=True)
    scale = float(jnp.abs(du).max())
    d = max(float(jnp.abs(fu - du).max()), float(jnp.abs(fv - dv).max()))
    # per-band tree dots reassociate vs the global jnp.sum: float-level budget
    assert d / scale < 1e-4, f"rel diff {d / scale:.2e} (h={h}, quad={quad})"


def test_padded_rows_stay_decoupled():
    """With h % 64 != 0 the padded rows must hold exactly zero residual and
    zero solution -- any leakage corrupts alpha/beta for the true rows."""
    h, w = 96, 256
    s = _system(h, w, quad=True, seed=3)
    fu, fv = pcg_solve_fused(s, jnp.float32(1e-8), 6, interpret=True)
    assert fu.shape == (h, w) and fv.shape == (h, w)
    du, dv = pcg_solve(
        lambda a, b: apply_stencil(s, a, b),
        s.a1, s.a4, s.bu, s.bv, jnp.float32(1e-8), 6)
    # row h-1 (adjacent to the padding) is where pollution lands first
    edge = float(jnp.abs(fu[h - 1] - du[h - 1]).max())
    assert edge < 1e-3 * float(jnp.abs(du).max())

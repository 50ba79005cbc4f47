"""Robust penalty derivatives.

psi'(x) = 1/sqrt(x + 1e-6), used for both the data and smoothness terms
(oct_PSI_data_cu / oct_PSI_smooth_cu, oct_variational_optical_flow.cu:72-108).
The quadratic variant (graduated non-convexity) is the constant 1 and is
handled by the GNC blend in the solver, not here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def psi_deriv(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.rsqrt(x + _EPS)

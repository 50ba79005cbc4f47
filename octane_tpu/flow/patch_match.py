"""Patch-match (sum-of-squared-error minimization) optical flow.

TPU-native redesign of oct_patch_match_optical_flow.cc:56-156.  The serial
spiral search becomes a vectorized argmin over the whole offset square,
evaluated for every pixel at once; ties resolve to the first offset in the
reference's spiral visit order (jnp.argmin returns the first minimum, and the
cost stack is laid out in spiral order).  The quadratic sub-pixel refinement
(jquad_interp, :35-55) is applied in offset coordinates, which is the same
parabola-vertex formula without the large-coordinate cancellation.

Reference quirks replicated:
* the spiral bounds check `(-SXD2 < n <= SXD2)` is a C parsing bug that is
  always true, so every visited offset participates (ref :102-104) -- i.e.
  the effective search set is the full (2*srad+1)^2 square in spiral order;
* the patch in image 1 is centred at the (truncated) first-guess position
  `ibc = clamp(trunc(i + u_fg))`, and the returned displacement is measured
  relative to that centre, NOT added to the first guess (ref :98-99,138);
* refinement probes at nmin+/-1 may fall outside the search square and are
  evaluated fresh (ref :133-134).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def spiral_offsets(srad: int) -> np.ndarray:
    """Offsets (n, m) in the reference's spiral visit order (ref :93-131)."""
    n = m = 0
    dn, dm = 0, -1
    out = []
    for _ in range((2 * srad + 1) ** 2):
        out.append((n, m))
        if (n == m) or (n < 0 and n == -m) or (n > 0 and n == 1 - m):
            dn, dm = -dm, dn
        n += dn
        m += dm
    return np.asarray(out, np.int32)


def _clamp(a, n):
    return jnp.clip(a, 0, n - 1)


@jax.jit
def _gather(img, ix, iy):
    return img[iy, ix]


def patch_match_flow(
    geo1: jnp.ndarray,
    geo2: jnp.ndarray,
    u0: jnp.ndarray,
    v0: jnp.ndarray,
    rad: int = 2,
    srad: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense SSD minimization; returns (u, v) pixel displacements.

    geo1/geo2: (H, W) float32; u0/v0: first-guess displacements.
    """
    geo1 = jnp.asarray(geo1, jnp.float32)
    geo2 = jnp.asarray(geo2, jnp.float32)
    h, w = geo1.shape
    ii = jnp.arange(w, dtype=jnp.float32)[None, :]
    jj = jnp.arange(h, dtype=jnp.float32)[:, None]
    ibc = _clamp(jnp.trunc(ii + u0).astype(jnp.int32), w)
    jbc = _clamp(jnp.trunc(jj + v0).astype(jnp.int32), h)
    ibc = jnp.broadcast_to(ibc, (h, w))
    jbc = jnp.broadcast_to(jbc, (h, w))

    # Shifted gathers of both images around the patch centres.  geo2 shifts
    # span the search square plus the patch plus the +/-1 refinement probes.
    smax = rad + srad + 1

    def shifted(img, cx, cy, sx, sy):
        return _gather(img, _clamp(cx + sx, w), _clamp(cy + sy, h))

    g1_tap = {
        (k, l): shifted(geo1, ibc, jbc, k, l)
        for k in range(-rad, rad + 1)
        for l in range(-rad, rad + 1)
    }
    g2_shift = {
        (sx, sy): shifted(geo2, ibc, jbc, sx, sy)
        for sx in range(-smax, smax + 1)
        for sy in range(-smax, smax + 1)
    }

    def sose(n, m):
        acc = None
        for k in range(-rad, rad + 1):
            for l in range(-rad, rad + 1):
                d = g2_shift[(k + n, l + m)] - g1_tap[(k, l)]
                acc = d * d if acc is None else acc + d * d
        return acc

    # Full cost table over the extended square (for refinement lookups).
    ext = srad + 1
    cost = {
        (n, m): sose(n, m)
        for n in range(-ext, ext + 1)
        for m in range(-ext, ext + 1)
    }

    order = spiral_offsets(srad)
    stack = jnp.stack([cost[(int(n), int(m))] for n, m in order], axis=0)
    best = jnp.argmin(stack, axis=0)                      # first min = spiral order
    n_of = jnp.asarray(order[:, 0])
    m_of = jnp.asarray(order[:, 1])
    nmin = n_of[best].astype(jnp.int32)
    mmin = m_of[best].astype(jnp.int32)
    summin = jnp.min(stack, axis=0)

    # Gather neighbour costs from the extended table.
    side = 2 * ext + 1
    table = jnp.stack(
        [cost[(n, m)] for n in range(-ext, ext + 1) for m in range(-ext, ext + 1)],
        axis=0,
    )  # index (n+ext)*side + (m+ext)
    hw = jnp.arange(h * w)
    tbl = table.reshape(side * side, -1)

    def at(n, m):
        idx = (n + ext) * side + (m + ext)
        return tbl[idx.reshape(-1), hw].reshape(h, w)

    def refine(center, c0, c_plus, c_minus):
        denom = 2.0 * (c_plus + c_minus - 2.0 * c0)
        vertex = center.astype(jnp.float32) + jnp.where(
            denom == 0.0, 0.0, (c_minus - c_plus) / jnp.where(denom == 0.0, 1.0, denom)
        )
        ok = (c0 < c_plus) & (c0 < c_minus)
        return jnp.where(ok, vertex, center.astype(jnp.float32))

    su1 = at(nmin + 1, mmin)
    su2 = at(nmin - 1, mmin)
    sv1 = at(nmin, mmin + 1)
    sv2 = at(nmin, mmin - 1)
    u = refine(nmin, summin, su1, su2)
    v = refine(mmin, summin, sv1, sv2)
    return u, v

"""Boundary-condition helpers.

The reference uses two distinct boundary treatments:

* **clamp** ("reflecting" in the reference's comments, but actually a clamp to
  [0, n-1] -- include/oct_bc.h:1-18, oct_variational_optical_flow.cu:26-41):
  used for gradients, blurs and interpolation taps.
* **mirror-at-1** (the solver's index fixups at grid edges,
  oct_variational_optical_flow.cu:629-652 and 919-926): the out-of-range
  neighbour at distance 1 maps to the interior neighbour on the *opposite*
  side of the centre pixel, i.e. u(-1) := u(+1) and u(n) := u(n-2).  Used by
  the smoothness stencil and the Euler-Lagrange operator.

Shifts here are static (trace-time) offsets so XLA lowers them to fused
slices/concats rather than gathers.
"""

from __future__ import annotations

import jax.numpy as jnp


def clamp_shift(a: jnp.ndarray, offset: int, axis: int) -> jnp.ndarray:
    """out[i] = a[clip(i + offset, 0, n-1)] along ``axis`` (edge replicate)."""
    if offset == 0:
        return a
    n = a.shape[axis]
    k = min(abs(offset), n - 1)

    def take(lo, hi):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(lo, hi)
        return a[tuple(idx)]

    if offset > 0:
        body = take(k, n)                       # a[k:]
        edge = take(n - 1, n)                   # last element
        reps = [1] * a.ndim
        reps[axis] = a.shape[axis] - body.shape[axis]
        return jnp.concatenate([body, jnp.repeat(edge, reps[axis], axis=axis)], axis=axis)
    else:
        body = take(0, n - k)                   # a[:n-k]
        edge = take(0, 1)                       # first element
        reps = k
        return jnp.concatenate([jnp.repeat(edge, reps, axis=axis), body], axis=axis)


def mirror_shift(a: jnp.ndarray, offset: int, axis: int) -> jnp.ndarray:
    """Distance-1 neighbour with the solver's mirror fixup.

    ``offset`` must be +1 or -1.  out[i] = a[i+offset] in the interior;
    at the edge the missing neighbour maps to the opposite interior
    neighbour: out[0] (offset=-1) = a[1], out[n-1] (offset=+1) = a[n-2].
    Matches oct_variational_optical_flow.cu:629-652 (lxyz +/- fixups).
    """
    if offset not in (-1, 1):
        raise ValueError("mirror_shift only supports unit offsets")
    n = a.shape[axis]

    def take(lo, hi):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(lo, hi)
        return a[tuple(idx)]

    if offset == 1:
        # out[:n-1] = a[1:], out[n-1] = a[n-2]
        return jnp.concatenate([take(1, n), take(n - 2, n - 1)], axis=axis)
    else:
        # out[0] = a[1], out[1:] = a[:n-1]
        return jnp.concatenate([take(1, 2), take(0, n - 1)], axis=axis)

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

Every shift takes an optional ``true_n``: when the array carries trailing
padding along ``axis`` (the mesh-divisibility padding of the sharded solver),
the boundary fixups are applied at column/row ``true_n - 1`` instead of the
array edge, so results at TRUE positions are bit-identical to running on the
unpadded array; values at padded positions are don't-cares.  The patches are
selects between statically shifted copies (iota masks), which GSPMD
partitions without communication beyond the shifts' own 1-2 px halos.
"""

from __future__ import annotations

import jax.numpy as jnp


def _iota(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    shape = [1] * a.ndim
    shape[axis] = a.shape[axis]
    return jnp.arange(a.shape[axis]).reshape(shape)


def clamp_shift(a: jnp.ndarray, offset: int, axis: int,
                true_n: int = None) -> jnp.ndarray:
    """out[i] = a[clip(i + offset, 0, true_n-1)] along ``axis``."""
    if offset == 0:
        return a
    if true_n is not None and true_n != a.shape[axis]:
        return _clamp_shift_bounded(a, offset, axis, true_n)
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


def _clamp_shift_bounded(a: jnp.ndarray, offset: int, axis: int,
                         true_n: int) -> jnp.ndarray:
    """Clamp shift against the TRUE edge of a trailing-padded array.

    Exact for positions < true_n; positions >= true_n are don't-cares
    (they get finite values from the padded region).  Supports the solver's
    offsets |offset| <= 2 exactly; larger positive offsets keep plain
    shifting (used only by the blur, whose padded inputs are edge-replicated
    and therefore already exact -- see blur_separable).
    """
    if offset < 0:
        # the left/top edge is the true origin: unbounded handling is exact
        return clamp_shift(a, offset, axis)
    i = _iota(a, axis)
    if offset == 1:
        # i < true_n-1: a[i+1]; i == true_n-1: a[true_n-1] (= a itself)
        return jnp.where(i >= true_n - 1, a, clamp_shift(a, 1, axis))
    if offset == 2:
        # i < true_n-2: a[i+2]; i == true_n-2: a[true_n-1] (= shift 1);
        # i >= true_n-1: don't care (a)
        return jnp.where(
            i >= true_n - 1, a,
            jnp.where(i == true_n - 2, clamp_shift(a, 1, axis),
                      clamp_shift(a, 2, axis)))
    return clamp_shift(a, offset, axis)


def mirror_shift(a: jnp.ndarray, offset: int, axis: int,
                 true_n: int = None) -> jnp.ndarray:
    """Distance-1 neighbour with the solver's mirror fixup.

    ``offset`` must be +1 or -1.  out[i] = a[i+offset] in the interior;
    at the edge the missing neighbour maps to the opposite interior
    neighbour: out[0] (offset=-1) = a[1], out[n-1] (offset=+1) = a[n-2].
    Matches oct_variational_optical_flow.cu:629-652 (lxyz +/- fixups).

    With ``true_n`` set on a trailing-padded array, the offset=+1 mirror
    happens at index true_n-1 (reads a[true_n-2]); padded positions are
    don't-cares.
    """
    if offset not in (-1, 1):
        raise ValueError("mirror_shift only supports unit offsets")
    n = a.shape[axis]

    def take(lo, hi):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(lo, hi)
        return a[tuple(idx)]

    if offset == 1:
        if true_n is not None and true_n != n:
            i = _iota(a, axis)
            # i < true_n-1: a[i+1]; i == true_n-1: a[true_n-2] (= a[i-1])
            return jnp.where(i == true_n - 1, clamp_shift(a, -1, axis),
                             clamp_shift(a, 1, axis))
        # out[:n-1] = a[1:], out[n-1] = a[n-2]
        return jnp.concatenate([take(1, n), take(n - 2, n - 1)], axis=axis)
    else:
        # the mirror at index 0 is the true origin in padded arrays too
        return jnp.concatenate([take(1, 2), take(0, n - 1)], axis=axis)

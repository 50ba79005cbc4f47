"""Mesh-sharded fused Pallas PCG for the coupled stencil system.

A pallas_call cannot be GSPMD-partitioned, so the sharded variational path
used to fall back to the XLA CG loop -- exactly at the north-star
configuration the fused kernel was built for.  Here the solve runs inside
shard_map over a ROW-BAND view of the same devices (a 1-D "band" mesh over
the flattened ("dy", "dx") device grid):

  * the coefficient planes and rhs are resharded to row bands once per
    solve (amortized over ~cgiters kernel sweeps);
  * each device runs the two fused kernels (octane_tpu.ops.pallas.cg)
    on its local band, with the global row offset as a prefetch scalar
    and 8-row r and p ghost strips ppermuted from the mesh neighbours
    before each pass A (coefficient ghosts once; pass B is halo-free);
  * the dot-product partials are lax.psum'd -- the same two reduction
    points as textbook PCG (exact update order; single-reduction
    rearrangements were measured numerically unstable, see ops.pallas.cg).

Iterates match flow.cg.pcg_solve to float round-off (same budget as the
single-device kernel); the reference solves the identical system in one
cooperative kernel on one GPU (oct_variational_optical_flow.cu:1105-1183)
-- this is its ICI-distributed equivalent.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


_band_mesh_cache = {}


def band_mesh(mesh) -> Mesh:
    """1-D view of the mesh's devices for row-band sharding."""
    key = id(mesh)
    if key not in _band_mesh_cache:
        _band_mesh_cache[key] = Mesh(
            np.asarray(mesh.devices).reshape(-1), ("band",))
    return _band_mesh_cache[key]


def sharded_cg_available(shape, n_devices: int) -> bool:
    """The banded kernel needs >= one 8-row strip per device and the
    single-device width floor; tiny coarse levels stay on the XLA loop."""
    import octane_tpu.ops.pallas.warp as pw

    h, w = shape
    if jax.default_backend() == "cpu" and not pw.interpret_mode():
        return False
    return h >= 8 * n_devices and w >= 256 and h * w >= 128 * 256


def make_sharded_fused_cg(mesh, true_hw=None):
    """cg_fn(sysm, tol, iters) -> (du, dv): the fused Pallas PCG over the
    mesh (row-band resharded).  ``true_hw`` gives the TRUE image dims when
    the system carries mesh-divisibility padding."""
    from octane_tpu.ops.pallas import cg as pcg
    from octane_tpu.ops.pallas.warp import interpret_mode

    mesh2 = band_mesh(mesh)
    n = mesh2.shape["band"]
    fwd = [(k, k + 1) for k in range(n - 1)]
    bwd = [(k + 1, k) for k in range(n - 1)]
    interp = interpret_mode()

    def cg_fn(sysm, tol, iters):
        h, w = sysm.bu.shape
        th, tw = (h, w) if true_hw is None else true_hw
        quad = jnp.ndim(sysm.a5) == 0
        nc = 3 if quad else 7
        f32 = jnp.float32
        bh = pcg._pick_bh(w, quad)
        hl = -(-h // (n * bh)) * bh
        h2 = hl * n
        pass_a, pass_b, hp_l, bh_l = pcg._build(hl, w, quad, interp,
                                                true_h=th, true_w=tw)
        assert hp_l == hl and bh_l == bh

        def pad(a, val=0.0):
            return jnp.pad(a, ((0, 0), (0, h2 - h), (0, 0)),
                           constant_values=f32(val))

        b = pad(jnp.stack([sysm.bu, sysm.bv]))
        cf3 = jnp.stack([jnp.broadcast_to(x, (h, w)) for x in
                         (sysm.a1, sysm.a4, sysm.a2)])
        if quad:
            cf = jnp.concatenate([pad(cf3[:2], 1.0), pad(cf3[2:3])])
        else:
            cf = jnp.concatenate([
                pad(cf3[:2], 1.0), pad(cf3[2:3]),
                pad(jnp.stack([jnp.broadcast_to(x, (h, w)) for x in
                               (sysm.a5, sysm.a6, sysm.a7, sysm.a8)]))])

        # edge devices have no ppermute partner; their ghost content is
        # discarded by the in-kernel mirror/identity selects but must be
        # finite and division-safe (a1 = a4 = 1)
        safe_cf = jnp.zeros((nc, 8, w), f32).at[0:2].set(1.0)

        @functools.partial(
            jax.shard_map, mesh=mesh2,
            in_specs=(P(None, "band", None), P(None, "band", None)),
            out_specs=P(None, "band", None),
            check_vma=False)       # pallas_call out_shapes carry no vma
        def solve(cf_g, b_g):
            d = lax.axis_index("band")
            row0 = (d * hl).astype(jnp.int32).reshape(1)

            def psum(x):
                return lax.psum(x, "band")

            gcf_n = lax.ppermute(cf_g[:, hl - 8:], "band", fwd)
            gcf_s = lax.ppermute(cf_g[:, :8], "band", bwd)
            gcf_n = jnp.where(d == 0, safe_cf, gcf_n)
            gcf_s = jnp.where(d == n - 1, safe_cf, gcf_s)

            minv = 1.0 / cf_g[0:2]
            gamma0 = psum(jnp.sum(b_g * (minv * b_g), dtype=f32))
            resid0 = psum(jnp.sum(b_g * b_g, dtype=f32))
            zero2 = jnp.zeros((2, hl, w), f32)
            cf12 = cf_g[0:2]

            def cond(st):
                return (st[4] > tol) & (st[7] < iters)

            def body(st):
                x, r, p, gamma, _, alpha_p, beta, k = st
                gr_n = lax.ppermute(r[:, hl - 8:], "band", fwd)
                gr_s = lax.ppermute(r[:, :8], "band", bwd)
                gp_n = lax.ppermute(p[:, hl - 8:], "band", fwd)
                gp_s = lax.ppermute(p[:, :8], "band", bwd)
                ab = jnp.stack([alpha_p, beta])
                x, p, ap, pap_v = pass_a(ab, row0, x, r, p, cf_g,
                                         gr_n, gr_s, gp_n, gp_s,
                                         gcf_n, gcf_s)
                alpha = gamma / psum(jnp.sum(pap_v, dtype=f32))
                r, part = pass_b(jnp.stack([alpha, beta]), r, ap, cf12)
                gam_n = psum(jnp.sum(part[:, 0], dtype=f32))
                resid = psum(jnp.sum(part[:, 1], dtype=f32))
                return (x, r, p, gam_n, resid, alpha, gam_n / gamma, k + 1)

            st = (zero2, b_g, zero2, gamma0, resid0, f32(0.0), f32(0.0),
                  jnp.int32(0))
            x, _, p, _, _, alpha, _, _ = lax.while_loop(cond, body, st)
            return x + alpha * p        # final deferred update

        x = solve(cf, b)
        return x[0, :h], x[1, :h]

    return cg_fn

"""Mesh-sharded multi-sweep red-black SOR (the production relaxer).

BASELINE.json's north star anticipates "distributed red-black SOR / Jacobi
sweep" as the relaxation scheme at the multi-host scale, and this is it:
the temporally-blocked Pallas kernel (octane_tpu.ops.pallas.sor) runs S
full sweeps per HBM pass on each device's row band, and the devices
exchange 2S-row ghost strips ONCE PER PASS (one fwd + one bwd ppermute of
x) instead of a 1-px halo every colour half-sweep -- S-fold fewer ICI
messages, and no global reductions at all except the per-pass convergence
check (a single psum), versus PCG's two psums per iteration.  This is why
SOR is the sharding-friendly relaxer: communication amortizes with S while
PCG's reduction latency does not.

Like parallel.cg, the solve runs inside shard_map over a 1-D row-band view
of the ("dy", "dx") mesh; the coefficient planes are resharded to bands
once per solve.  The blocking is exact (see ops.pallas.sor), so iterates
are bit-identical to flow.cg.sor_solve's red-black sweep at every pass
boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from octane_tpu.parallel.cg import band_mesh


def sharded_sor_available(shape, n_devices: int) -> bool:
    """Each device band must hold at least one 16-row ghost strip; tiny
    coarse levels stay on the (sharded) XLA sweep."""
    import octane_tpu.ops.pallas.warp as pw

    h, w = shape
    if jax.default_backend() == "cpu" and not pw.interpret_mode():
        return False
    return h >= 16 * n_devices and w >= 256 and h * w >= 128 * 256


def make_sharded_fused_sor(mesh, omega: float = 1.9, true_hw=None):
    """sor_fn(sysm, tol, iters) -> (du, dv): the multi-sweep Pallas SOR over
    the mesh (row-band resharded).  ``true_hw`` gives the TRUE image dims
    when the system carries mesh-divisibility padding."""
    from octane_tpu.ops.pallas import sor as psor
    from octane_tpu.ops.pallas.warp import interpret_mode

    mesh2 = band_mesh(mesh)
    n = mesh2.shape["band"]
    fwd = [(k, k + 1) for k in range(n - 1)]
    bwd = [(k + 1, k) for k in range(n - 1)]
    interp = interpret_mode()

    def sor_fn(sysm, tol, iters):
        h, w = sysm.bu.shape
        th, tw = (h, w) if true_hw is None else true_hw
        quad = jnp.ndim(sysm.a5) == 0
        nc = 6 if quad else 10
        f32 = jnp.float32
        wp = -(-w // 256) * 256       # lane-group alignment (in-kernel pack)

        s_main = min(8, iters)
        n_main, s_rem = divmod(iters, s_main)
        ho = 8 if s_main <= 4 else 16
        bh = psor._pick_bh(wp, quad, ho)
        hl = -(-h // (n * bh)) * bh
        h2 = hl * n
        call_p, hp_l, bh_l, ho_l = psor._build(
            hl, wp, quad, float(omega), interp, true_h=th,
            true_w=tw, ho=ho)
        assert hp_l == hl and bh_l == bh and ho_l == ho

        # one-copy coefficient stack (rows pad to h2 = n * hl, cols to wp;
        # band boundaries are multiples of bh (even), so global row parity
        # is preserved across devices)
        cf = psor.build_cf(sysm, h2, wp, quad)

        # edge devices have no ppermute partner; ghost content only ever
        # feeds the discarded overlap margin but must be finite (a zero
        # rdet plane makes the margin updates no-ops; a1 = a4 = 1 keeps
        # the residual rows benign)
        safe_cf = jnp.zeros((nc, ho, wp), f32).at[0:2].set(1.0)

        @functools.partial(
            jax.shard_map, mesh=mesh2,
            in_specs=(P(None, "band", None),),
            out_specs=P(None, "band", None),
            check_vma=False)       # pallas_call out_shapes carry no vma
        def solve(cf_g):
            d = lax.axis_index("band")

            gcf_n = lax.ppermute(cf_g[:, hl - ho:], "band", fwd)
            gcf_s = lax.ppermute(cf_g[:, :ho], "band", bwd)
            gcf_n = jnp.where(d == 0, safe_cf, gcf_n)
            gcf_s = jnp.where(d == n - 1, safe_cf, gcf_s)

            bu_l = cf_g[3]
            bv_l = cf_g[4]
            resid0 = lax.psum(
                jnp.sum(bu_l * bu_l, dtype=f32)
                + jnp.sum(bv_l * bv_l, dtype=f32), "band")
            zero2 = jnp.zeros((2, hl, wp), f32)

            def run(x, ns):
                sc = jnp.stack([(d * hl).astype(jnp.int32), jnp.int32(0),
                                jnp.int32(ns)])
                gx_n = lax.ppermute(x[:, hl - ho:], "band", fwd)
                gx_s = lax.ppermute(x[:, :ho], "band", bwd)
                xn, res = call_p(sc, x, cf_g, gx_n, gx_s, gcf_n, gcf_s)
                return xn, lax.psum(jnp.sum(res, dtype=f32), "band")

            def cond(st):
                return (st[1] > tol) & (st[2] < n_main)

            def body(st):
                x, _, k = st
                x, res = run(x, s_main)
                return (x, res, k + 1)

            x, resid, _ = lax.while_loop(
                cond, body, (zero2, resid0, jnp.int32(0)))
            if s_rem:
                # same compiled kernel at ns = s_rem; the predicate is a
                # psum result (replicated), so every device takes the same
                # branch and the ppermutes inside stay collective-safe --
                # and a converged solve skips the pass's HBM traffic
                x = lax.cond(resid > tol, lambda x: run(x, s_rem)[0],
                             lambda x: x, x)
            return x

        x = solve(cf)
        return x[0, :h, :w], x[1, :h, :w]

    return sor_fn

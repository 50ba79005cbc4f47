"""Fused Pallas PCG iteration for the coupled stencil system.

The CG loop is the solver's dominant cost at product shapes: XLA schedules
each iteration as ~8 separate HBM passes (apply, three dots, four vector
updates), moving ~2x more bytes than the math needs.  This module fuses
one PCG iteration into TWO row-banded kernel sweeps with auto-pipelined
block streaming:

  * pass A ("direction + apply"): p_new = M^-1 r + beta p and
    ap = A p_new come out of one sweep together with the <p, Ap> partial;
    the x update of the PREVIOUS iteration rides along (x += alpha_prev p
    -- p is already streaming through VMEM, so the update costs no extra
    reads, and the loop does one final x += alpha p axpy in XLA);
  * pass B ("residual"): r -= alpha ap plus the <r, M^-1 r> / <r, r>
    partials for beta and the stopping rule -- a thin 8-plane sweep.

Both CG dot products are computed DIRECTLY (exact Jacobi-PCG update
order, matching flow.cg.pcg_solve).  Single-sweep rearrangements were
measured and rejected: the Chronopoulos-Gear alpha recurrence loses
1e-1-level accuracy on this solver's near-singular robust-step systems
(psi' ~ 1e3 makes diag ~ sum|offdiag|), and the pipelined gamma/residual
recurrence collapses under fast convergence (catastrophic cancellation
once gamma has decayed a few orders) -- exact PCG needs its two global
reduction points, so the sweep structure follows them.

Per-band halo rows arrive as 8-row input blocks (index-map tricks, no
manual DMA), so Pallas double-buffers everything.  The mirror-at-1
boundary (oct_variational_optical_flow.cu:629-652) is applied in-kernel
with global-index selects, matching core.bc.mirror_shift; padding
rows/cols are decoupled identity equations (see _apply_strip's padpix
mask for the quadratic GNC step's scalar -1 off-diagonals).

The kernels are banded-SPMD-ready: the global row offset of local row 0
is a prefetch scalar and the device-boundary bands take 8-row ghost
strips from explicit inputs (the mesh-sharded driver in parallel.cg
ppermutes them; single-device callers pass the array's own edge blocks,
reproducing the clamped-halo behaviour exactly).

Math and update order are exactly flow.cg.pcg_solve (Jacobi PCG); dot
products tree-reduce per band instead of one global jnp.sum, so results
match to float round-off, not bitwise (the oracle budget is rtol 5e-4
per 30-iteration solve; measured 1-2e-7 on hardware, TPUCHECKS.log).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_strip(zf, a1, a4, a2, offd, lo, n, g0, w, true_h, quad,
                 true_w=None):
    """A @ zf at rows [lo, lo+n) of the (2, R, w) field ``zf`` whose row 0
    is global row ``g0``; coefficient slices are already at the strip rows.
    Applies the solver's mirror-at-1 fixups at the TRUE edges and keeps
    padding rows/cols decoupled (identity); ``true_w`` < w when the arrays
    carry trailing mesh-divisibility column padding (identity columns)."""
    tw = w if true_w is None else true_w
    c = zf[:, lo:lo + n]
    nr = zf[:, lo - 1:lo - 1 + n]
    sr = zf[:, lo + 1:lo + 1 + n]
    grow = g0 + lo + lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    # mirror: row 0's north := row 1; row true_h-1's south := row true_h-2
    nn = jnp.where(grow == 0, sr, nr)
    ss = jnp.where(grow == true_h - 1, nr, sr)
    wv = jnp.roll(c, 1, axis=2)
    ev = jnp.roll(c, -1, axis=2)
    gcol = lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    wv = jnp.where(gcol == 0, c[:, :, 1:2], wv)
    ev = jnp.where(gcol == tw - 1, c[:, :, tw - 2:tw - 1], ev)
    if quad:
        # padding rows/cols must stay decoupled identity equations: the
        # scalar -1 off-diagonals would otherwise couple them to true edge
        # pixels and pollute the dot products whenever h % BH != 0
        padpix = (grow >= true_h) | (gcol >= tw)
        off_u = jnp.where(padpix, 0.0,
                          -(wv[0:1] + ev[0:1] + nn[0:1] + ss[0:1]))
        off_v = jnp.where(padpix, 0.0,
                          -(wv[1:2] + ev[1:2] + nn[1:2] + ss[1:2]))
    else:
        a5, a6, a7, a8 = offd
        off_u = a5 * wv[0:1] + a7 * ev[0:1] + a6 * nn[0:1] + a8 * ss[0:1]
        off_v = a5 * wv[1:2] + a7 * ev[1:2] + a6 * nn[1:2] + a8 * ss[1:2]
    au = a1 * c[0:1] + a2 * c[1:2] + off_u
    av = a2 * c[0:1] + a4 * c[1:2] + off_v
    return jnp.concatenate([au, av], axis=0)


def _pass_a(ab_ref, row0_ref, x, r_n, r_b, r_s, p_n, p_b, p_s,
            cf_n, cf_b, cf_s, gr_n, gr_s, gp_n, gp_s, gcf_n, gcf_s,
            x_o, p_o, ap_o, pap_ref, *, bh, w, true_h, true_w, quad, gh):
    """x += alpha_prev p, p_new = M^-1 r + beta p, ap = A p_new,
    partial <p_new, ap>.

    ``row0_ref`` holds the global row index of local row 0 (nonzero on the
    sharded path); ``g*_n``/``g*_s`` are 8-row ghost strips from the mesh
    neighbours, replacing the (self-clamped) halo blocks at the
    device-boundary bands.
    """
    rb = pl.program_id(0)
    alpha = ab_ref[0]
    beta = ab_ref[1]
    f32 = jnp.float32

    def pick(n_blk, s_blk, gn, gs):
        return (jnp.where(rb == 0, gn[...], n_blk[...]),
                jnp.where(rb == gh - 1, gs[...], s_blk[...]))

    rn, rs = pick(r_n, r_s, gr_n, gr_s)
    pn, ps = pick(p_n, p_s, gp_n, gp_s)
    cfn, cfs = pick(cf_n, cf_s, gcf_n, gcf_s)
    r_f = jnp.concatenate([rn, r_b[...], rs], axis=1)      # (2, bh+16, w)
    p_f = jnp.concatenate([pn, p_b[...], ps], axis=1)
    cf_f = jnp.concatenate([cfn, cf_b[...], cfs], axis=1)  # (nc, bh+16, w)
    minv_f = 1.0 / cf_f[0:2]
    pn_f = minv_f * r_f + beta * p_f                        # full frame

    a1 = cf_f[0:1, 8:8 + bh]
    a4 = cf_f[1:2, 8:8 + bh]
    a2 = cf_f[2:3, 8:8 + bh]
    offd = None if quad else tuple(
        cf_f[i:i + 1, 8:8 + bh] for i in range(3, 7))
    # banded-frame row 0 is global row row0 + rb*bh - 8; garbage at the
    # nonexistent rows beyond the array ends is masked by the mirror
    # selects before it can reach a body result
    g0 = row0_ref[0] + rb * bh - 8
    ap = _apply_strip(pn_f, a1, a4, a2, offd, 8, bh,
                      g0, w, true_h, quad, true_w)
    x_o[:] = x[...] + alpha * p_f[:, 8:8 + bh]              # alpha_{k-1}
    p_new = pn_f[:, 8:8 + bh]
    p_o[:] = p_new
    ap_o[:] = ap
    pap_ref[rb, 0] = jnp.sum(p_new * ap, dtype=f32)


def _pass_b(ab_ref, r, ap, cf12, r_o, part_ref):
    """r -= alpha ap, partials <r, M^-1 r> and <r, r>.  Pure elementwise:
    no halos, no ghosts -- an 8-plane sweep."""
    alpha = ab_ref[0]
    f32 = jnp.float32
    r_new = r[...] - alpha * ap[...]
    r_o[:] = r_new
    minv = 1.0 / cf12[...]
    i = pl.program_id(0)
    part_ref[i, 0] = jnp.sum(r_new * (minv * r_new), dtype=f32)
    part_ref[i, 1] = jnp.sum(r_new * r_new, dtype=f32)


def _pick_bh(w: int, quad: bool) -> int:
    """Largest band height whose resident working set (double-buffered
    in/out streams + in-kernel temporaries, pass A is the bigger one)
    fits comfortably in VMEM."""
    nc = 3 if quad else 7
    for bh in (128, 64, 32, 16, 8):
        body = (2 + 2 + 2 + nc + 6) * bh + (4 + nc) * 16      # in+out rows
        temps = (4 + nc + 4) * (bh + 16) + 6 * bh
        if (2 * body + temps) * w * 4 <= 110 * 1024 * 1024:
            return bh
    return 8


@functools.lru_cache(maxsize=None)
def _build(h, w, quad, interpret=False, true_h=None, true_w=None):
    """Build the two per-iteration kernels for an (h, w) LOCAL block.

    ``true_h``/``true_w`` are the GLOBAL true dims for the mirror/identity
    fixups (defaults: this block is the whole grid).  The returned
    ``pass_a`` takes (ab, row0, x, r, p, cf, ghosts...); single-device
    callers omit the ghosts and the array's own edge blocks are passed
    (the in-kernel selects then reproduce the clamped-halo behaviour
    exactly).  ``pass_b`` is ghost-free.
    """
    true_h = h if true_h is None else true_h
    true_w = w if true_w is None else true_w
    bh = _pick_bh(w, quad)
    hp = -(-h // bh) * bh
    gh = hp // bh
    nc = 3 if quad else 7
    f32 = jnp.float32

    def body_spec(k):
        return pl.BlockSpec((k, bh, w), lambda i, *_: (0, i, 0))

    def halo_spec(k, delta):
        nb = hp // 8

        def imap(i, *_):
            j = i * (bh // 8) + (-1 if delta < 0 else bh // 8)
            return (0, jnp.clip(j, 0, nb - 1), 0)

        return pl.BlockSpec((k, 8, w), imap)

    def ghost_spec(k):
        return pl.BlockSpec((k, 8, w), lambda i, *_: (0, 0, 0))

    params = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)
    kern_a = functools.partial(_pass_a, bh=bh, w=w, true_h=true_h,
                               true_w=true_w, quad=quad, gh=gh)
    call_a = pl.pallas_call(
        kern_a,
        compiler_params=params,
        interpret=interpret,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(gh,),
            in_specs=[
                body_spec(2),                                       # x
                halo_spec(2, -1), body_spec(2), halo_spec(2, +1),   # r
                halo_spec(2, -1), body_spec(2), halo_spec(2, +1),   # p
                halo_spec(nc, -1), body_spec(nc), halo_spec(nc, +1),
                ghost_spec(2), ghost_spec(2),                   # r ghosts
                ghost_spec(2), ghost_spec(2),                   # p ghosts
                ghost_spec(nc), ghost_spec(nc),                 # cf ghosts
            ],
            out_specs=(
                pl.BlockSpec((2, bh, w), lambda i, *_: (0, i, 0)),
                pl.BlockSpec((2, bh, w), lambda i, *_: (0, i, 0)),
                pl.BlockSpec((2, bh, w), lambda i, *_: (0, i, 0)),
                pl.BlockSpec((gh, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, hp, w), f32),
            jax.ShapeDtypeStruct((2, hp, w), f32),
            jax.ShapeDtypeStruct((2, hp, w), f32),
            jax.ShapeDtypeStruct((gh, 1), f32),
        ),
    )

    call_b = pl.pallas_call(
        _pass_b,
        compiler_params=params,
        interpret=interpret,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gh,),
            in_specs=[body_spec(2), body_spec(2), body_spec(2)],
            out_specs=(
                pl.BlockSpec((2, bh, w), lambda i, *_: (0, i, 0)),
                pl.BlockSpec((gh, 2), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, hp, w), f32),
            jax.ShapeDtypeStruct((gh, 2), f32),
        ),
    )

    def pass_a(ab, row0, x, r, p, cf, gr_n=None, gr_s=None,
               gp_n=None, gp_s=None, gcf_n=None, gcf_s=None):
        if gr_n is None:                        # single-device: self-ghosts
            gr_n, gr_s = r[:, :8], r[:, hp - 8:]
            gp_n, gp_s = p[:, :8], p[:, hp - 8:]
            gcf_n, gcf_s = cf[:, :8], cf[:, hp - 8:]
        return call_a(ab, row0, x, r, r, r, p, p, p, cf, cf, cf,
                      gr_n, gr_s, gp_n, gp_s, gcf_n, gcf_s)

    def pass_b(ab, r, ap, cf12):
        return call_b(ab, r, ap, cf12)

    return pass_a, pass_b, hp, bh


def pcg_solve_fused(sysm, tol, iters: int, interpret: bool = False):
    """Drop-in for flow.cg.pcg_solve on TPU (single-device, unpadded dims).

    ``sysm`` is a flow.stencil.StencilSystem; scalar off-diagonals (the
    quadratic GNC step) select the specialized build.  ``interpret`` runs
    the kernels in Pallas interpret mode (CPU regression tests).
    """
    from octane_tpu.ops.pallas.warp import interpret_mode

    h, w = sysm.bu.shape
    quad = jnp.ndim(sysm.a5) == 0
    pass_a, pass_b, hp, _ = _build(h, w, bool(quad),
                                   interpret or interpret_mode())
    f32 = jnp.float32

    def pad(a, val=0.0):
        return jnp.pad(a, ((0, 0), (0, hp - h), (0, 0)),
                       constant_values=f32(val))

    b = pad(jnp.stack([sysm.bu, sysm.bv]))
    cf3 = jnp.stack([sysm.a1, sysm.a4, sysm.a2])
    if quad:
        cf = jnp.concatenate([pad(cf3[:2], 1.0), pad(cf3[2:3])])
    else:
        cf = jnp.concatenate([
            pad(cf3[:2], 1.0), pad(cf3[2:3]),
            pad(jnp.stack([sysm.a5, sysm.a6, sysm.a7, sysm.a8]))])

    gamma0 = (jnp.sum(sysm.bu * (sysm.bu / sysm.a1), dtype=f32)
              + jnp.sum(sysm.bv * (sysm.bv / sysm.a4), dtype=f32))
    resid0 = jnp.sum(b * b, dtype=f32)
    zero2 = jnp.zeros((2, hp, w), f32)
    row0 = jnp.zeros((1,), jnp.int32)
    cf12 = cf[0:2]                  # loop-invariant, hoisted by XLA

    def cond(st):
        return (st[4] > tol) & (st[7] < iters)

    def body(st):
        x, r, p, gamma, _, alpha_p, beta, k = st
        ab = jnp.stack([alpha_p, beta])
        x, p, ap, pap_v = pass_a(ab, row0, x, r, p, cf)
        alpha = gamma / jnp.sum(pap_v, dtype=f32)
        r, part = pass_b(jnp.stack([alpha, beta]), r, ap, cf12)
        gam_n = jnp.sum(part[:, 0], dtype=f32)
        resid = jnp.sum(part[:, 1], dtype=f32)
        return (x, r, p, gam_n, resid, alpha, gam_n / gamma, k + 1)

    st = (zero2, b, zero2, gamma0, resid0, f32(0.0), f32(0.0), jnp.int32(0))
    x, _, p, _, _, alpha, _, _ = lax.while_loop(cond, body, st)
    x = x + alpha * p               # final deferred update (one XLA axpy)
    return x[0, :h], x[1, :h]


def pallas_cg_available(shape) -> bool:
    from octane_tpu.ops.pallas.warp import interpret_mode

    h, w = shape
    if jax.default_backend() == "cpu" and not interpret_mode():
        return False
    return h >= 128 and w >= 256

"""Fused Pallas assembly: Euler-Lagrange system -> SOR coefficient stack.

The XLA assembly (flow.stencil.assemble) was measured ~16 ms/call at 5424^2
beyond the warp (PROFILE_r05.md) -- it materializes the mirror-shifted
neighbour planes, the robust psi terms and the nine StencilSystem planes in
HBM, and the SOR driver then re-materializes them again as the padded
coefficient stack (ops.pallas.sor.build_cf).  This kernel fuses the whole
data/smoothness-term assembly (the math of
oct_variational_optical_flow.cu:611-1097, as replicated by
flow.stencil.assemble) into ONE banded pass that writes the SOR kernel's
(nc, hp, wp) coefficient stack directly -- including the hoisted reciprocal
block determinant (flow.cg.sor_rdet) and the padding identity rows
(ops.pallas.sor.build_cf) -- plus the stopping-rule seed
resid0 = ||b||^2 as per-band SMEM scalars:

    HBM traffic per robust call (C=1): 13 plane-reads + 10 plane-writes,
    vs the XLA path's ~2.5x that (intermediate materializations) plus the
    build_cf copy plus the resid0 re-read.

Geometry: the caller supplies every (hp, wp)-padded input in the SHARED
padded frame of the fused solver loop (warp samples uncropped via
``make_pallas_warp(..., pad_to=(hp, wp), crop=False)``, u/v zero-padded,
level-invariant g1/uhat stacks padded once per level); ``hp``/``wp`` must be
multiples of the band height / 256 so the emitted stack feeds
``ops.pallas.sor.sor_solve_cf`` with no relayout.

Numerics: same formulas and operand order as ``flow.stencil.assemble``
(file:line cites there); cross-program agreement with the XLA assembly is
ulp-bounded, not bitwise, for the same reason as the SOR kernel's contract
(ops/pallas/sor.py: XLA deletes optimization_barrier late, so FMA
contraction varies between separately compiled programs).  Product-level
parity is covered by the golden fixtures and tests/test_fused_assemble.py.

Like the solver kernels this module is single-device (a pallas_call cannot
be GSPMD-partitioned); the sharded path keeps the XLA assembly, whose
shifted selects partition cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6   # core.psi.psi_deriv


def _kernel(scal_ref, g1_ref, smp_ref, bcx_ref, bcy_ref,
            un_ref, ub_ref, us_ref, vn_ref, vb_ref, vs_ref,
            uh_ref, vh_ref, cf_ref, res_ref, *,
            C, bh, wp, th, tw, quad, dozim):
    """One bh-row band of the assembly.

    ``scal_ref`` (SMEM, (4,)) = [al1, lambdac, alpha, lam_over_alpha]
    (traced scalars of the level program); ``g1_ref`` holds the
    level-invariant [geo1, gx1, gy1] channel stack, ``smp_ref`` the warped
    [geo2, gx2, gy2, gxx, gxy, gyy] samples from the Pallas warp,
    ``bcx/bcy`` the warp's clamp flags.  u/v arrive as (8-row halo, body,
    8-row halo) triples with self-clamping index maps; only one halo row
    per side is consumed (the smoothness stencil reaches distance 1).
    """
    f32 = jnp.float32
    rb = pl.program_id(0)
    al1 = scal_ref[0]
    lambdac = scal_ref[1]
    alpha = scal_ref[2]
    lam_a = scal_ref[3]
    one_m_al1 = 1.0 - al1

    grow = rb * bh + lax.broadcasted_iota(jnp.int32, (bh, 1), 0)
    gcol = lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    pad = (grow >= th) | (gcol >= tw)            # broadcasts to (bh, wp)
    top = grow == 0                              # (bh, 1)
    bot = grow == th - 1
    c0 = gcol == 0                               # (1, wp)
    cl = gcol == tw - 1

    def frame(n_ref, b_ref, s_ref):
        """(bh + 2, wp) row frame: one true neighbour row on each side.
        Band 0's north halo block self-clamps to its own first rows (and the
        last band's south likewise); the mirror fixups below override those
        rows, so the clamped halo values are never consumed."""
        return jnp.concatenate(
            [n_ref[7:8], b_ref[...], s_ref[0:1]], axis=0)

    def shifts(fr, diag):
        """Neighbour planes of the body rows with the solver's mirror-at-1
        fixups at the TRUE edges (core.bc.mirror_shift; reference
        oct_variational_optical_flow.cu:629-652).  West/east are lane rolls
        computed on the frame so the diagonals reuse them."""
        b = fr[1:bh + 1]

        def rowpick(f):
            n = jnp.where(top, f[2:bh + 2], f[0:bh])     # mirror: out[0]=a[1]
            s = jnp.where(bot, f[0:bh], f[2:bh + 2])     # out[th-1]=a[th-2]
            return n, s

        n_, s_ = rowpick(fr)
        if not diag:
            wb = jnp.where(c0, jnp.roll(b, -1, axis=1),
                           jnp.roll(b, 1, axis=1))
            eb = jnp.where(cl, jnp.roll(b, 1, axis=1),
                           jnp.roll(b, -1, axis=1))
            return b, n_, s_, wb, eb, None, None, None, None
        wf = jnp.where(c0, jnp.roll(fr, -1, axis=1), jnp.roll(fr, 1, axis=1))
        ef = jnp.where(cl, jnp.roll(fr, 1, axis=1), jnp.roll(fr, -1, axis=1))
        w_, e_ = wf[1:bh + 1], ef[1:bh + 1]
        nw, sw = rowpick(wf)
        ne, se = rowpick(ef)
        return b, n_, s_, w_, e_, nw, ne, sw, se

    uf = frame(un_ref, ub_ref, us_ref)
    vf = frame(vn_ref, vb_ref, vs_ref)
    u, uN, uS, uW, uE, uNW, uNE, uSW, uSE = shifts(uf, not quad)
    v, vN, vS, vW, vE, vNW, vNE, vSW, vSE = shifts(vf, not quad)

    psisnmiuq = uW + uN + uE + uS
    psisnmivq = vW + vN + vE + vS

    def sq(x):
        return x * x

    if not quad:
        # robust smoothness weights (flow.stencil.assemble:183-198)
        u_ip1 = sq(uE - u) + sq(0.25 * ((uSE - uNE) + (uS - uN))) \
            + sq(vE - v) + sq(0.25 * ((vSE - vNE) + (vS - vN)))
        u_im1 = sq(u - uW) + sq(0.25 * ((uSW - uNW) + (uS - uN))) \
            + sq(v - vW) + sq(0.25 * ((vSW - vNW) + (vS - vN)))
        u_jp1 = sq(uS - u) + sq(0.25 * ((uSE - uSW) + (uE - uW))) \
            + sq(vS - v) + sq(0.25 * ((vSE - vSW) + (vE - vW)))
        u_jm1 = sq(u - uN) + sq(0.25 * ((uNE - uNW) + (uE - uW))) \
            + sq(v - vN) + sq(0.25 * ((vNE - vNW) + (vE - vW)))
        psis1 = lax.rsqrt(u_im1 + _EPS)
        psis2 = lax.rsqrt(u_jm1 + _EPS)
        psis3 = lax.rsqrt(u_ip1 + _EPS)
        psis4 = lax.rsqrt(u_jp1 + _EPS)
        psistot = psis1 + psis2 + psis3 + psis4
        psisnmiu = psis1 * uW + psis2 * uN + psis3 * uE + psis4 * uS
        psisnmiv = psis1 * vW + psis2 * vN + psis3 * vE + psis4 * vS

    # warped data terms accumulated over channels (flow.stencil.assemble:
    # 200-244; reference :727-829)
    bc_x = bcx_ref[...]
    bc_y = bcy_ref[...]
    zero = jnp.zeros((bh, wp), f32)
    vr1 = vr2 = vr4 = vr5 = vr6 = intcomp = zero
    vr12 = vr22 = vr42 = vr52 = vr62 = intcomp2 = zero
    for c in range(C):
        g2w = smp_ref[c]
        ix = jnp.where(bc_x, 0.0, smp_ref[C + c])
        iy = jnp.where(bc_y, 0.0, smp_ref[2 * C + c])
        ixx = jnp.where(bc_x, 0.0, smp_ref[3 * C + c])
        ixy = jnp.where(bc_x | bc_y, 0.0, smp_ref[4 * C + c])
        iyy = jnp.where(bc_y, 0.0, smp_ref[5 * C + c])
        it = g2w - g1_ref[c]
        ixt = ix - g1_ref[C + c]
        iyt = iy - g1_ref[2 * C + c]
        if dozim:
            na = 1.0 / (ix * ix + iy * iy + 1.0)
            nb = 1.0 / (ixx * ixx + ixy * ixy + 1.0)
            nc_ = 1.0 / (ixy * ixy + iyy * iyy + 1.0)
        else:
            na = nb = nc_ = jnp.ones((bh, wp), f32)
        intcomp = intcomp + na * it * it
        intcomp2 = intcomp2 + nb * ixt * ixt + nc_ * iyt * iyt
        vr1 = vr1 + na * ix * ix
        vr12 = vr12 + nb * ixx * ixx + nc_ * ixy * ixy
        vr2 = vr2 + na * ix * iy
        vr22 = vr22 + nb * ixx * ixy + nc_ * iyy * ixy
        vr4 = vr4 + na * iy * iy
        vr42 = vr42 + nb * ixy * ixy + nc_ * iyy * iyy
        vr5 = vr5 + (-na * it) * ix
        vr52 = vr52 - (nb * ixt * ixx + nc_ * iyt * ixy)
        vr6 = vr6 + (-na * it) * iy
        vr62 = vr62 - (nb * ixt * ixy + nc_ * iyt * iyy)

    hint_u = lambdac * (u - uh_ref[...])
    hint_v = lambdac * (v - vh_ref[...])

    if quad:
        # pure-quadratic GNC step 0 (flow.stencil.assemble:249-257)
        a1 = vr1 / alpha + lam_a * vr12 + lambdac + 4.0
        a2 = vr2 / alpha + lam_a * vr22
        a4 = vr4 / alpha + lam_a * vr42 + lambdac + 4.0
        bu = vr5 / alpha + lam_a * vr52 - hint_u + psisnmiuq - 4.0 * u
        bv = vr6 / alpha + lam_a * vr62 - hint_v + psisnmivq - 4.0 * v
    else:
        psid = lax.rsqrt(intcomp + _EPS) / alpha
        psid2 = lam_a * lax.rsqrt(intcomp2 + _EPS)
        a1 = al1 * (vr1 / alpha + lam_a * vr12 + lambdac + 4.0) \
            + one_m_al1 * (psid * vr1 + psid2 * vr12 + lambdac + psistot)
        a2 = al1 * (vr2 / alpha + lam_a * vr22) \
            + one_m_al1 * (psid * vr2 + psid2 * vr22)
        a4 = al1 * (vr4 / alpha + lam_a * vr42 + lambdac + 4.0) \
            + one_m_al1 * (psid * vr4 + psid2 * vr42 + lambdac + psistot)
        a5 = -(al1 + one_m_al1 * psis1)
        a6 = -(al1 + one_m_al1 * psis2)
        a7 = -(al1 + one_m_al1 * psis3)
        a8 = -(al1 + one_m_al1 * psis4)
        bu = al1 * (vr5 / alpha + lam_a * vr52 - hint_u + psisnmiuq - 4.0 * u) \
            + one_m_al1 * (psid * vr5 + psid2 * vr52 - hint_u + psisnmiu
                           - psistot * u)
        bv = al1 * (vr6 / alpha + lam_a * vr62 - hint_v + psisnmivq - 4.0 * v) \
            + one_m_al1 * (psid * vr6 + psid2 * vr62 - hint_v + psisnmiv
                           - psistot * v)

    # padding identity rows + hoisted reciprocal determinant, exactly as
    # ops.pallas.sor.build_cf / flow.cg.sor_rdet emit them
    a1 = jnp.where(pad, 1.0, a1)
    a4 = jnp.where(pad, 1.0, a4)
    a2 = jnp.where(pad, 0.0, a2)
    bu = jnp.where(pad, 0.0, bu)
    bv = jnp.where(pad, 0.0, bv)
    rdet = jnp.where(pad, 0.0, 1.0 / (a1 * a4 - a2 * a2))

    cf_ref[0] = a1
    cf_ref[1] = a4
    cf_ref[2] = a2
    cf_ref[3] = bu
    cf_ref[4] = bv
    if quad:
        cf_ref[5] = rdet
    else:
        cf_ref[5] = jnp.where(pad, 0.0, a5)
        cf_ref[6] = jnp.where(pad, 0.0, a6)
        cf_ref[7] = jnp.where(pad, 0.0, a7)
        cf_ref[8] = jnp.where(pad, 0.0, a8)
        cf_ref[9] = rdet
    res_ref[rb, 0] = jnp.sum(bu * bu, dtype=f32) + jnp.sum(bv * bv, dtype=f32)


@functools.lru_cache(maxsize=None)
def _build(C, th, tw, hp, wp, quad, dozim, bh=32, interpret=False):
    """Assembly pass for a (th, tw)-true grid padded to (hp, wp).

    Returns ``call(scal, g1s, smp, bcx, bcy, u, v, uhat, vhat) ->
    (cf (nc, hp, wp), res0 (gh, 1))`` where nc = 10 robust / 6 quad in the
    ops.pallas.sor.build_cf plane order and res0 sums ||b||^2 per band.
    """
    assert hp % bh == 0 and wp % 128 == 0
    gh = hp // bh
    nc = 6 if quad else 10
    ho = 8                                     # halo block rows (8-aligned)
    nb = hp // ho

    def body(k):
        return pl.BlockSpec((k, bh, wp), lambda i: (0, i, 0))

    def body2(_k=1):
        return pl.BlockSpec((bh, wp), lambda i: (i, 0))

    def halo(delta):
        def imap(i):
            j = i * (bh // ho) + (-1 if delta < 0 else bh // ho)
            return (jnp.clip(j, 0, nb - 1), 0)

        return pl.BlockSpec((ho, wp), imap)

    kern = functools.partial(
        _kernel, C=C, bh=bh, wp=wp, th=th, tw=tw, quad=quad, dozim=dozim)
    call = pl.pallas_call(
        kern,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        grid=(gh,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # scal (4,)
            body(3 * C),                                     # g1 stack
            body(6 * C),                                     # samples
            body2(), body2(),                                # bc_x, bc_y
            halo(-1), body2(), halo(+1),                     # u
            halo(-1), body2(), halo(+1),                     # v
            body2(), body2(),                                # uhat, vhat
        ],
        out_specs=(
            pl.BlockSpec((nc, bh, wp), lambda i: (0, i, 0)),
            pl.BlockSpec((gh, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nc, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((gh, 1), jnp.float32),
        ),
    )

    def run(scal, g1s, smp, bcx, bcy, u, v, uhat, vhat):
        return call(scal, g1s, smp, bcx, bcy, u, u, u, v, v, v, uhat, vhat)

    return run


def fused_assemble_available(shape, true_shape=None) -> bool:
    """Engages with the Pallas SOR solver on non-CPU backends (or interpret
    mode): the emitted stack is the SOR kernel's input format."""
    from octane_tpu.ops.pallas.sor import pallas_sor_available

    return pallas_sor_available(shape if true_shape is None else true_shape)


def fused_geometry(shape, cgiters: int):
    """The shared padded dims (hp, wp) for the warp -> assemble -> SOR fused
    chain: wp is 256-aligned (SOR's in-kernel deinterleave), hp a multiple
    of every participating band height (warp bh=64 and the SOR band pick
    for both GNC modes), so all three kernels tile one frame."""
    from octane_tpu.ops.pallas import sor as sorm

    h, w = shape
    wp = -(-w // 256) * 256
    s_main = min(8, max(1, cgiters))
    ho = 8 if s_main <= 4 else 16
    m = max(64, sorm._pick_bh(wp, True, ho), sorm._pick_bh(wp, False, ho))
    hp = -(-h // m) * m
    return hp, wp


def make_fused_assemble(shape, pad_shape, nchan, quad, dozim,
                        interpret=False):
    """Callable ``(al1, lambdac, alpha, lam_a, g1s, smp, bcx, bcy, u, v,
    uhat, vhat) -> (cf, resid0)`` in the shared (hp, wp) frame; resid0 is
    the scalar ||b||^2 over the true grid (padding contributes exactly
    zero)."""
    th, tw = shape
    hp, wp = pad_shape
    run = _build(nchan, th, tw, hp, wp, bool(quad), bool(dozim),
                 interpret=interpret)

    def fn(al1, lambdac, alpha, lam_a, g1s, smp, bcx, bcy, u, v,
           uhat, vhat):
        scal = jnp.stack([jnp.asarray(al1, jnp.float32),
                          jnp.asarray(lambdac, jnp.float32),
                          jnp.asarray(alpha, jnp.float32),
                          jnp.asarray(lam_a, jnp.float32)])
        cf, res0 = run(scal, g1s, smp, bcx, bcy, u, v, uhat, vhat)
        return cf, jnp.sum(res0, dtype=jnp.float32)

    return fn

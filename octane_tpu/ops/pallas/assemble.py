"""Fused Pallas kernel: warp + Euler-Lagrange assembly in one VMEM sweep.

The solver's inner iteration is warp-sample (6 fields/channel at flow-
dependent positions) followed by ~40 elementwise passes building the stencil
coefficients (octane_tpu.flow.stencil.assemble).  This kernel fuses both: a
grid block DMAs its field window once, gathers, computes the smoothness
weights from a mirror-padded (u, v) window and writes the nine coefficient
fields -- one read of the inputs, one write of the outputs, per inner
iteration (SURVEY.md section 7, hard part #6).

Semantics are identical to flow/stencil.py::assemble with the Pallas warp's
displacement bounds; verified bit-close on hardware by tools/tpu_checks.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from octane_tpu.flow.stencil import StencilSystem
from octane_tpu.ops.pallas.warp import SRC_W, PAD, BW, _pick_bh

_EPS = 1e-6


def _rsqrt_eps(x):
    return jax.lax.rsqrt(x + _EPS)


def _kernel(qlo_ref, qhi_ref, par_ref,
            f_hbm, uvp_hbm, g1_ref, gx1_ref, gy1_ref, uh_ref, vh_ref,
            a1_ref, a2_ref, a4_ref, a5_ref, a6_ref, a7_ref, a8_ref,
            bu_ref, bv_ref,
            src, uvw, sem, sem2,
            *, c_, h, w, bh, dv, src_h, dozim):
    rb = pl.program_id(0)
    cb = pl.program_id(1)

    cp = pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(rb * bh, src_h), pl.ds(cb * BW, SRC_W)], src, sem)
    cp.start()
    # mirror-padded (u, v): padded row/col = global + 1; window rows
    # [rb*bh, +bh+8), cols [cb*BW, +256) cover the +/-1 neighbourhood
    cp2 = pltpu.make_async_copy(
        uvp_hbm.at[:, pl.ds(rb * bh, bh + 8), pl.ds(cb * BW, SRC_W)], uvw, sem2)
    cp2.start()

    al1 = par_ref[0]
    alpha = par_ref[1]
    lam_a = par_ref[2]
    lambdac = par_ref[3]
    one_m = 1.0 - al1

    cp2.wait()
    u_c = uvw[0, 1:bh + 1, 1:BW + 1]
    v_c = uvw[1, 1:bh + 1, 1:BW + 1]
    uW = uvw[0, 1:bh + 1, 0:BW]
    uE = uvw[0, 1:bh + 1, 2:BW + 2]
    uN = uvw[0, 0:bh, 1:BW + 1]
    uS = uvw[0, 2:bh + 2, 1:BW + 1]
    uNW = uvw[0, 0:bh, 0:BW]
    uNE = uvw[0, 0:bh, 2:BW + 2]
    uSW = uvw[0, 2:bh + 2, 0:BW]
    uSE = uvw[0, 2:bh + 2, 2:BW + 2]
    vW = uvw[1, 1:bh + 1, 0:BW]
    vE = uvw[1, 1:bh + 1, 2:BW + 2]
    vN = uvw[1, 0:bh, 1:BW + 1]
    vS = uvw[1, 2:bh + 2, 1:BW + 1]
    vNW = uvw[1, 0:bh, 0:BW]
    vNE = uvw[1, 0:bh, 2:BW + 2]
    vSW = uvw[1, 2:bh + 2, 0:BW]
    vSE = uvw[1, 2:bh + 2, 2:BW + 2]

    sq = lambda x: x * x
    u_ip1 = sq(uE - u_c) + sq(0.25 * ((uSE - uNE) + (uS - uN))) \
        + sq(vE - v_c) + sq(0.25 * ((vSE - vNE) + (vS - vN)))
    u_im1 = sq(u_c - uW) + sq(0.25 * ((uSW - uNW) + (uS - uN))) \
        + sq(v_c - vW) + sq(0.25 * ((vSW - vNW) + (vS - vN)))
    u_jp1 = sq(uS - u_c) + sq(0.25 * ((uSE - uSW) + (uE - uW))) \
        + sq(vS - v_c) + sq(0.25 * ((vSE - vSW) + (vE - vW)))
    u_jm1 = sq(u_c - uN) + sq(0.25 * ((uNE - uNW) + (uE - uW))) \
        + sq(v_c - vN) + sq(0.25 * ((vNE - vNW) + (vE - vW)))
    psis1 = _rsqrt_eps(u_im1)
    psis2 = _rsqrt_eps(u_jm1)
    psis3 = _rsqrt_eps(u_ip1)
    psis4 = _rsqrt_eps(u_jp1)
    psistot = psis1 + psis2 + psis3 + psis4
    psisnmiu = psis1 * uW + psis2 * uN + psis3 * uE + psis4 * uS
    psisnmiv = psis1 * vW + psis2 * vN + psis3 * vE + psis4 * vS
    psisnmiuq = uW + uN + uE + uS
    psisnmivq = vW + vN + vE + vS

    # --- warp positions / coefficients (identical to the warp kernel) ------
    lj = jax.lax.broadcasted_iota(jnp.int32, (bh, BW), 0)
    jj = (rb * bh + lj).astype(jnp.float32)
    ii = (cb * BW + jax.lax.broadcasted_iota(jnp.int32, (bh, BW), 1)
          ).astype(jnp.float32)
    px_t = ii + u_c
    py_t = jj + v_c
    bc_x = (px_t < 0.0) | (px_t >= w)
    bc_y = (py_t < 0.0) | (py_t >= h)
    reach = float(PAD - 2)
    px = ii + jnp.clip(u_c, -reach, reach)
    py = jj + jnp.clip(v_c, -float(dv), float(dv))
    px = jnp.where(px < 0.0, 0.0, jnp.where(px >= w, float(w - 1), px))
    py = jnp.where(py < 0.0, 0.0, jnp.where(py >= h, float(h - 1), py))
    iv1 = jnp.minimum(px.astype(jnp.int32), w - 2)
    jv1 = jnp.minimum(py.astype(jnp.int32), h - 2)
    p1 = (iv1 + 1).astype(jnp.float32) - px
    p2 = px - iv1.astype(jnp.float32)
    p3 = (jv1 + 1).astype(jnp.float32) - py
    p4 = py - jv1.astype(jnp.float32)
    ci = iv1 + PAD - cb * BW
    d2 = jv1 + dv - rb * bh - lj

    lo0 = jnp.clip(ci, 0, 127)
    hi0 = jnp.clip(ci - 128, 0, 127)
    sel0 = ci < 128
    cip = ci + 1
    lo1 = jnp.clip(cip, 0, 127)
    hi1 = jnp.clip(cip - 128, 0, 127)
    sel1 = cip < 128

    cp.wait()
    zero = jnp.zeros((bh, BW), jnp.float32)
    q_lo = qlo_ref[rb, cb]
    q_hi = qhi_ref[rb, cb]
    nq = (2 * dv + 2) // 8

    def sample(f_idx):
        def chunk(q, acc):
            f11, f21, f12, f22 = acc
            start = pl.multiple_of(q * 8, 8)
            blk = src[f_idx, pl.ds(start, bh + 8), :]
            for r in range(8):
                d = q * 8 + r
                rows = jax.lax.slice_in_dim(blk, r, r + bh, axis=0)
                r0 = rows[:, :128]
                r1 = rows[:, 128:]
                g1 = jnp.where(sel0, jnp.take_along_axis(r0, lo0, axis=1),
                               jnp.take_along_axis(r1, hi0, axis=1))
                g2 = jnp.where(sel1, jnp.take_along_axis(r0, lo1, axis=1),
                               jnp.take_along_axis(r1, hi1, axis=1))
                m_top = d2 == d
                m_bot = d2 == d - 1
                f11 = jnp.where(m_top, g1, f11)
                f21 = jnp.where(m_top, g2, f21)
                f12 = jnp.where(m_bot, g1, f12)
                f22 = jnp.where(m_bot, g2, f22)
            return f11, f21, f12, f22

        acc = (zero, zero, zero, zero)
        for q in range(nq):
            acc = jax.lax.cond((q >= q_lo) & (q < q_hi),
                               lambda a, q=q: chunk(q, a), lambda a: a, acc)
        f11, f21, f12, f22 = acc
        return p3 * (p1 * f11 + p2 * f21) + p4 * (p1 * f12 + p2 * f22)

    vr1 = vr2 = vr4 = vr5 = vr6 = intc = zero
    vr12 = vr22 = vr42 = vr52 = vr62 = intc2 = zero
    for c in range(c_):
        g2w = sample(c)
        ix = sample(c_ + c)
        iy = sample(2 * c_ + c)
        ixx = sample(3 * c_ + c)
        ixy = sample(4 * c_ + c)
        iyy = sample(5 * c_ + c)
        ix = jnp.where(bc_x, 0.0, ix)
        ixx = jnp.where(bc_x, 0.0, ixx)
        iyy = jnp.where(bc_y, 0.0, iyy)
        ixy = jnp.where(bc_x | bc_y, 0.0, ixy)
        iy = jnp.where(bc_y, 0.0, iy)
        it = g2w - g1_ref[c]
        ixt = ix - gx1_ref[c]
        iyt = iy - gy1_ref[c]
        if dozim:
            na = 1.0 / (ix * ix + iy * iy + 1.0)
            nb = 1.0 / (ixx * ixx + ixy * ixy + 1.0)
            nc = 1.0 / (ixy * ixy + iyy * iyy + 1.0)
        else:
            na = nb = nc = zero + 1.0
        intc = intc + na * it * it
        intc2 = intc2 + nb * ixt * ixt + nc * iyt * iyt
        vr1 = vr1 + na * ix * ix
        vr12 = vr12 + nb * ixx * ixx + nc * ixy * ixy
        vr2 = vr2 + na * ix * iy
        vr22 = vr22 + nb * ixx * ixy + nc * iyy * ixy
        vr4 = vr4 + na * iy * iy
        vr42 = vr42 + nb * ixy * ixy + nc * iyy * iyy
        vr5 = vr5 + (-na * it) * ix
        vr52 = vr52 - (nb * ixt * ixx + nc * iyt * ixy)
        vr6 = vr6 + (-na * it) * iy
        vr62 = vr62 - (nb * ixt * ixy + nc * iyt * iyy)

    psid = _rsqrt_eps(intc) / alpha
    psid2 = lam_a * _rsqrt_eps(intc2)

    a1_ref[:] = al1 * (vr1 / alpha + lam_a * vr12 + lambdac + 4.0) \
        + one_m * (psid * vr1 + psid2 * vr12 + lambdac + psistot)
    a2_ref[:] = al1 * (vr2 / alpha + lam_a * vr22) \
        + one_m * (psid * vr2 + psid2 * vr22)
    a4_ref[:] = al1 * (vr4 / alpha + lam_a * vr42 + lambdac + 4.0) \
        + one_m * (psid * vr4 + psid2 * vr42 + lambdac + psistot)
    a5_ref[:] = -(al1 + one_m * psis1)
    a6_ref[:] = -(al1 + one_m * psis2)
    a7_ref[:] = -(al1 + one_m * psis3)
    a8_ref[:] = -(al1 + one_m * psis4)
    hint_u = lambdac * (u_c - uh_ref[:])
    hint_v = lambdac * (v_c - vh_ref[:])
    bu_ref[:] = al1 * (vr5 / alpha + lam_a * vr52 - hint_u + psisnmiuq - 4.0 * u_c) \
        + one_m * (psid * vr5 + psid2 * vr52 - hint_u + psisnmiu - psistot * u_c)
    bv_ref[:] = al1 * (vr6 / alpha + lam_a * vr62 - hint_v + psisnmivq - 4.0 * v_c) \
        + one_m * (psid * vr6 + psid2 * vr62 - hint_v + psisnmiv - psistot * v_c)


@functools.lru_cache(maxsize=None)
def _build(c_, h, w, dv, bh, dozim):
    dv = dv + ((3 - dv) % 4)
    src_h = bh + 2 * dv + 2
    gh, gw = h // bh, w // BW
    kern = functools.partial(_kernel, c_=c_, h=h, w=w, bh=bh, dv=dv,
                             src_h=src_h, dozim=dozim)
    blk = lambda r, c, *_: (r, c)
    cblk = lambda r, c, *_: (0, r, c)
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(gh, gw),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),   # padded sample stack
                pl.BlockSpec(memory_space=pltpu.HBM),   # mirror-padded (u, v)
                pl.BlockSpec((c_, bh, BW), cblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((c_, bh, BW), cblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((c_, bh, BW), cblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, BW), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, BW), blk, memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec((bh, BW), blk, memory_space=pltpu.VMEM)
                for _ in range(9)),
            scratch_shapes=[
                pltpu.VMEM((6 * c_, src_h, SRC_W), jnp.float32),
                pltpu.VMEM((2, bh + 8, SRC_W), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((h, w), jnp.float32) for _ in range(9)),
    )

    def run(stack_padded, geo1, gx1, gy1, u, v, uhat, vhat,
            al1, alpha, lam_a, lambdac):
        # mirror-pad u, v at distance 1 (solver BC) + alignment padding:
        # padded row/col = global + 1; extra rows so every (bh+8)-row and
        # 256-col window stays in bounds
        def mpad(a):
            a = jnp.concatenate([a[1:2], a, a[-2:-1]], axis=0)
            a = jnp.concatenate([a[:, 1:2], a, a[:, -2:-1]], axis=1)
            return jnp.pad(a, ((0, 6), (0, SRC_W - 2)))

        uvp = jnp.stack([mpad(u), mpad(v)])
        jj = jnp.arange(h, dtype=jnp.float32)[:, None]
        py = jj + jnp.clip(v, -float(dv), float(dv))
        py = jnp.where(py < 0.0, 0.0, jnp.where(py >= h, float(h - 1), py))
        jv1 = jnp.minimum(py.astype(jnp.int32), h - 2)
        d2 = jv1 - jj.astype(jnp.int32) + dv
        d2b = d2.reshape(gh, bh, gw, BW)
        q_lo = (jnp.min(d2b, axis=(1, 3)) // 8).astype(jnp.int32)
        q_hi = (((jnp.max(d2b, axis=(1, 3)) + 1) // 8) + 1).astype(jnp.int32)
        par = jnp.stack([jnp.asarray(al1, jnp.float32),
                         jnp.asarray(alpha, jnp.float32),
                         jnp.asarray(lam_a, jnp.float32),
                         jnp.asarray(lambdac, jnp.float32)])
        out = call(q_lo, q_hi, par, stack_padded, uvp,
                   geo1, gx1, gy1, uhat, vhat)
        return StencilSystem(*out)

    run.pad = lambda fields: jnp.pad(
        fields, ((0, 0), (dv, src_h - bh - dv), (PAD, PAD)))
    return run


def make_pallas_assemble(shape, nchan: int, dozim: bool,
                         max_disp_v: int = 30):
    """Fused assembly callable, or None when the kernel doesn't apply."""
    from octane_tpu.ops.pallas.warp import pallas_warp_available

    h, w = shape
    if not pallas_warp_available(shape):
        return None
    bh = _pick_bh(h)
    return _build(nchan, h, w, int(max_disp_v), bh, bool(dozim))

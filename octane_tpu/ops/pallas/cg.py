"""Fused Pallas PCG iteration for the coupled stencil system.

The CG loop is the solver's dominant cost at product shapes (~77% of a
full-disk pair): XLA schedules each iteration as ~8 separate HBM passes
(apply, three dots, four vector updates), moving ~2x more bytes than the
math needs.  This module fuses one PCG iteration into TWO row-banded
kernels with auto-pipelined block streaming:

  * pass A ("direction + apply"): p_new = M^-1 r + beta * p is computed on
    the fly (including one halo row from the neighbour bands, so the
    5-point apply needs no extra pass), A p_new and the <p, Ap> partial
    come out in the same sweep;
  * pass B ("update"): x += alpha p, r -= alpha Ap, plus the <r, M^-1 r>
    and <r, r> partials for beta and the stopping rule.

Per-band halo rows arrive as extra 8-row input blocks (index-map tricks,
no manual DMA), so Pallas double-buffers everything.  The mirror-at-1
boundary (oct_variational_optical_flow.cu:629-652) is applied in-kernel
with global-index selects, matching core.bc.mirror_shift; lane shifts are
rolls whose wrapped columns are overwritten by those selects.

Math and update order are exactly flow.cg.pcg_solve (Jacobi PCG); dot
products tree-reduce per band instead of one global jnp.sum, so results
match to float round-off, not bitwise (the oracle budget is rtol 5e-3).

The quadratic GNC step's scalar off-diagonals (-1) get a specialized build
that skips four coefficient streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 64          # row-band height (VMEM: ~11 double-buffered (BH, W) blocks)


def _shift_ops(pn, w, bh, rb, true_h):
    """Interior N/S/W/E neighbours of the (2, bh+16, w) banded field with
    the solver's mirror-at-1 fixups at the TRUE edges."""
    c = pn[:, 8:8 + bh, :]
    n = pn[:, 7:7 + bh, :]
    s = pn[:, 9:9 + bh, :]
    grow = (rb * bh + lax.broadcasted_iota(jnp.int32, (1, bh, 1), 1))
    # mirror: row 0's north := row 1; row true_h-1's south := row true_h-2
    n = jnp.where(grow == 0, pn[:, 9:9 + bh, :], n)
    s = jnp.where(grow == true_h - 1, pn[:, 7:7 + bh, :], s)
    wv = jnp.roll(c, 1, axis=2)
    ev = jnp.roll(c, -1, axis=2)
    gcol = lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    wv = jnp.where(gcol == 0, c[:, :, 1:2], wv)
    ev = jnp.where(gcol == w - 1, c[:, :, w - 2:w - 1], ev)
    return c, n, s, wv, ev


def _pass_a(beta_ref, rn, rb_, rs, pn_, pb, ps, a1n, a1b, a1s, a4n, a4b, a4s,
            a2, a5, a6, a7, a8,
            pnew_ref, ap_ref, pap_ref, *, bh, w, true_h, quad):
    rbk = pl.program_id(0)
    beta = beta_ref[0]
    r_f = jnp.concatenate([rn[...], rb_[...], rs[...]], axis=1)  # (2,bh+16,w)
    p_f = jnp.concatenate([pn_[...], pb[...], ps[...]], axis=1)
    a1f = jnp.concatenate([a1n[...], a1b[...], a1s[...]], axis=1)
    a4f = jnp.concatenate([a4n[...], a4b[...], a4s[...]], axis=1)
    minv = jnp.concatenate([1.0 / a1f, 1.0 / a4f], axis=0)
    pn = minv * r_f + beta * p_f                       # (2, bh+16, w)

    c, n, s, wv, ev = _shift_ops(pn, w, bh, rbk, true_h)
    cu, cv = c[0:1], c[1:2]
    if quad:
        off_u = -(wv[0:1] + ev[0:1] + n[0:1] + s[0:1])
        off_v = -(wv[1:2] + ev[1:2] + n[1:2] + s[1:2])
    else:
        a5v, a6v, a7v, a8v = a5[...], a6[...], a7[...], a8[...]
        off_u = a5v * wv[0:1] + a7v * ev[0:1] + a6v * n[0:1] + a8v * s[0:1]
        off_v = a5v * wv[1:2] + a7v * ev[1:2] + a6v * n[1:2] + a8v * s[1:2]
    a1c = a1f[:, 8:8 + bh, :]
    a4c = a4f[:, 8:8 + bh, :]
    a2v = a2[...]
    apu = a1c * cu + a2v * cv + off_u
    apv = a2v * cu + a4c * cv + off_v
    ap = jnp.concatenate([apu, apv], axis=0)
    pnew_ref[:] = c
    ap_ref[:] = ap
    pap_ref[rbk, 0] = jnp.sum(c * ap, dtype=jnp.float32)


def _pass_b(alpha_ref, x, r, p, ap, a1, a4, xo, ro, rz_ref, resid_ref):
    alpha = alpha_ref[0]
    xn = x[...] + alpha * p[...]
    rn = r[...] - alpha * ap[...]
    xo[:] = xn
    ro[:] = rn
    minv = jnp.concatenate([1.0 / a1[...], 1.0 / a4[...]], axis=0)
    i = pl.program_id(0)
    rz_ref[i, 0] = jnp.sum(rn * (minv * rn), dtype=jnp.float32)
    resid_ref[i, 0] = jnp.sum(rn * rn, dtype=jnp.float32)


@functools.lru_cache(maxsize=None)
def _build(h, w, quad):
    hp = -(-h // BH) * BH
    gh = hp // BH
    f32 = jnp.float32

    def body_spec(c2=True):
        shape = (2, BH, w) if c2 else (1, BH, w)
        return pl.BlockSpec(shape, lambda i, *_: (0, i, 0))

    def halo_spec(delta, c2=True):
        # 8-row band just above (delta=-1) / below (delta=+1) block i;
        # clamped at the array ends (those rows are never used: the mirror
        # selects replace them at the true edges)
        nb = hp // 8
        shape = (2, 8, w) if c2 else (1, 8, w)

        def imap(i, *_):
            j = i * (BH // 8) + (-1 if delta < 0 else BH // 8)
            return (0, jnp.clip(j, 0, nb - 1), 0)

        return pl.BlockSpec(shape, imap)

    a_in = [
        halo_spec(-1), body_spec(), halo_spec(+1),          # r
        halo_spec(-1), body_spec(), halo_spec(+1),          # p
        halo_spec(-1, False), body_spec(False), halo_spec(+1, False),  # a1
        halo_spec(-1, False), body_spec(False), halo_spec(+1, False),  # a4
        body_spec(False),                                   # a2
    ]
    if not quad:
        a_in += [body_spec(False)] * 4                      # a5..a8

    kern_a = functools.partial(_pass_a, bh=BH, w=w, true_h=h, quad=quad)
    if quad:
        def kern_a(beta_ref, rn, rb_, rs, pn_, pb, ps, a1n, a1b, a1s,
                   a4n, a4b, a4s, a2, pnew_ref, ap_ref, pap_ref):
            return _pass_a(beta_ref, rn, rb_, rs, pn_, pb, ps,
                           a1n, a1b, a1s, a4n, a4b, a4s, a2,
                           None, None, None, None,
                           pnew_ref, ap_ref, pap_ref,
                           bh=BH, w=w, true_h=h, quad=True)

    # band-wide temporaries exceed Mosaic's default 16M scoped-VMEM stack
    # at full-disk widths; total (inputs + outputs + scoped) stays < 128M
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    pass_a = pl.pallas_call(
        kern_a,
        compiler_params=params,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gh,),
            in_specs=a_in,
            out_specs=(
                pl.BlockSpec((2, BH, w), lambda i, *_: (0, i, 0)),
                pl.BlockSpec((2, BH, w), lambda i, *_: (0, i, 0)),
                pl.BlockSpec((gh, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, hp, w), f32),
            jax.ShapeDtypeStruct((2, hp, w), f32),
            jax.ShapeDtypeStruct((gh, 1), f32),
        ),
    )

    pass_b = pl.pallas_call(
        functools.partial(_pass_b),
        compiler_params=params,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gh,),
            in_specs=[body_spec(), body_spec(), body_spec(), body_spec(),
                      body_spec(False), body_spec(False)],
            out_specs=(
                pl.BlockSpec((2, BH, w), lambda i, *_: (0, i, 0)),
                pl.BlockSpec((2, BH, w), lambda i, *_: (0, i, 0)),
                pl.BlockSpec((gh, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((gh, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, hp, w), f32),
            jax.ShapeDtypeStruct((2, hp, w), f32),
            jax.ShapeDtypeStruct((gh, 1), f32),
            jax.ShapeDtypeStruct((gh, 1), f32),
        ),
    )
    return pass_a, pass_b, hp


def pcg_solve_fused(sysm, tol, iters: int):
    """Drop-in for flow.cg.pcg_solve on TPU (single-device, unpadded dims).

    ``sysm`` is a flow.stencil.StencilSystem; scalar off-diagonals (the
    quadratic GNC step) select the specialized build.
    """
    h, w = sysm.bu.shape
    quad = jnp.ndim(sysm.a5) == 0
    pass_a, pass_b, hp = _build(h, w, bool(quad))
    f32 = jnp.float32

    def pad2(a):
        return jnp.pad(jnp.stack(a), ((0, 0), (0, hp - h), (0, 0)))

    def pad1(a, val=0.0):
        return jnp.pad(a, ((0, hp - h), (0, 0)),
                       constant_values=f32(val))[None]

    b = pad2([sysm.bu, sysm.bv])
    a1 = pad1(sysm.a1, 1.0)          # identity rows: zero residual, no
    a4 = pad1(sysm.a4, 1.0)          # contribution to any dot product
    a2 = pad1(sysm.a2)
    coefs = (a1, a1, a1, a4, a4, a4, a2)
    if not quad:
        coefs = coefs + (pad1(sysm.a5), pad1(sysm.a6), pad1(sysm.a7),
                         pad1(sysm.a8))

    r0 = b
    x0 = jnp.zeros_like(b)
    minv = jnp.concatenate([1.0 / a1, 1.0 / a4], axis=0)
    rz0 = jnp.sum(r0 * (minv * r0), dtype=f32)
    resid0 = jnp.sum(r0 * r0, dtype=f32)

    def cond(st):
        return (st[4] > tol) & (st[6] < iters)

    def body(st):
        x, r, p, rz, resid, beta, k = st
        args = (r, r, r, p, p, p, coefs[0], coefs[1], coefs[2],
                coefs[3], coefs[4], coefs[5], coefs[6]) + tuple(coefs[7:])
        p_new, ap, pap_v = pass_a(jnp.reshape(beta, (1,)), *args)
        alpha = rz / jnp.sum(pap_v, dtype=f32)
        x, r, rz_v, resid_v = pass_b(jnp.reshape(alpha, (1,)),
                                     x, r, p_new, ap, a1, a4)
        rz_new = jnp.sum(rz_v, dtype=f32)
        return (x, r, p_new, rz_new, jnp.sum(resid_v, dtype=f32),
                rz_new / rz, k + 1)

    st = (x0, r0, jnp.zeros_like(b), rz0, resid0, f32(0.0), jnp.int32(0))
    x, *_ = lax.while_loop(cond, body, st)
    return x[0, :h], x[1, :h]


def pallas_cg_available(shape) -> bool:
    h, w = shape
    if jax.default_backend() == "cpu":
        return False
    return h >= 128 and w >= 256

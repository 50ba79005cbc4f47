"""Spatially sharded post-processing: pix2uv, SRSAL, temporal interpolation.

The reference runs these as CUDA kernels over the full grid
(oct_pix2uv_cuda.cu:265, oct_srsal_cuda.cu:73, oct_interp.cc:64); here each
gets a mesh-sharded equivalent so a full-disk product run never funnels a
full-resolution field through one chip:

* pix2uv / pix2uv_ms are pure elementwise programs -- jit with sharded
  inputs and GSPMD partitions them with zero communication;
* SRSAL exchanges a filtsize-pixel halo via ppermute, fixes the global-edge
  halos to the reference's mixed-reflect boundary, and runs the same tap
  loop per shard;
* temporal interpolation exchanges one common halo for all fields, splats
  per shard (sources within H+1 of a kept target are always present, so
  scatter-min conflict resolution including the global scan-order tie-break
  is exact), fills holes with a per-iteration 1-px halo exchange (globally
  equivalent to the single-device Jacobi fixed point), and synthesizes the
  frame locally.

``max_disp`` bounds |u|,|v| in PIXELS for the interpolation halo; it is a
static compile choice checked at runtime by the caller (flow beyond it
would splat farther than the halo reaches).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from octane_tpu.parallel.halo import halo_pad2d
from octane_tpu.parallel.mesh import flow_sharding


# --------------------------------------------------------------------------
# pix2uv: elementwise, GSPMD-partitioned
# --------------------------------------------------------------------------

def sharded_pix2uv(u_pix, v_pix, nav, dt: float, mesh, grid: str = "goes",
                   pixuv: bool = False):
    """pix2uv over the mesh: elementwise math partitions for free; the jit
    keeps inputs and outputs sharded (no full-field gather)."""
    from octane_tpu.nav.winds import pix2uv

    fsh = flow_sharding(mesh)
    u_pix = jax.device_put(jnp.asarray(u_pix), fsh)
    v_pix = jax.device_put(jnp.asarray(v_pix), fsh)
    fn = jax.jit(
        functools.partial(pix2uv, nav=nav, dt=dt, grid=grid, pixuv=pixuv),
        out_shardings=(fsh,) * 4,
    )
    return fn(u_pix, v_pix)


def sharded_pix2uv_ms(u_pix, v_pix, nav, dt: float, mesh, grid: str = "goes"):
    from octane_tpu.nav.winds import pix2uv_ms

    fsh = flow_sharding(mesh)
    u_pix = jax.device_put(jnp.asarray(u_pix), fsh)
    v_pix = jax.device_put(jnp.asarray(v_pix), fsh)
    fn = jax.jit(
        functools.partial(pix2uv_ms, nav=nav, dt=dt, grid=grid),
        out_shardings=(fsh,) * 2,
    )
    return fn(u_pix, v_pix)


# --------------------------------------------------------------------------
# SRSAL: halo exchange + reference mixed-reflect boundary + local tap loop
# --------------------------------------------------------------------------

def _reflect_fix_axis(ap, p: int, axis: int, axis_name: str):
    """Overwrite ppermute halos on the GLOBAL boundary with the reference's
    reflect map (oct_bc_cuda): padded[-k] = a[+k]; padded[n-1+k] = a[n-k]."""
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    nl = ap.shape[axis] - 2 * p

    def sl(lo, hi):
        idx = [slice(None)] * ap.ndim
        idx[axis] = slice(lo, hi)
        return ap[tuple(idx)]

    top = jnp.flip(sl(p + 1, 2 * p + 1), axis=axis)       # a[1..p] reversed
    bot = jnp.flip(sl(nl, nl + p), axis=axis)             # a[n-p..n-1] rev
    fixed_top = jnp.concatenate([top, sl(p, ap.shape[axis])], axis=axis)
    ap = jnp.where(i == 0, fixed_top, ap)
    fixed_bot = jnp.concatenate([sl(0, p + nl), bot], axis=axis)
    ap = jnp.where(i == n - 1, fixed_bot, ap)
    return ap


def _reflect_halo2d(a, p: int):
    ap = halo_pad2d(a, p)
    ap = _reflect_fix_axis(ap, p, -1, "dx")
    ap = _reflect_fix_axis(ap, p, -2, "dy")
    return ap


def sharded_srsal(u, v, cth, mesh, filtsigma: float = 9.0,
                  sigpix: float = 20.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mesh-sharded SRSAL; matches post.srsal.srsal_smooth on the XLA path
    elementwise (same taps, same boundary values via the halo fix)."""
    from octane_tpu.core.gaussian import gaussian_kernel_1d
    from octane_tpu.post.srsal import _tap_loop

    p = int(2 * filtsigma)
    gk = jnp.asarray(gaussian_kernel_1d(filtsigma, p))
    sigpix2 = -1.0 / (2.0 * sigpix * sigpix)
    ry, rx = mesh.shape["dy"], mesh.shape["dx"]
    h, w = u.shape
    if h // ry <= p or w // rx <= p:
        # halo wider than a shard: fall back to the single-program path
        from octane_tpu.post.srsal import srsal_smooth
        return srsal_smooth(u, v, cth, filtsigma, sigpix)
    hl, wl = h // ry, w // rx

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("dy", "dx"),) * 3,
        out_specs=(P("dy", "dx"), P("dy", "dx")))
    def run(ul, vl, cl):
        up = _reflect_halo2d(ul, p)
        vp = _reflect_halo2d(vl, p)
        cp = _reflect_halo2d(cl, p)
        return _tap_loop(up, vp, cp, cl, gk, sigpix2, hl, wl)

    fsh = flow_sharding(mesh)
    u = jax.device_put(jnp.asarray(u, jnp.float32), fsh)
    v = jax.device_put(jnp.asarray(v, jnp.float32), fsh)
    cth = jax.device_put(jnp.asarray(cth, jnp.float32), fsh)
    return run(u, v, cth)


# --------------------------------------------------------------------------
# Temporal interpolation: halo'd splat + iterative fill + local synthesis
# --------------------------------------------------------------------------

_HOLE = -999.0
_BIGCOST = 999999.0


def _round_half_up(x):
    return jnp.floor(x + 0.5)


def _splat_local(u_e, v_e, g1_e, g2_e, time, h, w, oy, ox, tgrid_off,
                 th_t, tw_t, e):
    """Forward splat onto a target grid extended by ``tgrid_off``.

    Sources are the E-extended local fields (global origin (oy - e, ox - e));
    the target grid's global origin is (oy - tgrid_off, ox - tgrid_off) with
    shape (th_t, tw_t).  Exact for every kept target: all sources within
    H+1 of it are present with exact global data and global tie order
    (sources whose im2 cost reads would leave the extension only ever splat
    to dropped targets).
    """
    hs, ws = u_e.shape
    jj = (oy - e) + jnp.arange(hs, dtype=jnp.float32)[:, None]
    ii = (ox - e) + jnp.arange(ws, dtype=jnp.float32)[None, :]
    iv = jnp.clip(_round_half_up(ii + time * u_e), 0, w - 2).astype(jnp.int32)
    jv = jnp.clip(_round_half_up(jj + time * v_e), 0, h - 2).astype(jnp.int32)
    iv2 = jnp.clip(_round_half_up(ii + u_e), 0, w - 2).astype(jnp.int32)
    jv2 = jnp.clip(_round_half_up(jj + v_e), 0, h - 2).astype(jnp.int32)
    # local (clamped) indices for the im2 cost read; far sources may clamp
    # to wrong values but only ever splat to dropped targets
    jv2l = jnp.clip(jv2 - (oy - e), 0, hs - 2)
    iv2l = jnp.clip(iv2 - (ox - e), 0, ws - 2)

    src = (jj.astype(jnp.int32) * w + ii.astype(jnp.int32)).reshape(-1)
    # halo_pad2d edge-replicates at the GLOBAL boundary, creating phantom
    # copies of edge pixels with out-of-image coords; they are not sources
    # in the single-device splat (and their negative src id would win every
    # scan-order tie), so they must never win a target
    src_valid = (jj >= 0) & (jj < h) & (ii >= 0) & (ii < w)
    n = th_t * tw_t
    tgts, costs, orders = [], [], []
    for l in range(2):
        for k in range(2):
            ty = jv + l - (oy - tgrid_off)
            tx = iv + k - (ox - tgrid_off)
            keep = src_valid & (ty >= 0) & (ty < th_t) & (tx >= 0) & (tx < tw_t)
            tgt = jnp.where(keep, ty * tw_t + tx, n).reshape(-1)
            diff = g1_e - g2_e[jv2l + l, iv2l + k]
            cost = (diff * diff).reshape(-1)
            order = src * 4 + l * 2 + k
            tgts.append(tgt)
            costs.append(cost)
            orders.append(order)
    tgt = jnp.concatenate(tgts)
    cost = jnp.concatenate(costs)
    order = jnp.concatenate(orders)

    best_cost = jnp.full((n + 1,), _BIGCOST + 1.0, jnp.float32)
    best_cost = best_cost.at[tgt].min(cost, mode="drop")
    tie = cost == best_cost.at[tgt].get(mode="fill", fill_value=jnp.inf)
    big_order = jnp.iinfo(jnp.int32).max
    best_order = jnp.full((n + 1,), big_order, jnp.int32)
    best_order = best_order.at[tgt].min(
        jnp.where(tie, order, big_order), mode="drop")
    win = tie & (order == best_order.at[tgt].get(mode="fill", fill_value=-1))

    uflat = jnp.tile(u_e.reshape(-1), 4)
    vflat = jnp.tile(v_e.reshape(-1), 4)
    ut = jnp.full((n + 1,), _HOLE, jnp.float32)
    vt = jnp.full((n + 1,), _HOLE, jnp.float32)
    ut = ut.at[jnp.where(win, tgt, n + 0)].set(uflat, mode="drop")
    vt = vt.at[jnp.where(win, tgt, n + 0)].set(vflat, mode="drop")
    return ut[:n].reshape(th_t, tw_t), vt[:n].reshape(th_t, tw_t)


def _fill_holes_sharded(ut, vt, max_iters: int = 10000):
    """Jacobi hole fill with a 1-px halo exchange per iteration; globally
    identical to post.temporal.fill_holes (constant -999 pad at the true
    image boundary is what edge shards' halo replication must provide, so
    the exchange pads _HOLE at the global edges)."""
    hl, wl = ut.shape

    def pad_hole(a):
        # halo_pad2d edge-replicates at global boundaries; the single-device
        # fill pads the constant _HOLE there instead, so overwrite
        ap = halo_pad2d(a, 1)
        ndy, idy = lax.axis_size("dy"), lax.axis_index("dy")
        ndx, idx = lax.axis_size("dx"), lax.axis_index("dx")
        i = jnp.arange(ap.shape[0])[:, None]
        j = jnp.arange(ap.shape[1])[None, :]
        hole_row = ((i == 0) & (idy == 0)) | ((i == hl + 1) & (idy == ndy - 1))
        hole_col = ((j == 0) & (idx == 0)) | ((j == wl + 1) & (idx == ndx - 1))
        return jnp.where(hole_row | hole_col, _HOLE, ap)

    def step(state):
        ut, vt, _, it = state
        up = pad_hole(ut)
        vp = pad_hole(vt)
        hole = ut < -998.0
        nsu, nsv = [], []
        for dj in (-1, 0, 1):
            for di in (-1, 0, 1):
                if dj == 0 and di == 0:
                    continue
                nsu.append(up[1 + dj:1 + dj + hl, 1 + di:1 + di + wl])
                nsv.append(vp[1 + dj:1 + dj + hl, 1 + di:1 + di + wl])
        cnt = sum(jnp.where(x > -998.0, 1.0, 0.0) for x in nsu)
        su = sum(jnp.where(x > -998.0, x, 0.0) for x in nsu)
        sv = sum(jnp.where(x > -998.0, x, 0.0) for x in nsv)
        can = hole & (cnt > 0)
        ut = jnp.where(can, su / jnp.maximum(cnt, 1.0), ut)
        vt = jnp.where(can, sv / jnp.maximum(cnt, 1.0), vt)
        holes = lax.psum(jnp.sum((ut < -998.0).astype(jnp.int32)),
                         ("dy", "dx"))
        return ut, vt, holes, it + 1

    def cond(state):
        return (state[2] > 0) & (state[3] < max_iters)

    holes0 = lax.psum(jnp.sum((ut < -998.0).astype(jnp.int32)), ("dy", "dx"))
    ut, vt, _, _ = lax.while_loop(cond, step, (ut, vt, holes0, jnp.int32(0)))
    return ut, vt


def sharded_interpolate_frame(u, v, im1, im2, frac: float, mesh,
                              max_disp: int = 32):
    """Mesh-sharded equivalent of post.temporal.interpolate_frame.

    ``max_disp`` must bound max(|u|, |v|); the halo is sized from it.
    Returns ((C, H, W) image, (H, W) int16 occlusion), sharded.
    """
    c_, h, w = im1.shape
    ry, rx = mesh.shape["dy"], mesh.shape["dx"]
    hl, wl = h // ry, w // rx
    hh = int(max_disp)
    # one common extension for all fields: splat-contributing sources sit
    # within t2 + H + 1 of the block and their im2 cost reads reach another
    # H + 2, so e >= 4H + 6 keeps every kept-target cost read exact
    e = 4 * hh + 8
    t2 = 2 * hh + 3                 # ut2/vt2 target-grid extension
    b = hh + 2                      # occlusion-field extension
    if e >= hl or e >= wl:
        from octane_tpu.post.temporal import interpolate_frame
        return interpolate_frame(u, v, im1, im2, frac)
    time = jnp.float32(frac)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("dy", "dx"), P("dy", "dx"),
                  P(None, "dy", "dx"), P(None, "dy", "dx")),
        out_specs=(P(None, "dy", "dx"), P("dy", "dx")))
    def run(ul, vl, im1l, im2l):
        oy = lax.axis_index("dy") * hl
        ox = lax.axis_index("dx") * wl
        u_e = halo_pad2d(ul, e)
        v_e = halo_pad2d(vl, e)
        g1_e = halo_pad2d(im1l, e)      # (C, hl+2e, wl+2e)
        g2_e = halo_pad2d(im2l, e)

        # splat to 'time' on the true grid, then the global-parity fill
        ut, vt = _splat_local(u_e, v_e, g1_e[0], g2_e[0], time,
                              h, w, oy, ox, 0, hl, wl, e)
        ut, vt = _fill_holes_sharded(ut, vt)
        # splat to 1.0 on the t2-extended grid (occlusion tests gather it)
        ut2, vt2 = _splat_local(u_e, v_e, g1_e[0], g2_e[0], jnp.float32(1.0),
                                h, w, oy, ox, t2, hl + 2 * t2, wl + 2 * t2, e)

        # occlusion fields on the b-extended grid
        jj_b = (oy - b) + jnp.arange(hl + 2 * b, dtype=jnp.float32)[:, None]
        ii_b = (ox - b) + jnp.arange(wl + 2 * b, dtype=jnp.float32)[None, :]
        u_b = u_e[e - b:e - b + hl + 2 * b, e - b:e - b + wl + 2 * b]
        v_b = v_e[e - b:e - b + hl + 2 * b, e - b:e - b + wl + 2 * b]
        o1a = (ut2[t2 - b:t2 - b + hl + 2 * b,
                   t2 - b:t2 - b + wl + 2 * b] < -998.0)
        iv = jnp.clip(_round_half_up(ii_b + u_b), 0, w - 2).astype(jnp.int32)
        jv = jnp.clip(_round_half_up(jj_b + v_b), 0, h - 2).astype(jnp.int32)
        du = u_b - ut2[jv - (oy - t2), iv - (ox - t2)]
        dv = v_b - vt2[jv - (oy - t2), iv - (ox - t2)]
        o0a = (~o1a) & (du * du + dv * dv > 0.25)

        # backward synthesis at the true pixels
        jj = oy + jnp.arange(hl, dtype=jnp.float32)[:, None]
        ii = ox + jnp.arange(wl, dtype=jnp.float32)[None, :]

        def clamp_pos(x, n):
            return jnp.clip(x, 0.0, n - 2)

        x00 = clamp_pos(ii - time * ut, w)
        y00 = clamp_pos(jj - time * vt, h)
        x10 = clamp_pos(ii + (1.0 - time) * ut, w)
        y10 = clamp_pos(jj + (1.0 - time) * vt, h)

        def bilinear(img_e, x, y, oyy, oxx):
            x1 = jnp.trunc(x).astype(jnp.int32)
            y1 = jnp.trunc(y).astype(jnp.int32)
            fx = x - x1
            fy = y - y1
            xl = x1 - oxx
            yl = y1 - oyy
            f11 = img_e[..., yl, xl]
            f21 = img_e[..., yl, xl + 1]
            f12 = img_e[..., yl + 1, xl]
            f22 = img_e[..., yl + 1, xl + 1]
            return ((1 - fy) * ((1 - fx) * f11 + fx * f21)
                    + fy * ((1 - fx) * f12 + fx * f22))

        i0 = bilinear(g1_e, x00, y00, oy - e, ox - e)
        i1 = bilinear(g2_e, x10, y10, oy - e, ox - e)

        x0i = jnp.trunc(x00 + 0.5).astype(jnp.int32)
        y0i = jnp.trunc(y00 + 0.5).astype(jnp.int32)
        x1i = jnp.trunc(x10 + 0.5).astype(jnp.int32)
        y1i = jnp.trunc(y10 + 0.5).astype(jnp.int32)
        o0 = o0a[y0i - (oy - b), x0i - (ox - b)]
        o1 = o1a[y1i - (oy - b), x1i - (ox - b)]

        both = (~o0) & (~o1)
        img = jnp.where(both[None], (1.0 - time) * i0 + time * i1,
                        jnp.where(o1[None], i0, i1))
        occ = jnp.where(both, 0, jnp.where(o1, 2, 1)).astype(jnp.int16)
        return img, occ

    fsh = flow_sharding(mesh)
    ish = NamedSharding(mesh, P(None, "dy", "dx"))
    u = jax.device_put(jnp.asarray(u, jnp.float32), fsh)
    v = jax.device_put(jnp.asarray(v, jnp.float32), fsh)
    im1 = jax.device_put(jnp.asarray(im1, jnp.float32), ish)
    im2 = jax.device_put(jnp.asarray(im2, jnp.float32), ish)
    return run(u, v, im1, im2)

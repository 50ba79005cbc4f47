"""Pallas TPU kernel for the flow-dependent bilinear warp gather.

This is the solver's hot op: every assembly pass samples the six
image/gradient fields at (i + u, j + v) per pixel (reference: the in-loop
bilinear lookups at oct_variational_optical_flow.cu:732-766).  XLA lowers the
arbitrary 2-D gather to scalar loads (~2 ns/element), which dominates the
whole solve; this kernel restructures it for the VPU:

  * every grid block DMAs one aligned source window (K, BH + 2*DV + 2, 384)
    from the pre-padded fields in HBM into VMEM;
  * **the window origin is data-driven**: the host prefetches each block's
    minimum integer row/column sample index and the kernel DMAs from that
    (8-aligned row, 128-aligned column) origin, so the displacement
    MAGNITUDE is unlimited -- a 200-px jet displacement just moves the
    window.  Only the within-block displacement *spread* must fit the
    window slack (rows: 2*DV+1-7 ~ 31 px per 256-row block; columns: the
    384-wide window covers the 128-lane base span + alignment remainder
    with >= 126 px of u-spread slack) -- orders of magnitude beyond
    physical wind shear at GOES pixel scales.  Out-of-window spread
    overflow is clamped to the window edge (detectable post-hoc via
    ``row_spread_within_reach``);
  * pixels whose sample row clamps at the image boundary (py < 0 or
    py >= h) break the block's diagonal row pattern but need exactly one
    known row (row 0 when clamped low, since p4 == 0; row h-1 when
    clamped high, since p3 == 0): each block also DMAs those two edge
    rows, a gated edge path serves clamped pixels from them, and the
    window stats exclude them -- boundary clamping never costs exactness
    (columns are immune: their window is absolute over the lane base);
  * column sampling is a hardware lane gather (take_along_axis) over the
    aligned 128-lane thirds of the window, selected by index;
  * row sampling is one branch-free masked pass per LIVE row slice: a
    dynamic fori_loop over the host-prefetched per-block [d_lo, d_hi + 1]
    range whose body aligns window row d with output row 0 by a dynamic
    sublane roll, so smooth flow runs only its 2-4 live passes;
  * column interpolation is folded in per row slice (p1*g1 + p2*g2) and
    ROW interpolation is folded into the accumulation (slice d contributes
    p3 where it is a pixel's top row, p4 where it is the bottom row), so
    each field carries one accumulator;
  * the kernel is built as a small variant lattice -- row-slack buckets
    dv in {11, DV} x column windows {256, 384} -- dispatched per call from
    the actual flow stats, because the window DMA is the dominant fixed
    cost and smooth flow fits the small window (0.52x the traffic).

Arbitrary shapes are supported by padding: the grid runs over
(ceil(H/BH)*BH, ceil(W/128)*128) and the clamping math uses the TRUE H/W,
so real GOES sectors (full-disk 5424/21696, CONUS 2500x1500, odd pyramid
levels) all hit this kernel; padded output rows/cols are cropped.
Position clamps replicate oct_bc exactly (conditional clamp to the true
edge); boundary flags and interpolation weights match the reference.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def interpret_mode() -> bool:
    """Run Pallas kernels in interpret mode (CPU tests of the real kernel
    paths, including under shard_map)."""
    return os.environ.get("OCTANE_PALLAS_INTERPRET", "0") == "1"

SRC_W = 384          # source window width (three 128-lane vregs)
# Left column padding.  NOT a multiple of 128 relative to nothing -- the
# choice of 64 centres the window for near-zero flow: with the 128-aligned
# window origin, a block's first lane index ci lands at 64 + u_min mod 128,
# so for |u| < ~53 px the whole [ci, ci+127+spread+1] span stays below lane
# 256 and the cheaper 2-third kernel variant dispatches (a CPAD of 128
# would pin zero-flow spans exactly onto the 256 boundary).
CPAD = 64
BW = 128             # output block width (one vreg of lanes)
DV = 19              # row window half-slack; 2*DV+2 rows per window, 8-aligned


def _kernel(srow_ref, scol_ref, dlo_ref, dhi_ref, eflag_ref, f_hbm,
            u_ref, v_ref, o_ref, bx_ref, by_ref,
            src2, er_lo2, er_hi2, sem, sem_lo, sem_hi,
            *, k, h, w, bh, dv, src_h, gw, nblk, nthirds):
    # h/w here are the FIELD true dims (== output dims unless the caller
    # samples a larger frame, e.g. a halo-padded shard block).  dv and
    # nthirds are the row-slack / column-window buckets the host dispatched
    # from the actual per-call flow stats, so smooth flow moves a
    # (bh+24, 256) window instead of the worst-case (bh+40, 384).
    win_w = 128 * nthirds
    rb = pl.program_id(0)
    cb = pl.program_id(1)
    two = jnp.int32(2)
    lin = rb * gw + cb
    cur = jax.lax.rem(lin, two)
    nxt = jax.lax.rem(lin + 1, two)

    def start_dma(buf, blk):
        """Issue the window DMAs for linear block ``blk`` into double-buffer
        slot ``buf`` (data-driven origins from the prefetched per-block
        stats).  The edge-row DMAs serve only boundary-clamped rows, so they
        are gated on the block's eflag (interior blocks skip the traffic);
        starts and waits are gated on the SAME per-block flag, keeping every
        semaphore signal matched."""
        bi = blk // gw
        bj = jax.lax.rem(blk, jnp.int32(gw))
        s_row = pl.multiple_of(srow_ref[bi, bj], 8)
        s_col = pl.multiple_of(scol_ref[bi, bj], 128)
        pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(s_row, src_h), pl.ds(s_col, win_w)],
            src2.at[buf], sem.at[buf]).start()

        # edge rows 0 / fh-1 for boundary-clamped pixels: row-clamped
        # samples read exactly one of these two rows.  The host replicates
        # them 8x into the top padding band (padded rows [0, 8) / [8, 16))
        # so the DMA moves whole 8-row tiles.
        @pl.when(eflag_ref[bi, bj] != 0)
        def _():
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(0, 8), pl.ds(s_col, win_w)],
                er_lo2.at[buf], sem_lo.at[buf]).start()
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(8, 8), pl.ds(s_col, win_w)],
                er_hi2.at[buf], sem_hi.at[buf]).start()

    # software pipeline: block 0 starts its own window; every block then
    # prefetches block lin+1's window before computing on its own, hiding
    # the DMA issue+transfer latency behind the gather compute
    @pl.when(lin == 0)
    def _():
        start_dma(cur, lin)

    @pl.when(lin + 1 < nblk)
    def _():
        start_dma(nxt, lin + 1)

    s_row = pl.multiple_of(srow_ref[rb, cb], 8)
    s_col = pl.multiple_of(scol_ref[rb, cb], 128)
    src = src2.at[cur]
    er_lo = er_lo2.at[cur]
    er_hi = er_hi2.at[cur]

    u = u_ref[:]
    v = v_ref[:]
    lj = jax.lax.broadcasted_iota(jnp.int32, (bh, BW), 0)
    jj = (rb * bh + lj).astype(jnp.float32)
    ii = (cb * BW + jax.lax.broadcasted_iota(jnp.int32, (bh, BW), 1)
          ).astype(jnp.float32)
    px = ii + u
    py = jj + v
    # boundary flags, then the reference's conditional true-edge clamp
    bx_ref[:] = (px < 0.0) | (px >= w)
    by_ref[:] = (py < 0.0) | (py >= h)
    px = jnp.where(px < 0.0, 0.0, jnp.where(px >= w, float(w - 1), px))
    py = jnp.where(py < 0.0, 0.0, jnp.where(py >= h, float(h - 1), py))
    iv1 = jnp.minimum(px.astype(jnp.int32), w - 2)
    jv1 = jnp.minimum(py.astype(jnp.int32), h - 2)
    p1 = (iv1 + 1).astype(jnp.float32) - px
    p2 = px - iv1.astype(jnp.float32)
    p3 = (jv1 + 1).astype(jnp.float32) - py
    p4 = py - jv1.astype(jnp.float32)

    # window-local coordinates; spread overflow clamps to the window edge
    ci = jnp.clip(iv1 + CPAD - s_col, 0, win_w - 2)
    d2 = jnp.clip(jv1 + bh - s_row - lj, 0, 2 * dv)

    # wait for THIS block's window (issued by the previous grid step); the
    # edge-row waits live inside the eflag-gated edge path below
    pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(s_row, src_h), pl.ds(s_col, win_w)],
        src2.at[cur], sem.at[cur]).wait()

    # per-third lane-gather indices and the third-selection masks
    cip = ci + 1
    idx0 = (jnp.clip(ci, 0, 127), jnp.clip(ci - 128, 0, 127),
            jnp.clip(ci - 256, 0, 127), ci < 128, ci < 256)
    idx1 = (jnp.clip(cip, 0, 127), jnp.clip(cip - 128, 0, 127),
            jnp.clip(cip - 256, 0, 127), cip < 128, cip < 256)

    def lane_gather(rows, idx):
        # nthirds == 2 statically drops the third 128-lane gather + select:
        # with 128-aligned window origins the base lane span plus alignment
        # remainder stays under 255 whenever the per-block u-spread is
        # small (the common case); the host checks the real per-call bound
        # and dispatches the 2-third variant when it holds.
        a, b_, c_, s0, s1 = idx
        g01 = jnp.where(s0, jnp.take_along_axis(rows[:, :128], a, axis=1),
                        jnp.take_along_axis(rows[:, 128:256], b_, axis=1))
        if nthirds == 2:
            return g01
        return jnp.where(s1, g01,
                         jnp.take_along_axis(rows[:, 256:384], c_, axis=1))

    # One branch-free masked pass per LIVE row slice d in [d_lo, d_hi + 1]
    # (host-prefetched per-block range): a dynamic fori_loop whose body
    # aligns window row d with output row 0 by a dynamic sublane roll
    # (rows[lj] = window[(lj + d) mod src_h] = window[lj + d]; in range
    # because d + bh - 1 <= d_hi + 1 + bh - 1 <= src_h - 1).  This replaces
    # the former 8-way unrolled lax.cond chain, whose per-slice cost
    # measured ~3x a branch-free pass (tools/bench_warp_surgery.py).
    #
    # The row interpolation is FOLDED INTO the accumulation: slice d
    # contributes w_d * cb where w_d = p3 for the pixels whose top row this
    # is (d2 == d) and p4 for those whose bottom row it is (d2 == d - 1,
    # disjoint), so each field carries ONE accumulator instead of a
    # top/bottom pair -- half the loop-carried VMEM traffic.  Ascending d
    # adds the p3 term first, then the p4 term: acc = fma(p4, cb_bot,
    # round(p3 * cb_top)), the same values as the former two-select-
    # then-blend form (bit-exactness asserted on hardware by check_warp).
    zero = jnp.zeros((bh, BW), jnp.float32)
    d_lo = dlo_ref[rb, cb]
    d_hi = dhi_ref[rb, cb]
    f0 = jnp.float32(0.0)

    def slice_body(d, acc):
        w_d = jnp.where(d2 == d, p3, jnp.where(d2 == d - 1, p4, f0))
        out = []
        for c in range(k):
            rows = pltpu.roll(src[c], src_h - d, 0)[:bh]
            g1 = lane_gather(rows, idx0)
            g2 = lane_gather(rows, idx1)
            cb_ = p1 * g1 + p2 * g2            # column interpolation
            out.append(acc[c] + w_d * cb_)
        return out

    acc = jax.lax.fori_loop(d_lo, d_hi + 2, slice_body, [zero] * k)
    for c in range(k):
        o_ref[c] = acc[c]

    # boundary-clamped rows: py < 0 samples row 0 with weight 1 (p4 == 0);
    # py >= h samples row h-1 (p3 == 0).  These pixels are excluded from the
    # window stats (their jv1 does not follow the block's lj pattern), so
    # their values come from the edge-row slices instead.  Skipped entirely
    # for interior blocks (the common case).
    @pl.when(eflag_ref[rb, cb] != 0)
    def _edges():
        # edge-row DMA waits: gated on the same eflag as their starts, so
        # every semaphore signal stays matched
        pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(0, 8), pl.ds(s_col, win_w)],
            er_lo2.at[cur], sem_lo.at[cur]).wait()
        pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(8, 8), pl.ds(s_col, win_w)],
            er_hi2.at[cur], sem_hi.at[cur]).wait()
        py_raw = jj + v
        lo_m = py_raw < 0.0
        hi_m = py_raw >= h

        def replicate(rows8):
            # (8, SRC_W) -> (bh, SRC_W) by 8-aligned concat doubling (a lane
            # gather needs a physically-replicated standard-layout source)
            r = rows8
            while r.shape[0] < bh:
                r = jnp.concatenate([r, r], axis=0)
            return r

        for c in range(k):
            rlo = replicate(er_lo[c])
            rhi = replicate(er_hi[c])
            e_lo = p1 * lane_gather(rlo, idx0) + p2 * lane_gather(rlo, idx1)
            e_hi = p1 * lane_gather(rhi, idx0) + p2 * lane_gather(rhi, idx1)
            o_ref[c] = jnp.where(lo_m, e_lo, jnp.where(hi_m, e_hi, o_ref[c]))


def _sample_indices(u, v, h, w, hp, wp):
    """Integer sample cell origins (jv1, iv1) on the padded output grid,
    mirroring the kernel's clamp math exactly.  ``h``/``w`` are the FIELD
    true dims (clamp bounds)."""
    up = jnp.pad(u, ((0, hp - u.shape[0]), (0, wp - u.shape[1])))
    vp = jnp.pad(v, ((0, hp - v.shape[0]), (0, wp - v.shape[1])))
    jj = jnp.arange(hp, dtype=jnp.float32)[:, None]
    ii = jnp.arange(wp, dtype=jnp.float32)[None, :]
    px = ii + up
    py = jj + vp
    px = jnp.where(px < 0.0, 0.0, jnp.where(px >= w, float(w - 1), px))
    py = jnp.where(py < 0.0, 0.0, jnp.where(py >= h, float(h - 1), py))
    iv1 = jnp.minimum(px.astype(jnp.int32), w - 2)
    jv1 = jnp.minimum(py.astype(jnp.int32), h - 2)
    return jv1, iv1, up, vp


_BIG = jnp.int32(1 << 30)


def _stats_kernel(u_ref, v_ref, rmin_ref, rmax_ref, cmin_ref, cmax_ref,
                  ef_ref, *, h, w, fh, fw, bh, wp, gw):
    """Banded Pallas twin of ``_block_stats``: one grid step per bh-row band
    computes the (gw,) per-block window stats of that band.

    The XLA stats pass was measured ~3.6 ms/call at 5424^2 (multiple
    materialized (hp, wp) int planes + the (gh, bh, gw, BW) reshape
    reductions); this kernel streams u/v once (~0.3 ms HBM floor) and
    reduces in VMEM.  Same integer math as ``_sample_indices`` +
    ``_block_stats``, so the host-side dispatch sees identical stats."""
    rb = pl.program_id(0)
    i32 = jnp.int32
    u = u_ref[...]
    v = v_ref[...]
    lj = jax.lax.broadcasted_iota(i32, (bh, wp), 0)
    gj = rb * bh + lj
    gi = jax.lax.broadcasted_iota(i32, (bh, wp), 1)
    px = gi.astype(jnp.float32) + u
    py_raw = gj.astype(jnp.float32) + v
    px = jnp.where(px < 0.0, 0.0, jnp.where(px >= fw, float(fw - 1), px))
    py = jnp.where(py_raw < 0.0, 0.0,
                   jnp.where(py_raw >= fh, float(fh - 1), py_raw))
    iv1 = jnp.minimum(px.astype(i32), fw - 2)
    jv1 = jnp.minimum(py.astype(i32), fh - 2)
    valid = (gj < h) & (gi < w)
    rclamp = (py_raw < 0.0) | (py_raw >= fh)
    rvalid = valid & ~rclamp
    t_row = jv1 + bh - lj
    t_col = iv1 + CPAD

    big = 1 << 30

    # rows reduce on the VPU; the per-128-lane-group reduction is a static
    # loop of scalar SMEM writes (Mosaic cannot shape-cast lanes to
    # sublanes), band rb owning row rb of each (gh, gw) SMEM output
    for ref, x, mask, sentinel, red in (
            (rmin_ref, t_row, rvalid, big, jnp.min),
            (rmax_ref, t_row, rvalid, -big, jnp.max),
            (cmin_ref, t_col, valid, big, jnp.min),
            (cmax_ref, t_col, valid, -big, jnp.max),
            (ef_ref, (rclamp & valid).astype(i32), True, 0, jnp.max)):
        r = red(jnp.where(mask, x, sentinel), axis=0, keepdims=True)
        for g in range(gw):
            ref[rb, g] = red(r[:, 128 * g:128 * (g + 1)])


@functools.lru_cache(maxsize=None)
def _stats_build(h, w, fh, fw, bh, hp, wp):
    gh, gw = hp // bh, wp // BW
    kern = functools.partial(_stats_kernel, h=h, w=w, fh=fh, fw=fw,
                             bh=bh, wp=wp, gw=gw)
    spec = pl.BlockSpec((bh, wp), lambda r: (r, 0))
    out = pl.BlockSpec((gh, gw), lambda r: (0, 0),
                       memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kern,
        interpret=interpret_mode(),
        grid=(gh,),
        in_specs=[spec, spec],
        out_specs=(out,) * 5,
        out_shape=(jax.ShapeDtypeStruct((gh, gw), jnp.int32),) * 5,
    )


def _block_stats(jv1, iv1, vp, h, w, hp, wp, bh, fh=None):
    """Per-block window stats + row-clamped-pixel flags.

    Row stats run over the TRUE region excluding row-boundary-clamped
    pixels: padded rows/cols and clamped rows have sample indices that do
    not follow the block's lj pattern and would wreck the window; the
    kernel serves clamped pixels from the dedicated edge-row slices instead
    (``eflag`` marks blocks that have any).  Column stats run over the true
    region including clamped pixels (the column window is absolute, so the
    clamp cannot break the lane pattern).
    """
    fh = h if fh is None else fh
    gh, gw = hp // bh, wp // BW
    valid = ((jnp.arange(hp, dtype=jnp.int32)[:, None] < h)
             & (jnp.arange(wp, dtype=jnp.int32)[None, :] < w)
             ).reshape(gh, bh, gw, BW)
    py_raw = jnp.arange(hp, dtype=jnp.float32)[:, None] + vp
    rclamp = ((py_raw < 0.0) | (py_raw >= fh)).reshape(gh, bh, gw, BW)
    rvalid = valid & ~rclamp
    lj = jnp.arange(hp, dtype=jnp.int32)[:, None] % bh
    t_row = (jv1 + bh - lj).reshape(gh, bh, gw, BW)
    t_col = (iv1 + CPAD).reshape(gh, bh, gw, BW)
    r_min = jnp.min(jnp.where(rvalid, t_row, _BIG), axis=(1, 3))
    r_max = jnp.max(jnp.where(rvalid, t_row, -_BIG), axis=(1, 3))
    c_min = jnp.min(jnp.where(valid, t_col, _BIG), axis=(1, 3))
    c_max = jnp.max(jnp.where(valid, t_col, -_BIG), axis=(1, 3))
    eflag = jnp.any(rclamp & valid, axis=(1, 3)).astype(jnp.int32)
    return r_min, r_max, c_min, c_max, eflag


@functools.lru_cache(maxsize=None)
def _build(k, h, w, dv, bh, hp, wp, fh=None, fw=None, crop=True):
    """Kernel with OUTPUT true dims (h, w), grid over padded dims (hp, wp),
    sampling a field of true dims (fh, fw) -- equal to (h, w) unless the
    caller samples a larger frame (a halo-padded shard block), in which
    case positions are expected pre-shifted into the field frame.

    Builds a small lattice of kernel variants -- row-slack buckets
    dv in {11, dv} x column-window buckets {2, 3} thirds -- and dispatches
    per CALL on the actual flow stats: the window DMA is the kernel's
    dominant fixed cost (tools/bench_warp_surgery.py), and smooth flow fits
    the (bh+24, 256) window, 0.52x the worst case's traffic."""
    fh = h if fh is None else fh
    fw = w if fw is None else fw
    gh, gw = hp // bh, wp // BW
    dvs = sorted({min(11, dv), dv})
    # padded-array extents: rows get a bh top halo (so a window can start
    # anywhere the clamp allows) and bottom slack; cols similarly -- sized
    # for the LARGEST variant so every bucket indexes safely
    rows_p = max(hp, fh) + 2 * bh + 2 * dv + 2
    cols_p = -(-(max(wp, fw) + CPAD) // 128) * 128 + SRC_W

    def mkcall(nthirds, dv_b):
        src_h = bh + 2 * dv_b + 2
        win_w = 128 * nthirds
        kern = functools.partial(_kernel, k=k, h=fh, w=fw, bh=bh, dv=dv_b,
                                 src_h=src_h, gw=gw, nblk=gh * gw,
                                 nthirds=nthirds)
        return pl.pallas_call(
            kern,
            interpret=interpret_mode(),
            # the double-buffered window scratch + gather relayouts exceed
            # the default 16M scoped-vmem stack at bh=256
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(gh, gw),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.HBM),   # padded fields
                    pl.BlockSpec((bh, BW), lambda r, c, *_: (r, c),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bh, BW), lambda r, c, *_: (r, c),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((k, bh, BW), lambda r, c, *_: (0, r, c),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bh, BW), lambda r, c, *_: (r, c),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bh, BW), lambda r, c, *_: (r, c),
                                 memory_space=pltpu.VMEM),
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, k, src_h, win_w), jnp.float32),
                    pltpu.VMEM((2, k, 8, win_w), jnp.float32),
                    pltpu.VMEM((2, k, 8, win_w), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=(
                jax.ShapeDtypeStruct((k, hp, wp), jnp.float32),
                jax.ShapeDtypeStruct((hp, wp), jnp.bool_),
                jax.ShapeDtypeStruct((hp, wp), jnp.bool_),
            ),
        )

    calls = {(nt, dv_b): mkcall(nt, dv_b)
             for nt in (2, 3) for dv_b in dvs}

    pad_rows = (bh, rows_p - fh - bh)
    pad_cols = (CPAD, cols_p - fw - CPAD)

    def pad(fields):
        """Pre-pad the sample stack (hoistable: it is loop-invariant).

        The top padding band doubles as edge-row storage for the kernel's
        boundary-clamp path: padded rows [0, 8) hold row 0 replicated and
        [8, 16) hold row fh-1 (bh >= 32, so the band never reaches the true
        rows; the band is only read through the clipped offsets of pixels
        the edge path overwrites)."""
        p = jnp.pad(fields, ((0, 0), pad_rows, pad_cols))
        row0 = jnp.repeat(p[:, bh:bh + 1], 8, axis=1)
        rowh = jnp.repeat(p[:, bh + fh - 1:bh + fh], 8, axis=1)
        return p.at[:, 0:8].set(row0).at[:, 8:16].set(rowh)

    def run(fields, u, v):
        # accept either a raw (k, fh, fw) stack or one already padded
        padded = fields if fields.shape[-1] == cols_p else pad(fields)
        up = jnp.pad(u, ((0, hp - u.shape[0]), (0, wp - u.shape[1])))
        vp = jnp.pad(v, ((0, hp - v.shape[0]), (0, wp - v.shape[1])))
        # per-block window origins from the minimum TRUE-region sample index
        # (8-aligned rows / 128-aligned cols): the full 2*dv - 7 row slack is
        # available to the spread above the min.  Computed by the banded
        # Pallas stats kernel (same integer math as the XLA
        # _sample_indices + _block_stats pair, ~7x cheaper).
        r_min, r_max, c_min, c_max, eflag = _stats_build(
            h, w, fh, fw, bh, hp, wp)(up, vp)

        def row_args(dv_b):
            src_h = bh + 2 * dv_b + 2
            s_row = jnp.clip(r_min // 8 * 8,
                             0, rows_p - src_h).astype(jnp.int32)
            d_lo = jnp.clip(r_min - s_row, 0, 2 * dv_b).astype(jnp.int32)
            d_hi = jnp.clip(r_max - s_row, 0, 2 * dv_b).astype(jnp.int32)
            return s_row, d_lo, d_hi

        def col_args(nthirds):
            win_w = 128 * nthirds
            return jnp.clip(c_min // 128 * 128,
                            0, cols_p - win_w).astype(jnp.int32)

        rows_by_dv = {dv_b: row_args(dv_b) for dv_b in dvs}
        scol_by_nt = {nt: col_args(nt) for nt in (2, 3)}
        # the third 128-lane window third is touched only when some block's
        # column index reaches lane 255 (idx1 = ci + 1 >= 256); dispatch
        # the cheaper 2-third kernel when no block can
        need3 = jnp.any(c_max - scol_by_nt[2] >= 255)
        # the small row bucket is valid when every block's top sample-row
        # offset stays within the kernel's d2 clip range [0, 2*dv] (the
        # window holds d2 + 1 + bh rows, so the bilinear partner row d2 + 1
        # is in range); offsets past 2*dv would be silently clipped and
        # sample one source row too high, so such blocks must take the
        # large bucket (overflow beyond the LARGE bucket keeps the
        # documented clamp-to-window-edge semantics)
        if len(dvs) == 2:
            s_row_lo = rows_by_dv[dvs[0]][0]
            fits_lo = jnp.all(r_max - s_row_lo <= 2 * dvs[0])
        else:
            fits_lo = jnp.bool_(True)

        def dispatch(nt):
            def with_dv(dv_b):
                s_row, d_lo, d_hi = rows_by_dv[dv_b]
                return lambda: calls[(nt, dv_b)](
                    s_row, scol_by_nt[nt], d_lo, d_hi, eflag,
                    padded, up, vp)

            if len(dvs) == 1:
                return with_dv(dvs[0])()
            return jax.lax.cond(fits_lo, with_dv(dvs[0]), with_dv(dvs[1]))

        s, bx, by = jax.lax.cond(need3, lambda: dispatch(3),
                                 lambda: dispatch(2))
        if not crop:
            # fused-assembly path: hand the (k, hp, wp) padded planes
            # straight to the Pallas assemble kernel (padded pixels are
            # don't-cares there); skipping the crop keeps XLA from
            # materializing a sliced copy of the 6-plane stack
            return s, bx, by
        return s[:, :h, :w], bx[:h, :w], by[:h, :w]

    run.pad = pad
    return run


def _round_dv(dv: int) -> int:
    # VMEM slices must be 8-aligned along sublanes: pick dv with 2*dv + 2 a
    # multiple of 8.  dv = 3 (mod 8) additionally keeps a centred window's
    # zero-spread rows inside ONE 8-row chunk.
    return dv + ((3 - dv) % 8)


def _pick_bh(h: int, dv: int) -> int:
    """Block height.  With the branch-free roll-based slice loop and the
    fused row-interpolation accumulator, per-slice cost is VMEM streaming of
    the rolled window, so the trade is per-block fixed cost (window DMA +
    index math; favours big blocks) vs per-block row spread (favours small).
    Measured at 5424^2 (bench-like flow; stage tables in PROFILE_r05.md):
    bh 32/64/128 -> 19.7/18.2/18.3 ms -- 64 wins."""
    return 64 if h >= 64 else 32


def row_spread_within_reach(u, v, shape, max_disp_v: int = DV) -> bool:
    """Post-hoc check that the kernel windows covered every sample: the
    within-block spread of integer sample indices must fit the window slack
    (rows: 2*DV+1 minus 8-row alignment; cols: 384 minus the 128-lane base
    span and the 128 alignment).
    Magnitude is unlimited by design -- only extreme shear can overflow,
    in which case overflowing samples were clamped to their block's window
    edge and the caller should warn (see octane_tpu.pipeline)."""
    h, w = shape
    dv = _round_dv(int(max_disp_v))
    bh = _pick_bh(h, dv)
    hp = -(-h // bh) * bh
    wp = -(-w // BW) * BW
    jv1, iv1, _, vp = _sample_indices(jnp.asarray(u, jnp.float32),
                                      jnp.asarray(v, jnp.float32), h, w, hp, wp)
    r_min, r_max, c_min, c_max, _ = _block_stats(
        jv1, iv1, vp, h, w, hp, wp, bh)
    # all-clamped blocks have r_min == +BIG > r_max == -BIG; their rows are
    # served by the edge path, so treat the empty interior as zero spread
    r_spread = jnp.maximum(r_max - r_min, 0)
    ok = (jnp.max(r_spread) <= 2 * dv - 7) & (
        jnp.max(c_max - c_min) <= SRC_W - 130)
    return bool(ok)


def pallas_warp_available(shape) -> bool:
    """Any shape >= 32x32 on a non-CPU backend (padding handles the rest);
    smaller pyramid levels stay on the XLA gather, where they are cheap."""
    h, w = shape
    if jax.default_backend() == "cpu" and not interpret_mode():
        return False
    return h >= 32 and w >= 32


def make_pallas_warp(shape, max_disp_v: int = DV, field_shape=None,
                     pad_to=None, crop=True):
    """Warp sampler with the warp_bilinear_dense signature, or None.

    Displacement magnitude is unbounded (data-driven window origins);
    ``max_disp_v`` sets the per-block row-spread slack.  ``field_shape``
    optionally gives a larger source-frame shape (halo-padded shard
    blocks); positions must then be pre-shifted into the field frame, and
    the returned boundary flags refer to the FIELD edges (sharded callers
    compute their own global flags).

    ``pad_to`` forces the padded grid dims (must be multiples of the block
    dims) so the fused-assembly path can share one padded geometry with the
    assemble and SOR kernels; ``crop=False`` returns the full (k, hp, wp)
    padded planes (padded pixels are don't-cares).  u/v may then be passed
    already padded to (hp, wp) with zeros (the internal pad becomes a
    no-op), which is exactly what the fused solver loop maintains.
    """
    h, w = shape
    if not pallas_warp_available(shape):
        return None
    fh, fw = shape if field_shape is None else field_shape
    dv = _round_dv(int(max_disp_v))
    bh = _pick_bh(h, dv)
    if pad_to is None:
        hp = -(-h // bh) * bh
        wp = -(-w // BW) * BW
    else:
        hp, wp = pad_to
        assert hp % bh == 0 and wp % BW == 0, (hp, wp, bh)

    def warp(fields, u, v):
        k = fields.shape[0]
        return _build(k, h, w, dv, bh, hp, wp, fh, fw, crop)(fields, u, v)

    warp.pad = lambda fields: _build(
        fields.shape[0], h, w, dv, bh, hp, wp, fh, fw, crop).pad(fields)
    return warp

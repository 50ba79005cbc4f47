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
    three aligned 128-lane thirds of the window, selected by index;
  * row sampling is a select over the window's row slices; the host also
    prefetches each block's [d_lo, d_hi] slice range and the kernel skips
    whole 8-row chunks outside it (`lax.cond` lowers to a real branch in
    Mosaic), so smooth flow touches only the 2-4 live row slices;
  * column interpolation is folded in per row slice (p1*g1 + p2*g2 --
    elementwise-identical to blending after selection).

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
    # samples a larger frame, e.g. a halo-padded shard block)
    rb = pl.program_id(0)
    cb = pl.program_id(1)
    two = jnp.int32(2)
    lin = rb * gw + cb
    cur = jax.lax.rem(lin, two)
    nxt = jax.lax.rem(lin + 1, two)

    def start_dma(buf, blk):
        """Issue the three window DMAs for linear block ``blk`` into
        double-buffer slot ``buf`` (data-driven origins from the prefetched
        per-block stats)."""
        bi = blk // gw
        bj = jax.lax.rem(blk, jnp.int32(gw))
        s_row = pl.multiple_of(srow_ref[bi, bj], 8)
        s_col = pl.multiple_of(scol_ref[bi, bj], 128)
        pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(s_row, src_h), pl.ds(s_col, SRC_W)],
            src2.at[buf], sem.at[buf]).start()
        # edge rows 0 / fh-1 for boundary-clamped pixels: row-clamped
        # samples read exactly one of these two rows.  The host replicates
        # them 8x into the top padding band (padded rows [0, 8) / [8, 16))
        # so the DMA moves whole 8-row tiles.
        pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(0, 8), pl.ds(s_col, SRC_W)],
            er_lo2.at[buf], sem_lo.at[buf]).start()
        pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(8, 8), pl.ds(s_col, SRC_W)],
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
    ci = jnp.clip(iv1 + CPAD - s_col, 0, SRC_W - 2)
    d2 = jnp.clip(jv1 + bh - s_row - lj, 0, 2 * dv)

    # wait for THIS block's window (issued by the previous grid step)
    pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(s_row, src_h), pl.ds(s_col, SRC_W)],
        src2.at[cur], sem.at[cur]).wait()
    pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(0, 8), pl.ds(s_col, SRC_W)],
        er_lo2.at[cur], sem_lo.at[cur]).wait()
    pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(8, 8), pl.ds(s_col, SRC_W)],
        er_hi2.at[cur], sem_hi.at[cur]).wait()

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

    # Dynamic sublane offsets must be 8-aligned: iterate 8-aligned chunks of
    # the row window via a fori_loop over the block's live chunk range (one
    # compiled chunk body, dynamic trip count), and apply the 8 sub-shifts
    # as static slices of the loaded chunk, each row individually guarded by
    # the block's true [d_lo, d_hi + 1] slice range (host-prefetched):
    # smooth-flow blocks process only the couple of row slices they need.
    zero = jnp.zeros((bh, BW), jnp.float32)
    d_lo = dlo_ref[rb, cb]
    d_hi = dhi_ref[rb, cb]

    def row_body(q, r, acc):
        d = q * 8 + r
        m_top = d2 == d      # this slice is row jv1 for these pixels
        m_bot = d2 == d - 1  # and row jv1+1 for these
        out = []
        for c in range(k):
            f_top, f_bot = acc[2 * c], acc[2 * c + 1]
            blk = src[c, pl.ds(pl.multiple_of(q * 8, 8), bh + 8),
                      pl.ds(0, 128 * nthirds)]
            rows = jax.lax.slice_in_dim(blk, r, r + bh, axis=0)
            g1 = lane_gather(rows, idx0)
            g2 = lane_gather(rows, idx1)
            cb_ = p1 * g1 + p2 * g2            # column interpolation
            out.append(jnp.where(m_top, cb_, f_top))
            out.append(jnp.where(m_bot, cb_, f_bot))
        return out

    def chunk(q, acc):
        for r in range(8):
            d = q * 8 + r
            acc = jax.lax.cond(
                (d >= d_lo) & (d <= d_hi + 1),
                lambda a, r=r: row_body(q, r, a),
                lambda a: a,
                acc)
        return acc

    acc = [zero] * (2 * k)
    q_lo = d_lo // 8
    q_hi = (d_hi + 1) // 8 + 1
    acc = jax.lax.fori_loop(q_lo, q_hi, chunk, acc)
    for c in range(k):
        o_ref[c] = p3 * acc[2 * c] + p4 * acc[2 * c + 1]

    # boundary-clamped rows: py < 0 samples row 0 with weight 1 (p4 == 0);
    # py >= h samples row h-1 (p3 == 0).  These pixels are excluded from the
    # window stats (their jv1 does not follow the block's lj pattern), so
    # their values come from the edge-row slices instead.  Skipped entirely
    # for interior blocks (the common case).
    @pl.when(eflag_ref[rb, cb] != 0)
    def _edges():
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
def _build(k, h, w, dv, bh, hp, wp, fh=None, fw=None):
    """Kernel with OUTPUT true dims (h, w), grid over padded dims (hp, wp),
    sampling a field of true dims (fh, fw) -- equal to (h, w) unless the
    caller samples a larger frame (a halo-padded shard block), in which
    case positions are expected pre-shifted into the field frame."""
    fh = h if fh is None else fh
    fw = w if fw is None else fw
    src_h = bh + 2 * dv + 2
    gh, gw = hp // bh, wp // BW
    # padded-array extents: rows get a bh top halo (so a window can start
    # anywhere the clamp allows) and bottom slack; cols similarly
    rows_p = max(hp, fh) + 2 * bh + 2 * dv + 2
    cols_p = -(-(max(wp, fw) + CPAD) // 128) * 128 + SRC_W
    def mkcall(nthirds):
        kern = functools.partial(_kernel, k=k, h=fh, w=fw, bh=bh, dv=dv,
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
                    pltpu.VMEM((2, k, src_h, SRC_W), jnp.float32),
                    pltpu.VMEM((2, k, 8, SRC_W), jnp.float32),
                    pltpu.VMEM((2, k, 8, SRC_W), jnp.float32),
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

    # two-thirds variant for the common small-u-spread case (the per-CALL
    # dispatch below avoids the in-kernel per-block branch that measured
    # 1.6x slower); the 3-third variant is the general fallback
    call2 = mkcall(2)
    call3 = mkcall(3)

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
        jv1, iv1, up, vp = _sample_indices(u, v, fh, fw, hp, wp)
        # per-block window origins from the minimum TRUE-region sample index
        # (8-aligned rows / 128-aligned cols): the full 2*dv - 7 row slack is
        # available to the spread above the min
        r_min, r_max, c_min, c_max, eflag = _block_stats(
            jv1, iv1, vp, h, w, hp, wp, bh, fh)
        s_row = jnp.clip(r_min // 8 * 8, 0, rows_p - src_h).astype(jnp.int32)
        d_lo = jnp.clip(r_min - s_row, 0, 2 * dv).astype(jnp.int32)
        d_hi = jnp.clip(r_max - s_row, 0, 2 * dv).astype(jnp.int32)
        s_col = jnp.clip(c_min // 128 * 128,
                         0, cols_p - SRC_W).astype(jnp.int32)
        # third 128-lane window third is touched only when some block's
        # column index reaches lane 255 (idx1 = ci + 1 >= 256); dispatch
        # the cheaper 2-third kernel when no block can
        need3 = jnp.any(c_max - s_col >= 255)
        ops = (s_row, s_col, d_lo, d_hi, eflag, padded, up, vp)
        s, bx, by = jax.lax.cond(
            need3, lambda o: call3(*o), lambda o: call2(*o), ops)
        return s[:, :h, :w], bx[:h, :w], by[:h, :w]

    run.pad = pad
    return run


def _round_dv(dv: int) -> int:
    # VMEM slices must be 8-aligned along sublanes: pick dv with 2*dv + 2 a
    # multiple of 8.  dv = 3 (mod 8) additionally keeps a centred window's
    # zero-spread rows inside ONE 8-row chunk.
    return dv + ((3 - dv) % 8)


def _pick_bh(h: int, dv: int) -> int:
    """Block height.  The kernel is LANE-GATHER bound, and each live row
    slice gathers the full (bh, 128) block for every pixel before masking:
    total gather work ~ sum over blocks of (per-block row spread + 2) * bh,
    so SMALLER blocks win (the spread shrinks with the block) despite the
    higher window-DMA overhead ceil(h/bh)*(bh + 2dv + 2).  Measured at
    5424^2 (bench-like flow): bh 256/128/64/32/16 -> 53.9/48.9/41.8/39.6/
    41.4 ms -- 32 is the sweet spot (PROFILE_r03.md)."""
    return 32


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


def make_pallas_warp(shape, max_disp_v: int = DV, field_shape=None):
    """Warp sampler with the warp_bilinear_dense signature, or None.

    Displacement magnitude is unbounded (data-driven window origins);
    ``max_disp_v`` sets the per-block row-spread slack.  ``field_shape``
    optionally gives a larger source-frame shape (halo-padded shard
    blocks); positions must then be pre-shifted into the field frame, and
    the returned boundary flags refer to the FIELD edges (sharded callers
    compute their own global flags).
    """
    h, w = shape
    if not pallas_warp_available(shape):
        return None
    fh, fw = shape if field_shape is None else field_shape
    dv = _round_dv(int(max_disp_v))
    bh = _pick_bh(h, dv)
    hp = -(-h // bh) * bh
    wp = -(-w // BW) * BW

    def warp(fields, u, v):
        k = fields.shape[0]
        return _build(k, h, w, dv, bh, hp, wp, fh, fw)(fields, u, v)

    warp.pad = lambda fields: _build(
        fields.shape[0], h, w, dv, bh, hp, wp, fh, fw).pad(fields)
    return warp

"""Pallas TPU kernel for the flow-dependent bilinear warp gather.

This is the solver's hot op: every assembly pass samples the six
image/gradient fields at (i + u, j + v) per pixel (reference: the in-loop
bilinear lookups at oct_variational_optical_flow.cu:732-766).  XLA lowers the
arbitrary 2-D gather to scalar loads (~2 ns/element), which dominates the
whole solve; this kernel restructures it for the VPU:

  * the fields are pre-padded by (DV rows, PAD cols) so every grid block can
    DMA an aligned source window (K, BH + 2*DV + 2, 256) into VMEM;
  * column sampling is a hardware lane gather (``dynamic_gather`` via
    take_along_axis); the gathered dimension must fit one 128-lane vreg, so
    the 256-wide window is gathered as two aligned halves selected by index;
  * row sampling is a select over the bounded window of row slices
    d in [-DV, DV+1], each a VMEM slice of the source window.

Row adaptivity is two-level and data-driven: the host prefetches each grid
block's min/max integer row displacement, the kernel skips whole 8-row
chunks outside that range (`lax.cond` lowers to a real branch in Mosaic)
and, inside a live chunk, skips each row slice individually.  A smooth flow
field therefore touches only the 2-4 row slices it actually needs instead
of the full 2*DV+2 window; DV only bounds the *reach*, it no longer sets
the per-pixel work.  Column interpolation is folded in per row slice
(p1*g1 + p2*g2 -- elementwise-identical to blending after selection), so
each live (field, row) pair costs two lane gathers plus three multiply-adds
and two selects.

Displacements are clamped to the window reach (|u| <= PAD-2 = 62,
|v| <= DV), exact whenever the per-level flow stays inside the bounds --
the same documented approximation as the sharded halo warp.  Boundary flags
and interpolation weights replicate the reference exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SRC_W = 256          # source window width (two 128-lane vregs)
PAD = 64             # horizontal halo; max |u| = PAD - 2
BW = SRC_W - 2 * PAD  # output block width (= 128, one vreg of lanes)


def _kernel(dlo_ref, dhi_ref, f_hbm, u_ref, v_ref, o_ref, bx_ref, by_ref,
            src, sem, *, k, h, w, bh, dv, src_h):
    rb = pl.program_id(0)
    cb = pl.program_id(1)

    # padded-array window: rows [rb*bh, rb*bh + src_h), cols [cb*BW, +256)
    cp = pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(rb * bh, src_h), pl.ds(cb * BW, SRC_W)],
        src, sem)
    cp.start()

    u = u_ref[:]
    v = v_ref[:]
    lj = jax.lax.broadcasted_iota(jnp.int32, (bh, BW), 0)
    jj = (rb * bh + lj).astype(jnp.float32)
    ii = (cb * BW + jax.lax.broadcasted_iota(jnp.int32, (bh, BW), 1)
          ).astype(jnp.float32)
    # true positions for the boundary flags (ref :732-735)
    px_t = ii + u
    py_t = jj + v
    bx_ref[:] = (px_t < 0.0) | (px_t >= w)
    by_ref[:] = (py_t < 0.0) | (py_t >= h)
    # window-clamped displacements, then the reference's conditional clamp
    reach = float(PAD - 2)
    px = ii + jnp.clip(u, -reach, reach)
    py = jj + jnp.clip(v, -float(dv), float(dv))
    px = jnp.where(px < 0.0, 0.0, jnp.where(px >= w, float(w - 1), px))
    py = jnp.where(py < 0.0, 0.0, jnp.where(py >= h, float(h - 1), py))
    iv1 = jnp.minimum(px.astype(jnp.int32), w - 2)
    jv1 = jnp.minimum(py.astype(jnp.int32), h - 2)
    p1 = (iv1 + 1).astype(jnp.float32) - px
    p2 = px - iv1.astype(jnp.float32)
    p3 = (jv1 + 1).astype(jnp.float32) - py
    p4 = py - jv1.astype(jnp.float32)

    # local coordinates inside the padded window
    ci = iv1 + PAD - cb * BW                   # [2, 253]
    d2 = jv1 + dv - rb * bh - lj               # slice index offset, [0, 2*dv]

    cp.wait()

    # two aligned half-window lane gathers selected by index half
    lo0 = jnp.clip(ci, 0, 127)
    hi0 = jnp.clip(ci - 128, 0, 127)
    sel0 = ci < 128
    cip = ci + 1
    lo1 = jnp.clip(cip, 0, 127)
    hi1 = jnp.clip(cip - 128, 0, 127)
    sel1 = cip < 128

    # Dynamic sublane offsets must be 8-aligned: iterate 8-aligned chunks of
    # the row window via a fori_loop over the block's live chunk range (one
    # compiled chunk body, dynamic trip count), and apply the 8 sub-shifts
    # as static slices of the loaded chunk, each row individually guarded by
    # the block's true [d_lo, d_hi + 1] row-displacement range
    # (host-prefetched): smooth-flow blocks process only the couple of row
    # slices they actually need.
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
            blk = src[c, pl.ds(pl.multiple_of(q * 8, 8), bh + 8), :]
            rows = jax.lax.slice_in_dim(blk, r, r + bh, axis=0)
            r0 = rows[:, :128]
            r1 = rows[:, 128:]
            g1 = jnp.where(sel0, jnp.take_along_axis(r0, lo0, axis=1),
                           jnp.take_along_axis(r1, hi0, axis=1))
            g2 = jnp.where(sel1, jnp.take_along_axis(r0, lo1, axis=1),
                           jnp.take_along_axis(r1, hi1, axis=1))
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


@functools.lru_cache(maxsize=None)
def _build(k, h, w, dv, bh):
    # VMEM slices must be 8-aligned along sublanes: pick dv with
    # 2*dv + 2 a multiple of 8.  dv = 3 (mod 8) additionally keeps the
    # zero-displacement rows (d = dv, dv+1) inside ONE 8-row chunk, which
    # halves the chunk count for near-translational flow.
    dv = dv + ((3 - dv) % 8)
    src_h = bh + 2 * dv + 2
    gh, gw = h // bh, w // BW
    kern = functools.partial(_kernel, k=k, h=h, w=w, bh=bh, dv=dv, src_h=src_h)
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(gh, gw),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),       # padded fields, HBM
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
                pltpu.VMEM((k, src_h, SRC_W), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.bool_),
            jax.ShapeDtypeStruct((h, w), jnp.bool_),
        ),
    )

    pad_rows = (dv, src_h - bh - dv)

    def pad(fields):
        """Pre-pad the sample stack (hoistable: it is loop-invariant)."""
        return jnp.pad(fields, ((0, 0), pad_rows, (PAD, PAD)))

    def run(fields, u, v):
        # accept either a raw (k, h, w) stack or one already padded
        padded = fields if fields.shape[-1] == w + 2 * PAD else pad(fields)
        # per-block row-displacement bounds (mirrors the kernel's jv1
        # computation exactly)
        jj = jnp.arange(h, dtype=jnp.float32)[:, None]
        py = jj + jnp.clip(v, -float(dv), float(dv))
        py = jnp.where(py < 0.0, 0.0, jnp.where(py >= h, float(h - 1), py))
        jv1 = jnp.minimum(py.astype(jnp.int32), h - 2)
        d2 = jv1 - jj.astype(jnp.int32) + dv
        d2b = d2.reshape(gh, bh, gw, BW)
        d_lo = jnp.min(d2b, axis=(1, 3)).astype(jnp.int32)
        d_hi = jnp.max(d2b, axis=(1, 3)).astype(jnp.int32)
        return call(d_lo, d_hi, padded, u, v)

    run.pad = pad
    return run


def _pick_bh(h):
    for bh in (256, 128, 64, 32):
        if h % bh == 0:
            return bh
    return None


def pallas_warp_available(shape) -> bool:
    """The kernel needs block-divisible shapes and a non-CPU backend."""
    h, w = shape
    if jax.default_backend() == "cpu":
        return False
    if w % BW != 0 or w < SRC_W:
        return False
    return _pick_bh(h) is not None


def make_pallas_warp(shape, max_disp_v: int = 30):
    """Warp sampler with the warp_bilinear_dense signature, or None."""
    h, w = shape
    if not pallas_warp_available(shape):
        return None
    bh = _pick_bh(h)

    def warp(fields, u, v):
        k = fields.shape[0]
        return _build(k, h, w, int(max_disp_v), bh)(fields, u, v)

    warp.pad = lambda fields: _build(
        fields.shape[0], h, w, int(max_disp_v), bh).pad(fields)
    return warp

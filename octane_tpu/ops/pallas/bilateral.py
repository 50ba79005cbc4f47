"""Pallas TPU kernel for the SRSAL cross-bilateral flow smoother.

The 37x37 bilateral window (oct_srsal_cuda.cu:34-71) is ~1369 exp+FMA taps
per pixel: XLA's `fori_loop` of dynamic slices streams every tap through HBM
(several full-field reads/writes per tap), which is hopelessly
bandwidth-bound on large sectors.  This kernel keeps each (BH, 128) output
tile's (u, v, cth) working set resident in VMEM, so the op runs at the VPU's
transcendental rate instead:

  * grid (gh, gw, nchunks): the third axis walks the window row offsets in
    8-offset chunks (DMA row origins must be 8-aligned on tiled memrefs);
    each step DMAs one (3, BH+8, 384) field window and processes its 8 row
    offsets with STATIC sublane slices;
  * chunks are visited center-chunk-first (q = (step + p//8) mod nchunks),
    so the centre cth tile is a static slice of step 0's window, stashed in
    scratch and reused as the range reference by every later step;
  * the 2p+1 column taps are STATIC 128-lane slices of the 384-wide window
    (Mosaic relayouts handle the unaligned offsets);
  * tail offsets beyond 2p (the last chunk is ragged) are weight-zeroed;
  * partial sums (num_u, num_v, denom) accumulate in VMEM scratch across
    the chunks of one tile; the final chunk divides and writes the tile.

Boundary handling is the reference's mixed-reflect pad, applied on the host
once (post.srsal._reflect_pad); the kernel sees only interior reads.
Accumulation runs row-outer/column-inner starting at the centre chunk (the
reference runs column-outer), so results match the XLA path to float
round-off (~1e-6 relative), not bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BW = 128
SRC_W = 384
CPADL = 128          # left column padding of the host-padded stack


def _kernel(gk_ref, fields_hbm, o_ref, num_u, num_v, den, c0_ref, src, sem,
            *, bh, p, gk, sigpix2, nchunks):
    rb = pl.program_id(0)
    cb = pl.program_id(1)
    qi = pl.program_id(2)
    nsteps = 2 * p + 1
    q = lax.rem(qi + p // 8, nchunks)     # centre chunk first

    cp = pltpu.make_async_copy(
        fields_hbm.at[:, pl.ds(pl.multiple_of(rb * bh + q * 8, 8), bh + 8),
                      pl.ds(cb * BW, SRC_W)],
        src, sem)
    cp.start()

    @pl.when(qi == 0)
    def _init():
        num_u[:] = jnp.zeros((bh, BW), jnp.float32)
        num_v[:] = jnp.zeros((bh, BW), jnp.float32)
        den[:] = jnp.zeros((bh, BW), jnp.float32)

    cp.wait()

    @pl.when(qi == 0)
    def _stash_centre():
        # step 0 is the centre chunk: offset l == p sits at static row p % 8
        c0_ref[:] = src[2, p % 8:p % 8 + bh, CPADL:CPADL + BW]

    c0 = c0_ref[:]
    # accumulators round-trip through scratch after every row offset, and
    # the column taps walk a SEQUENTIAL roll chain (always reading the
    # aligned first 128 lanes): 37 independent unaligned lane slices make
    # Mosaic materialize 37 relayouts at once and spill far past the VMEM
    # budget, while the chain keeps only 3 live windows
    for r in range(8):
        l = q * 8 + r
        live = l < nsteps                 # ragged tail taps are zero-weight
        gkl = jnp.where(live, gk_ref[jnp.minimum(l, nsteps - 1)], 0.0)
        wu = jnp.roll(src[0, r:r + bh, :], p - CPADL, axis=1)
        wv = jnp.roll(src[1, r:r + bh, :], p - CPADL, axis=1)
        wc = jnp.roll(src[2, r:r + bh, :], p - CPADL, axis=1)
        acc_u = num_u[:]
        acc_v = num_v[:]
        acc_d = den[:]
        for k in range(2 * p + 1):
            dmc = wc[:, :BW] - c0
            a1 = (float(gk[k]) * gkl) * jnp.exp(dmc * dmc * sigpix2)
            acc_u = acc_u + wu[:, :BW] * a1
            acc_v = acc_v + wv[:, :BW] * a1
            acc_d = acc_d + a1
            if k < 2 * p:
                wu = jnp.roll(wu, -1, axis=1)
                wv = jnp.roll(wv, -1, axis=1)
                wc = jnp.roll(wc, -1, axis=1)
        num_u[:] = acc_u
        num_v[:] = acc_v
        den[:] = acc_d

    @pl.when(qi == nchunks - 1)
    def _finish():
        o_ref[0] = num_u[:] / den[:]
        o_ref[1] = num_v[:] / den[:]


@functools.lru_cache(maxsize=None)
def _build(h, w, p, gk, sigpix2, bh):
    hp = -(-h // bh) * bh
    wp = -(-w // BW) * BW
    gh, gw = hp // bh, wp // BW
    nchunks = -(-(2 * p + 1) // 8)
    rows_p = hp + 8 * nchunks + 8         # window end: hp - bh + (nchunks-1)*8 + bh + 8
    cols_p = wp + CPADL + SRC_W

    kern = functools.partial(_kernel, bh=bh, p=p, gk=gk, sigpix2=sigpix2,
                             nchunks=nchunks)
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gh, gw, nchunks),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((2, bh, BW), lambda r, c, l, *_: (0, r, c),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((bh, BW), jnp.float32),
                pltpu.VMEM((bh, BW), jnp.float32),
                pltpu.VMEM((bh, BW), jnp.float32),
                pltpu.VMEM((bh, BW), jnp.float32),
                pltpu.VMEM((3, bh + 8, SRC_W), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((2, hp, wp), jnp.float32),
    )

    def run(u, v, cth):
        from octane_tpu.post.srsal import _reflect_pad

        def pad_field(a):
            ap = _reflect_pad(jnp.asarray(a, jnp.float32), p)  # (h+2p, w+2p)
            return jnp.pad(
                ap, ((0, rows_p - (h + 2 * p)),
                     (CPADL - p, cols_p - (w + 2 * p) - (CPADL - p))))

        stack = jnp.stack([pad_field(u), pad_field(v), pad_field(cth)])
        out = call(jnp.asarray(gk, jnp.float32), stack)
        return out[0, :h, :w], out[1, :h, :w]

    return run


def pallas_bilateral_available(shape) -> bool:
    h, w = shape
    if jax.default_backend() == "cpu":
        return False
    return h >= 64 and w >= 64


def make_pallas_bilateral(shape, filtsigma: float = 9.0,
                          sigpix: float = 20.0):
    """Bilateral smoother with the srsal_smooth signature, or None.

    Tap weights and boundary handling replicate oct_srsal_cuda exactly; see
    module docstring for the (float-level) accumulation-order caveat.
    """
    from octane_tpu.core.gaussian import gaussian_kernel_1d

    h, w = shape
    if not pallas_bilateral_available(shape):
        return None
    p = int(2 * filtsigma)
    gk = tuple(float(x) for x in gaussian_kernel_1d(filtsigma, p))
    sigpix2 = -1.0 / (2.0 * sigpix * sigpix)
    bh = 128 if h >= 128 else max(8, h // 8 * 8)
    return _build(h, w, p, gk, sigpix2, bh)

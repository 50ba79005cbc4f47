"""Multi-sweep red-black SOR Pallas kernel for the coupled stencil system.

Exact PCG (ops.pallas.cg) is HBM-bound at ~29.75 plane-reads per iteration
and was measured within 1.15x of its bandwidth floor (PROFILE_r03.md), so
the only way to a materially faster solve is an iteration that moves fewer
bytes.  Red-black SOR is that iteration -- BASELINE.json's north star
anticipates exactly this ("distributed red-black SOR / Jacobi sweep") --
because consecutive sweeps can be TEMPORALLY BLOCKED: this kernel runs S
full red+black sweeps per HBM streaming pass, so the coefficient planes
(a1, a4, a2, rhs, rdet, and the four robust off-diagonals) are read once
per S sweeps instead of once per sweep:

    planes/sweep = (nc + 2 in + 2 out)/S  ~=  14/S  (robust, nc=10 incl.
    the hoisted rdet plane), 10/S (quad, nc=6)

vs. the fused PCG's 29.75 planes per iteration.

The blocking is EXACT, not approximate: each grid band loads ``HO = 2*S``
overlap rows on each side and discards them on output.  A full red+black
sweep is valid on a region that shrinks by 2 rows per side per sweep (red
at row j needs black at rows j-1..j+1; black at row j then needs red at
rows j-1..j+1), so after S sweeps the retained ``bh`` body rows carry the
bit-true global sweep result; bands are therefore fully independent (no
wavefront), which is also what makes the scheme shard (the sharded driver
can ppermute 2S-row ghost strips once per pass instead of 1-row halos
every colour half-sweep).

**Colour packing (round 4).**  The round-3 kernel computed every colour
update DENSE and masked -- half the VPU lanes discarded per half-sweep --
and was measured pure-compute-bound (~10x its BW floor).  Here each pass
deinterleaves the streamed planes into DENSE half-width red/black planes
(packed column p of colour c at row j holds original column
``i = 2p + ((j + c) % 2)``) with in-VMEM lane gathers, runs the S sweeps
on the packed planes, and re-interleaves the body rows on output.  Under
this layout a cell's north/south neighbours (the other colour) sit at the
SAME packed column and west/east become row-parity-selected unit shifts of
the other colour's plane, so each half-sweep runs the same update
arithmetic on half-width planes with zero masked-lane waste.  The
(de)interleave costs ~2 gather-elements per element once per PASS --
amortized over S sweeps -- while keeping the kernel's external interface
and HBM layout plain unpacked planes (XLA-side strided repacking was
measured 34 ms/solve at 5424^2, dwarfing the sweeps; in-kernel it is
~1.6 ms/pass).  Packing permutes lanes; every update consumes the exact
same operands as the dense sweep, in the same written order.

**Exactness contract (round 5).**  Two tiers, after an investigation that
showed the stronger claim is unobtainable:

* SAME-EXECUTABLE invariance, asserted bitwise
  (tests/test_sor_kernel.py): the dynamic sweep count means one compiled
  kernel serves every pass, so temporal blocking, band decomposition,
  pass hand-off (unpack -> HBM -> repack) and the conditional remainder
  pass are bit-exact BY CONSTRUCTION -- run(x, a+b) == run(run(x, a), b)
  for any split, and the result is independent of the band layout.
* CROSS-PROGRAM agreement with the XLA sweep (flow.cg.sor_solve),
  asserted to a few ulps per sweep: true bitwise equality between
  SEPARATELY COMPILED programs is not an achievable contract on XLA --
  ``optimization_barrier`` is deleted late in the pipeline (the optimized
  HLO of both the CPU and TPU backends contains zero ``opt-barrier``
  ops), so codegen-level FMA contraction varies with the surrounding
  program (measured: identical sweep arithmetic compiled at different
  unroll depths diverged at ~1 ulp/sweep; no XLA flag --
  xla_allow_excess_precision, xla_cpu_enable_fast_math -- restores it).
  The observed drift is ~1e-7 relative per sweep and does not accumulate
  (the SOR contraction damps it); product-level parity is covered by the
  golden fixtures and PARITY.md.  tools/tpu_checks.py check_sor reports
  the on-chip kernel-vs-twin delta every round (historically exactly 0 on
  Mosaic-vs-XLA:TPU -- an empirical observation, not a contract).

Update math matches flow.cg.sor_solve exactly: per colour, the residual
r = b - A x under the mirror-at-1 boundary (oct_variational_optical_flow.cu:
629-652, as core.bc.mirror_shift), then the exact 2x2 block solve
(a1 a2; a2 a4) and an omega-damped update.  The sweep loop is a dynamic
``fori_loop`` whose trip count arrives in the scalar-prefetch vector, so
ONE kernel build serves the 8-sweep main passes and any remainder pass and
every sweep executes the same compiled arithmetic (see ``_kernel``).  The
stopping rule evaluates the FULL-GRID pre-update residual ||b - A x||^2 of
the pass's incoming iterate -- the same quantity flow.cg.sor_solve tests
-- once per PASS (every S sweeps) rather than every sweep; with the
reference's 1e-8 absolute tolerance (oct_variational_optical_flow.cu:1353)
the check never binds at product scales, and when it does bind the kernel
stops within S sweeps of the XLA path and skips the remainder pass
entirely.  Padding rows/cols (band alignment, lane-group alignment to 256,
and the sharded path's mesh-divisibility padding) are decoupled identity
equations and contribute exactly zero residual, mirroring
flow.stencil._mask_padded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _deinterleave(x):
    """(M, R, W) -> even, odd (M, R, W/2): split lanes by parity with
    per-128-lane-group hardware gathers (W a multiple of 256)."""
    m, r, w = x.shape
    g = w // 256
    p = lax.broadcasted_iota(jnp.int32, (r, 128), 1)
    lo = p < 64
    ia = jnp.where(lo, 2 * p, 0)
    ib = jnp.where(lo, 0, 2 * p - 128)
    iap = jnp.where(lo, 2 * p + 1, 0)
    ibp = jnp.where(lo, 0, 2 * p - 127)
    ev, od = [], []
    for c in range(m):
        evg, odg = [], []
        for k in range(g):
            a = x[c, :, 256 * k:256 * k + 128]
            b = x[c, :, 256 * k + 128:256 * k + 256]
            evg.append(jnp.where(lo, jnp.take_along_axis(a, ia, axis=1),
                                 jnp.take_along_axis(b, ib, axis=1)))
            odg.append(jnp.where(lo, jnp.take_along_axis(a, iap, axis=1),
                                 jnp.take_along_axis(b, ibp, axis=1)))
        ev.append(jnp.concatenate(evg, axis=1))
        od.append(jnp.concatenate(odg, axis=1))
    return jnp.stack(ev), jnp.stack(od)


def _interleave(ev, od):
    """Inverse of _deinterleave: even, odd (M, R, WH) -> (M, R, 2*WH)."""
    m, r, wh = ev.shape
    g = wh // 128
    q = lax.broadcasted_iota(jnp.int32, (r, 128), 1)
    q_even = (q % 2) == 0
    h0 = q // 2                                       # [0, 63]
    h1 = h0 + 64                                      # [64, 127]
    out = []
    for c in range(m):
        grps = []
        for k in range(g):
            e = ev[c, :, 128 * k:128 * k + 128]
            o = od[c, :, 128 * k:128 * k + 128]
            grps.append(jnp.where(q_even,
                                  jnp.take_along_axis(e, h0, axis=1),
                                  jnp.take_along_axis(o, h0, axis=1)))
            grps.append(jnp.where(q_even,
                                  jnp.take_along_axis(e, h1, axis=1),
                                  jnp.take_along_axis(o, h1, axis=1)))
        out.append(jnp.concatenate(grps, axis=1))
    return jnp.stack(out)


def _pack(x, jodd):
    """(M, R, W) -> red, black (M, R, W/2) in the row-parity packing
    ``packed[c][m, j, p] = x[m, j, 2p + ((j + c) % 2)]``."""
    ev, od = _deinterleave(x)
    red = jnp.where(jodd, od, ev)
    black = jnp.where(jodd, ev, od)
    return red, black


def _unpack(red, black, jodd):
    ev = jnp.where(jodd, black, red)
    od = jnp.where(jodd, red, black)
    return _interleave(ev, od)


def _colour_residual(xc, xo, cf, grow, par, pcol, padpix, *, colour,
                     quad, true_h, true_w):
    """Pre-update residual r = b - A x of colour ``colour``'s rows (frame
    ``xc``, (2, R, WH)) at the current iterate, with the other colour's
    frame ``xo`` supplying the off-diagonal neighbours.

    ``cf`` is this colour's coefficient frame [a1, a4, a2, bu, bv(, a5, a6,
    a7, a8)].  ``par`` is the global row parity (1, R, 1); ``pcol`` the
    packed column index (1, 1, WH); ``padpix`` marks cells outside the true
    grid.  Neighbour geometry under the packing: north/south = row-rolls of
    ``xo`` at the SAME packed column; west/east = parity-selected unit
    column shifts of ``xo`` (this colour's cell i = 2p + ipar has west at
    other-colour packed column p + ipar - 1 and east at p + ipar).
    Same residual math and operand order as flow.cg.sor_solve's sweep.
    """
    a1 = cf[0:1]
    a4 = cf[1:2]
    a2 = cf[2:3]
    bu = cf[3:4]
    bv = cf[4:5]

    ipar = (par + colour) % 2            # i = 2p + ipar
    gcol = 2 * pcol + ipar

    nr = jnp.roll(xo, 1, axis=1)          # row j <- row j-1 (north)
    sr = jnp.roll(xo, -1, axis=1)         # row j <- row j+1 (south)
    # mirror-at-1 at the TRUE grid edges (garbage wraparound rows live only
    # in the discarded overlap margin)
    nn = jnp.where(grow == 0, sr, nr)
    ss = jnp.where(grow == true_h - 1, nr, sr)

    west_shift = jnp.roll(xo, 1, axis=2)      # q = p - 1
    east_shift = jnp.roll(xo, -1, axis=2)     # q = p + 1
    ipar_b = ipar == 1
    wv = jnp.where(ipar_b, xo, west_shift)
    ev = jnp.where(ipar_b, east_shift, xo)
    # column mirrors at the TRUE edges: west of i=0 := x[i=1] (other colour
    # q=0); east of i=true_w-1 := x[i=true_w-2] (other colour, static q)
    qe = (true_w - 2 - (true_w % 2)) // 2
    wv = jnp.where(gcol == 0, xo[:, :, 0:1], wv)
    ev = jnp.where(gcol == true_w - 1, xo[:, :, qe:qe + 1], ev)

    if quad:
        # scalar -1 off-diagonals (quadratic GNC step); padded pixels stay
        # decoupled identity rows
        off_u = jnp.where(padpix, 0.0, -(wv[0:1] + ev[0:1] + nn[0:1] + ss[0:1]))
        off_v = jnp.where(padpix, 0.0, -(wv[1:2] + ev[1:2] + nn[1:2] + ss[1:2]))
    else:
        a5 = cf[5:6]
        a6 = cf[6:7]
        a7 = cf[7:8]
        a8 = cf[8:9]
        off_u = a5 * wv[0:1] + a7 * ev[0:1] + a6 * nn[0:1] + a8 * ss[0:1]
        off_v = a5 * wv[1:2] + a7 * ev[1:2] + a6 * nn[1:2] + a8 * ss[1:2]

    ru = bu - (a1 * xc[0:1] + a2 * xc[1:2] + off_u)
    rv = bv - (a2 * xc[0:1] + a4 * xc[1:2] + off_v)
    return ru, rv


def _colour_update(xc, xo, cf, rdet, grow, par, pcol, padpix, *, colour,
                   quad, omega, true_h, true_w):
    """One packed colour half-sweep: update colour ``colour`` from the
    other colour ``xo`` (see ``_colour_residual`` for the frame layout).

    ``rdet`` is the hoisted reciprocal block determinant (flow.cg.sor_rdet,
    shipped as a coefficient plane); the 2x2 block (a1 a2; a2 a4) is solved
    exactly for the residual and applied with omega damping.  Same update
    math as flow.cg.sor_solve's colour sweep, written in the same operand
    order; cross-program agreement is ulp-bounded, not bitwise (see the
    module docstring).
    """
    ru, rv = _colour_residual(xc, xo, cf, grow, par, pcol, padpix,
                              colour=colour, quad=quad,
                              true_h=true_h, true_w=true_w)
    return _apply_colour(xc, ru, rv, cf, rdet, omega)


def _apply_colour(xc, ru, rv, cf, rdet, omega):
    """The 2x2 block solve + omega-damped update on a precomputed
    pre-update residual (the second half of ``_colour_update``; split out
    so the first red half-sweep of a pass can share its residual with the
    stopping-rule evaluation instead of computing it twice)."""
    a1 = cf[0:1]
    a4 = cf[1:2]
    a2 = cf[2:3]
    ndu = (a4 * ru - a2 * rv) * rdet
    ndv = (a1 * rv - a2 * ru) * rdet
    om = jnp.float32(omega)
    return jnp.concatenate([xc[0:1] + om * ndu, xc[1:2] + om * ndv], axis=0)


def _kernel(sc_ref, x_n, x_b, x_s, cf_n, cf_b, cf_s,
            gx_n, gx_s, gcf_n, gcf_s, x_o, res_ref, *,
            bh, ho, w, true_h, true_w, quad, omega, gh):
    """ns red+black sweeps on one band; body rows come out globally exact.

    ``sc_ref`` holds (global row of local row 0, global col of local col 0,
    ns) -- the row/col origins are nonzero on the sharded path, and ``ns``
    is the RUNTIME sweep count of this pass (1 <= ns <= ho // 2).  The
    sweep loop is a dynamic ``fori_loop`` over ONE compiled body rather
    than a Python unroll: a single kernel build serves both the 8-sweep
    main passes and any remainder pass, and -- critically -- every sweep of
    every pass executes the SAME compiled arithmetic, so the iterate path
    cannot drift with the sweep count (an earlier unrolled variant was
    observed to FMA-contract differently at different unroll depths under
    XLA:CPU interpret mode, breaking the bit-exactness contract for
    iteration counts that needed a second kernel build).

    ``gx_*``/``gcf_*`` are ho-row ghost strips replacing the (self-clamped)
    halo blocks at the device-boundary bands; the mesh driver ppermutes
    them from the neighbour devices, and single-device callers pass the
    array's own edge blocks (identical to what the clipped halo index maps
    deliver, so the selects are no-ops).  The FULL-GRID pre-update residual
    ||b - A x||^2 of the pass's incoming iterate over the BODY rows -- red
    rows from the first red half-sweep, black rows from a dedicated
    residual evaluation at the same iterate, exactly the quantity
    flow.cg.sor_solve's stopping rule tests -- is emitted once per pass;
    the extra black evaluation lives in a first-iteration branch that only
    feeds the emitted scalar, so it cannot perturb the iterate path.
    (Bands partition the grid, so the XLA-side sum over bands is the global
    residual; packing drops no cells.)
    """
    rb = pl.program_id(0)
    f32 = jnp.float32
    R = bh + 2 * ho
    wh = w // 2
    ns = sc_ref[2]

    def pick(n_blk, s_blk, gn, gs):
        return (jnp.where(rb == 0, gn[...], n_blk[...]),
                jnp.where(rb == gh - 1, gs[...], s_blk[...]))

    xn, xs = pick(x_n, x_s, gx_n, gx_s)
    cfn, cfs = pick(cf_n, cf_s, gcf_n, gcf_s)
    x = jnp.concatenate([xn, x_b[...], xs], axis=1)
    cf = jnp.concatenate([cfn, cf_b[...], cfs], axis=1)

    g0 = sc_ref[0] + rb * bh - ho
    grow = g0 + lax.broadcasted_iota(jnp.int32, (1, R, 1), 1)
    par = grow % 2
    jodd = par == 1
    pcol = lax.broadcasted_iota(jnp.int32, (1, 1, wh), 2)
    pad_r = (grow >= true_h) | (2 * pcol + par >= true_w)
    pad_b = (grow >= true_h) | (2 * pcol + (1 - par) >= true_w)

    # deinterleave the streamed planes into dense packed halves (amortized
    # over the ns sweeps below)
    xr, xb = _pack(x, jodd)
    cfr, cfb = _pack(cf, jodd)
    # hoisted reciprocal determinant: sweep-invariant, computed ONCE at
    # the XLA level (flow.cg.sor_rdet) and shipped in as the last
    # coefficient plane -- no divisions anywhere in the sweeps
    base = 5 if quad else 9
    rdet_r = cfr[base:base + 1]
    rdet_b = cfb[base:base + 1]

    rkw = dict(quad=quad, true_h=true_h, true_w=true_w)
    kw = dict(omega=omega, **rkw)

    def sweep(i, carry):
        xr, xb, res = carry

        # the red pre-update residual doubles as the red half of the
        # stopping-rule residual on sweep 0 (identical values by
        # definition: both are r = b - A x at the sweep's incoming
        # iterate), so it is computed ONCE and shared between the emitted
        # scalar and the update -- only the black half of the pass
        # residual costs extra work, in a first-iteration branch that
        # feeds nothing but the scalar.
        ru, rv = _colour_residual(xr, xb, cfr, grow, par, pcol, pad_r,
                                  colour=0, **rkw)

        def first_res():
            rub, rvb = _colour_residual(xb, xr, cfb, grow, par, pcol, pad_b,
                                        colour=1, **rkw)
            r2 = (ru * ru + rv * rv)[:, ho:ho + bh]
            r2b = (rub * rub + rvb * rvb)[:, ho:ho + bh]
            return jnp.sum(r2, dtype=f32) + jnp.sum(r2b, dtype=f32)

        res = lax.cond(i == 0, first_res, lambda: res)
        xr = _apply_colour(xr, ru, rv, cfr, rdet_r, omega)
        xb = _colour_update(xb, xr, cfb, rdet_b, grow, par, pcol, pad_b,
                            colour=1, **kw)
        return xr, xb, res

    xr, xb, res = lax.fori_loop(0, ns, sweep, (xr, xb, jnp.float32(0.0)))
    res_ref[rb, 0] = res
    x = _unpack(xr[:, ho:ho + bh], xb[:, ho:ho + bh], jodd[:, ho:ho + bh])
    x_o[:] = x


def _pick_bh(w: int, quad: bool, ho: int) -> int:
    """Largest band height whose double-buffered streams plus the in-kernel
    frame temporaries (x/cf frames, their packed halves and the sweep
    temporaries) fit in VMEM.  Larger bands amortize the 2*ho overlap rows
    (pure redundant compute), so prefer the biggest that fits.  The model
    overestimates (Mosaic reuses buffers): the 140 MB budget is calibrated
    on chip -- at w=5632 the model says 131 MB for bh=64, which compiles
    under the 128 MB vmem limit and runs 9% faster per sweep than bh=32
    (2.42 vs 2.66 ms, r5 probe), while bh=128 (221 MB model) fails to
    compile."""
    nc = 6 if quad else 10
    for bh in (256, 128, 64, 32, 16):
        if bh % ho:
            continue
        frame = bh + 2 * ho
        streams = 2 * ((2 + nc) * frame + 2 * bh)     # double-buffered in+out
        temps = (2 * (2 + nc) + 10) * frame           # frames + packed + swp
        if (streams + temps) * w * 4 <= 140 * 1024 * 1024:
            return bh
    return 16


@functools.lru_cache(maxsize=None)
def _build(h, w, quad, omega, interpret=False,
           true_h=None, true_w=None, ho=16):
    """Build the multi-sweep pass kernel for an (h, w) local block.

    ``h`` must be a multiple of the chosen band height and ``w`` a multiple
    of 256 (the caller pads; lane-group alignment for the in-kernel
    deinterleave); ``true_h``/``true_w`` are the GLOBAL true dims for the
    mirror/identity fixups.  ``ho`` (overlap rows per side, multiple of 8)
    bounds the RUNTIME per-pass sweep count: exactness requires
    ns <= ho // 2 (each red+black sweep consumes 2 overlap rows per side).
    The sweep count itself is passed per call in the scalar-prefetch
    vector, so one build serves every pass length up to that bound.
    """
    assert w % 256 == 0
    true_h = h if true_h is None else true_h
    true_w = w if true_w is None else true_w
    assert ho % 8 == 0 and ho > 0
    bh = _pick_bh(w, quad, ho)
    hp = -(-h // bh) * bh
    gh = hp // bh
    nc = 6 if quad else 10
    f32 = jnp.float32

    def body_spec(k):
        return pl.BlockSpec((k, bh, w), lambda i, *_: (0, i, 0))

    def halo_spec(k, delta):
        nb = hp // ho

        def imap(i, *_):
            j = i * (bh // ho) + (-1 if delta < 0 else bh // ho)
            return (0, jnp.clip(j, 0, nb - 1), 0)

        return pl.BlockSpec((k, ho, w), imap)

    def ghost_spec(k):
        return pl.BlockSpec((k, ho, w), lambda i, *_: (0, 0, 0))

    kern = functools.partial(_kernel, bh=bh, ho=ho, w=w, true_h=true_h,
                             true_w=true_w, quad=quad, omega=float(omega),
                             gh=gh)
    call = pl.pallas_call(
        kern,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gh,),
            in_specs=[
                halo_spec(2, -1), body_spec(2), halo_spec(2, +1),    # x
                halo_spec(nc, -1), body_spec(nc), halo_spec(nc, +1),  # cf
                ghost_spec(2), ghost_spec(2),                   # x ghosts
                ghost_spec(nc), ghost_spec(nc),                 # cf ghosts
            ],
            out_specs=(
                pl.BlockSpec((2, bh, w), lambda i, *_: (0, i, 0)),
                pl.BlockSpec((gh, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, hp, w), f32),
            jax.ShapeDtypeStruct((gh, 1), f32),
        ),
    )

    def call_wrapped(sc, x, cf, gx_n=None, gx_s=None,
                     gcf_n=None, gcf_s=None):
        """``sc`` = int32 (3,): [global row of local row 0, global col of
        local col 0, ns] with 1 <= ns <= ho // 2."""
        if gx_n is None:                        # single-device: self-ghosts
            gx_n, gx_s = x[:, :ho], x[:, hp - ho:]
            gcf_n, gcf_s = cf[:, :ho], cf[:, hp - ho:]
        return call(sc, x, x, x, cf, cf, cf, gx_n, gx_s, gcf_n, gcf_s)

    return call_wrapped, hp, bh, ho


def build_cf(sysm, hp, wp, quad):
    """Assemble the (nc, hp, wp) coefficient stack with ONE materialized
    copy (sequential in-place dynamic-update-slices) instead of the
    stack/pad/concat chain, which XLA materializes ~3x (measured 8 ms at
    5424^2).  Padding rows/cols get identity equations (a1 = a4 = 1,
    everything else incl. rdet = 0 -> zero residual, no-op updates)."""
    from octane_tpu.flow.cg import sor_rdet

    f32 = jnp.float32
    h, w = sysm.bu.shape
    nc = 6 if quad else 10
    cf = jnp.zeros((nc, hp, wp), f32)
    cf = cf.at[0:2].set(1.0)
    planes = [sysm.a1, sysm.a4, sysm.a2, sysm.bu, sysm.bv]
    if not quad:
        planes += [jnp.broadcast_to(x, (h, w)) for x in
                   (sysm.a5, sysm.a6, sysm.a7, sysm.a8)]
    planes.append(sor_rdet(sysm))
    for m, p in enumerate(planes):
        cf = cf.at[m, :h, :w].set(p)
    return cf


def sor_solve_cf(cf, resid0, tol, iters: int, true_hw, omega: float = 1.9,
                 interpret: bool = False, crop: bool = True):
    """Multi-sweep SOR on a pre-built (nc, hp, wp) coefficient stack.

    ``cf`` is in the ``build_cf`` plane order (nc = 6 selects the quadratic
    build) with identity padding rows, e.g. straight from the fused Pallas
    assembly (ops.pallas.assemble); ``resid0`` is ||b||^2 over the true
    grid; ``true_hw`` the true dims.  ``crop=False`` returns the padded
    (hp, wp) solution planes (padded cells stay exactly zero: identity
    equations, zero rhs, zero init), which the fused solver loop adds to
    the zero-padded flow to keep the shared frame's invariant.
    """
    nc, hp, wp = cf.shape
    h, w = true_hw
    quad = nc == 6
    f32 = jnp.float32

    s_main = min(8, iters)
    n_main, s_rem = divmod(iters, s_main)
    ho = 8 if s_main <= 4 else 16
    call_p, hp2, _, _ = _build(hp, wp, bool(quad), float(omega),
                               interpret, true_h=h, true_w=w, ho=ho)
    assert hp2 == hp, (hp2, hp, "cf rows must be a multiple of the SOR band")

    zero2 = jnp.zeros((2, hp, wp), f32)

    def run(x, ns):
        xn, res = call_p(jnp.array([0, 0, ns], jnp.int32), x, cf)
        return xn, jnp.sum(res, dtype=f32)

    def cond(st):
        return (st[1] > tol) & (st[2] < n_main)

    def body(st):
        x, _, k = st
        x, res = run(x, s_main)
        return (x, res, k + 1)

    x, resid, _ = lax.while_loop(cond, body, (zero2, resid0, jnp.int32(0)))
    if s_rem:
        # the remainder pass is the SAME compiled kernel at ns = s_rem, and
        # it only runs when the tolerance has not already bound (no wasted
        # HBM pass on converged systems)
        x = lax.cond(resid > tol, lambda x: run(x, s_rem)[0],
                     lambda x: x, x)
    if not crop:
        return x[0], x[1]
    return x[0, :h, :w], x[1, :h, :w]


def sor_solve_fused(sysm, tol, iters: int, omega: float = 1.9,
                    interpret: bool = False):
    """Drop-in for flow.cg.sor_solve on TPU (single-device path).

    ``sysm`` is a flow.stencil.StencilSystem (scalar off-diagonals select
    the quadratic build); ``iters`` counts full red+black sweeps, executed
    in passes of up to 8 sweeps with the convergence check between passes.
    """
    from octane_tpu.ops.pallas.warp import interpret_mode

    h, w = sysm.bu.shape
    quad = jnp.ndim(sysm.a5) == 0
    interp = interpret or interpret_mode()
    f32 = jnp.float32
    wp = -(-w // 256) * 256

    s_main = min(8, iters)
    ho = 8 if s_main <= 4 else 16
    _, hp, _, _ = _build(h, wp, bool(quad), float(omega),
                         interp, true_h=h, true_w=w, ho=ho)

    cf = build_cf(sysm, hp, wp, quad)
    resid0 = (jnp.sum(sysm.bu * sysm.bu, dtype=f32)
              + jnp.sum(sysm.bv * sysm.bv, dtype=f32))
    return sor_solve_cf(cf, resid0, tol, iters, (h, w), omega=omega,
                        interpret=interp)


def pallas_sor_available(shape) -> bool:
    from octane_tpu.ops.pallas.warp import interpret_mode

    h, w = shape
    if jax.default_backend() == "cpu" and not interpret_mode():
        return False
    return h >= 128 and w >= 256

"""Multi-sweep red-black SOR Pallas kernel for the coupled stencil system.

Exact PCG (ops.pallas.cg) is HBM-bound at ~29.75 plane-reads per iteration
and was measured within 1.15x of its bandwidth floor (PROFILE_r03.md), so
the only way to a materially faster solve is an iteration that moves fewer
bytes.  Red-black SOR is that iteration -- BASELINE.json's north star
anticipates exactly this ("distributed red-black SOR / Jacobi sweep") --
because consecutive sweeps can be TEMPORALLY BLOCKED: this kernel runs S
full red+black sweeps per HBM streaming pass, so the coefficient planes
(a1, a4, a2, rhs, and the four robust off-diagonals) are read once per S
sweeps instead of once per sweep:

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

Update math matches flow.cg.sor_solve exactly: per colour, the residual
r = b - A x under the mirror-at-1 boundary (oct_variational_optical_flow.cu:
629-652, as core.bc.mirror_shift), then the exact 2x2 block solve
(a1 a2; a2 a4) and an omega-damped update.  The stopping rule reuses the
first red half-sweep's pre-update residual -- the same quantity
flow.cg.sor_solve tests -- evaluated once per PASS (every S sweeps) rather
than every sweep; with the reference's 1e-8 absolute tolerance
(oct_variational_optical_flow.cu:1353) the check never binds at product
scales, and when it does bind the kernel stops within S sweeps of the XLA
path.  Padding rows/cols (band alignment and the sharded path's
mesh-divisibility padding) are decoupled identity equations and contribute
exactly zero residual, mirroring flow.stencil._mask_padded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _colour_update(x, cf, rdet, grow, gcol, mask, padpix, *, quad, omega,
                   true_h, true_w, want_residual):
    """One colour half-sweep on the full (2, R, w) frame ``x``.

    ``cf`` is the coefficient frame [a1, a4, a2, bu, bv(, a5, a6, a7, a8)];
    ``rdet`` is the hoisted reciprocal block determinant (flow.cg.sor_rdet,
    shipped in as a coefficient plane): the sweep-invariant divisions are
    gone from the sweeps, replaced by one multiply, with the original
    numerator shape kept for bit parity with flow.cg.sor_solve.
    Returns the updated frame (and the dense pre-update residual fields when
    ``want_residual``).
    """
    a1 = cf[0:1]
    a4 = cf[1:2]
    a2 = cf[2:3]
    bu = cf[3:4]
    bv = cf[4:5]

    nr = jnp.roll(x, 1, axis=1)          # row j <- row j-1 (north)
    sr = jnp.roll(x, -1, axis=1)         # row j <- row j+1 (south)
    # mirror-at-1 at the TRUE grid edges (garbage wraparound rows live only
    # in the discarded overlap margin)
    nn = jnp.where(grow == 0, sr, nr)
    ss = jnp.where(grow == true_h - 1, nr, sr)
    wv = jnp.roll(x, 1, axis=2)
    ev = jnp.roll(x, -1, axis=2)
    wv = jnp.where(gcol == 0, x[:, :, 1:2], wv)
    ev = jnp.where(gcol == true_w - 1, x[:, :, true_w - 2:true_w - 1], ev)

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

    ru = bu - (a1 * x[0:1] + a2 * x[1:2] + off_u)
    rv = bv - (a2 * x[0:1] + a4 * x[1:2] + off_v)
    # NOTE: no optimization_barrier here -- the primitive has no Mosaic
    # (Pallas TPU) lowering rule, and Mosaic's FMA-contraction behavior is
    # fixed per-kernel anyway, so plain products are already deterministic
    # inside the kernel.  The XLA twin (flow.cg.sor_solve) pins ITS products
    # so the two paths match; verified bit-exact on hardware
    # (tools/tpu_checks.py check_sor).
    ndu = (a4 * ru - a2 * rv) * rdet
    ndv = (a1 * rv - a2 * ru) * rdet
    om = jnp.float32(omega)
    xu = jnp.where(mask, x[0:1] + om * ndu, x[0:1])
    xv = jnp.where(mask, x[1:2] + om * ndv, x[1:2])
    out = jnp.concatenate([xu, xv], axis=0)
    if want_residual:
        return out, ru, rv
    return out


def _kernel(row0_ref, x_n, x_b, x_s, cf_n, cf_b, cf_s,
            gx_n, gx_s, gcf_n, gcf_s, x_o, res_ref, *,
            bh, ho, w, true_h, true_w, quad, omega, nsweeps, gh):
    """S red+black sweeps on one band; body rows come out globally exact.

    ``row0_ref`` holds (global row of local row 0, global col of local col
    0) -- nonzero on the sharded path.  ``gx_*``/``gcf_*`` are ho-row ghost
    strips replacing the (self-clamped) halo blocks at the device-boundary
    bands; the mesh driver ppermutes them from the neighbour devices, and
    single-device callers pass the array's own edge blocks (identical to
    what the clipped halo index maps deliver, so the selects are no-ops).
    The first red half-sweep's pre-update residual over the BODY rows is
    emitted for the stopping rule (bands partition the grid, so the
    XLA-side sum is the global ||b - A x||^2 of the incoming iterate).
    """
    rb = pl.program_id(0)
    f32 = jnp.float32
    R = bh + 2 * ho

    def pick(n_blk, s_blk, gn, gs):
        return (jnp.where(rb == 0, gn[...], n_blk[...]),
                jnp.where(rb == gh - 1, gs[...], s_blk[...]))

    xn, xs = pick(x_n, x_s, gx_n, gx_s)
    cfn, cfs = pick(cf_n, cf_s, gcf_n, gcf_s)
    x = jnp.concatenate([xn, x_b[...], xs], axis=1)
    cf = jnp.concatenate([cfn, cf_b[...], cfs], axis=1)
    # hoisted reciprocal determinant: sweep-invariant, computed ONCE at
    # the XLA level (flow.cg.sor_rdet) and shipped in as the last
    # coefficient plane -- no divisions anywhere in the sweeps
    base = 5 if quad else 9
    rdet = cf[base:base + 1]
    g0 = row0_ref[0] + rb * bh - ho
    grow = g0 + lax.broadcasted_iota(jnp.int32, (1, R, 1), 1)
    gcol = row0_ref[1] + lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    red = ((grow + gcol) % 2) == 0
    padpix = (grow >= true_h) | (gcol >= true_w)

    kw = dict(quad=quad, omega=omega, true_h=true_h, true_w=true_w)
    x, ru, rv = _colour_update(x, cf, rdet, grow, gcol, red, padpix,
                               want_residual=True, **kw)
    r2 = ru * ru + rv * rv
    res_ref[rb, 0] = jnp.sum(r2[:, ho:ho + bh], dtype=f32)
    x = _colour_update(x, cf, rdet, grow, gcol, ~red, padpix,
                       want_residual=False, **kw)
    for _ in range(nsweeps - 1):
        x = _colour_update(x, cf, rdet, grow, gcol, red, padpix,
                           want_residual=False, **kw)
        x = _colour_update(x, cf, rdet, grow, gcol, ~red, padpix,
                           want_residual=False, **kw)
    x_o[:] = x[:, ho:ho + bh]


def _pick_bh(w: int, quad: bool, ho: int) -> int:
    """Largest band height whose double-buffered streams plus the in-kernel
    frame temporaries fit in VMEM.  Larger bands amortize the 2*ho overlap
    rows (pure redundant compute), so prefer the biggest that fits."""
    nc = 6 if quad else 10
    for bh in (256, 128, 64, 32, 16):
        if bh % ho:
            continue
        frame = bh + 2 * ho
        streams = 2 * ((2 + nc) * frame + 2 * bh)     # double-buffered in+out
        temps = (2 + nc + 10) * frame                 # x/cf frames + sweeps
        if (streams + temps) * w * 4 <= 100 * 1024 * 1024:
            return bh
    return 16


@functools.lru_cache(maxsize=None)
def _build(h, w, quad, nsweeps, omega, interpret=False,
           true_h=None, true_w=None, ho=None):
    """Build the S-sweep pass kernel for an (h, w) local block.

    ``h`` must be a multiple of the chosen band height (the caller pads);
    ``true_h``/``true_w`` are the GLOBAL true dims for the mirror/identity
    fixups.  ``ho`` (overlap rows per side, >= 2*nsweeps, multiple of 8)
    may be forced so a remainder-pass kernel keeps the main kernel's ghost
    strip width on the sharded path.
    """
    true_h = h if true_h is None else true_h
    true_w = w if true_w is None else true_w
    if ho is None:
        ho = 8 if nsweeps <= 4 else (16 if nsweeps <= 8 else 32)
    assert 2 * nsweeps <= ho
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
                             nsweeps=nsweeps, gh=gh)
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

    def call_wrapped(row0, x, cf, gx_n=None, gx_s=None,
                     gcf_n=None, gcf_s=None):
        if gx_n is None:                        # single-device: self-ghosts
            gx_n, gx_s = x[:, :ho], x[:, hp - ho:]
            gcf_n, gcf_s = cf[:, :ho], cf[:, hp - ho:]
        return call(row0, x, x, x, cf, cf, cf, gx_n, gx_s, gcf_n, gcf_s)

    return call_wrapped, hp, bh, ho


def sor_solve_fused(sysm, tol, iters: int, omega: float = 1.9,
                    interpret: bool = False):
    """Drop-in for flow.cg.sor_solve on TPU (single-device path).

    ``sysm`` is a flow.stencil.StencilSystem (scalar off-diagonals select
    the quadratic build); ``iters`` counts full red+black sweeps, executed
    in passes of up to 8 sweeps with the convergence check between passes.
    """
    from octane_tpu.flow.cg import sor_rdet
    from octane_tpu.ops.pallas.warp import interpret_mode

    h, w = sysm.bu.shape
    quad = jnp.ndim(sysm.a5) == 0
    interp = interpret or interpret_mode()
    f32 = jnp.float32

    s_main = min(8, iters)
    n_main, s_rem = divmod(iters, s_main)
    call_m, hp, _, ho = _build(h, w, bool(quad), s_main, float(omega),
                               interp)
    call_r = None
    if s_rem:
        call_r, hp_r, _, _ = _build(h, w, bool(quad), s_rem, float(omega),
                                    interp, ho=ho)
        assert hp_r == hp

    def pad(a, val=0.0):
        return jnp.pad(a, ((0, 0), (0, hp - h), (0, 0)),
                       constant_values=f32(val))

    planes = [jnp.stack([sysm.a1, sysm.a4])]
    tails = [jnp.stack([sysm.a2, sysm.bu, sysm.bv])]
    if not quad:
        tails.append(jnp.stack([sysm.a5, sysm.a6, sysm.a7, sysm.a8]))
    # sweep-invariant reciprocal determinant, hoisted to the XLA level
    # (shared with flow.cg.sor_solve for bit parity); padded rows multiply
    # by zero
    tails.append(sor_rdet(sysm)[None])
    cf = jnp.concatenate([pad(planes[0], 1.0)] + [pad(t) for t in tails])
    zero2 = jnp.zeros((2, hp, w), f32)
    row0 = jnp.zeros((2,), jnp.int32)
    resid0 = (jnp.sum(sysm.bu * sysm.bu, dtype=f32)
              + jnp.sum(sysm.bv * sysm.bv, dtype=f32))

    def run(call, x):
        xn, res = call(row0, x, cf)
        return xn, jnp.sum(res, dtype=f32)

    def cond(st):
        return (st[1] > tol) & (st[2] < n_main)

    def body(st):
        x, _, k = st
        x, res = run(call_m, x)
        return (x, res, k + 1)

    x, resid, _ = lax.while_loop(cond, body, (zero2, resid0, jnp.int32(0)))
    if call_r is not None:
        xr, _ = run(call_r, x)
        x = jnp.where(resid > tol, xr, x)
    return x[0, :h], x[1, :h]


def pallas_sor_available(shape) -> bool:
    from octane_tpu.ops.pallas.warp import interpret_mode

    h, w = shape
    if jax.default_backend() == "cpu" and not interpret_mode():
        return False
    return h >= 128 and w >= 256

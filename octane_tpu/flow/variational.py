"""Coarse-to-fine variational optical flow (modified Zimmer / Brox).

TPU-native redesign of the reference's cooperative-groups mega-kernel
(oct_variational_optical_flow.cu:468-1211).  The pyramid is a Python loop
over levels (each level has its own static shapes and its own jitted
program); graduated non-convexity and the relinearization iterations run
inside the jit as a `lax.fori_loop`; the PCG solve is a `lax.while_loop`
with the same stopping rule (||r||^2 <= 1e-8, <= cgiters iterations).

Numerics replicated exactly (see SURVEY.md section 8): per-level images are
blurred-then-floor-subsampled from full resolution, first-guess "hat" fields
are downsampled the same way and scaled by the level factor, flow upsampling
is half-pixel bicubic divided by the scale factor, and the hinting weight
decays as lambdac * 0.5^k (oct_variational_optical_flow.cu:487-575,493).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from octane_tpu.config import OFConfig
from octane_tpu.core.gradients import gradient_4th
from octane_tpu.core.zoom import pyramid_downsample, zoom_in_flow, zoom_size
from octane_tpu.flow.stencil import assemble, apply_stencil
from octane_tpu.flow.cg import pcg_solve, sor_solve


@functools.partial(
    jax.jit,
    static_argnames=("liters", "cgiters", "gnc_steps", "dozim", "solver",
                     "warp_fn", "true_hw", "fused_cg", "cg_fn", "sor_omega",
                     "fused_asm"),
)
def solve_level(
    g1, g2, u, v, uhat, vhat,
    alpha, lam_over_alpha, lambdac, tol,
    liters: int, cgiters: int, gnc_steps: int, dozim: bool, solver: str = "pcg",
    warp_fn=None, true_hw=None, fused_cg: bool = False, cg_fn=None,
    sor_omega: float = 1.9, fused_asm=None,
):
    """Run GNC x inner iterations at one pyramid level.

    g1/g2: (C, H, W) level images; u/v: initial flow; uhat/vhat: first-guess
    hint fields at this level.  Returns the updated (u, v).

    ``true_hw``: the true level dims when the arrays carry trailing
    mesh-divisibility padding (sharded path).  All boundary handling then
    happens at the true edges and padded pixels are decoupled identity rows,
    so true-pixel results match the unpadded solve.

    ``fused_asm``: the shared padded dims (hp, wp) of the fully fused
    Pallas chain (warp -> assemble -> SOR, single device): the inner loop
    then runs entirely on zero-padded (hp, wp) planes and the XLA assembly
    disappears (see ops.pallas.assemble).  Requires ``warp_fn`` built with
    ``pad_to=(hp, wp), crop=False`` and solver == "sor".
    """
    gx1, gy1 = gradient_4th(g1, true_hw)
    gx2, gy2 = gradient_4th(g2, true_hw)
    gxx, _ = gradient_4th(gx2, true_hw)
    gxy, gyy = gradient_4th(gy2, true_hw)  # Ixy = d/dx (d/dy geo2), ref :591-594
    # warp-sample stack is loop-invariant: build (and pre-pad) once per level
    stack = jnp.concatenate([g2, gx2, gy2, gxx, gxy, gyy], axis=0)
    if warp_fn is not None and hasattr(warp_fn, "pad"):
        stack = warp_fn.pad(stack)

    if fused_asm is not None:
        assert solver == "sor" and warp_fn is not None and true_hw is None
        return _solve_level_fused(
            g1, gx1, gy1, stack, u, v, uhat, vhat,
            alpha, lam_over_alpha, lambdac, tol,
            liters, cgiters, gnc_steps, dozim, warp_fn, sor_omega, fused_asm)

    def make_inner(al1, al1_s):
        def inner(uv):
            u, v = uv
            sys = assemble(
                g1, g2, gx1, gy1, gx2, gy2, gxx, gxy, gyy,
                u, v, uhat, vhat, al1, alpha, lam_over_alpha, lambdac,
                dozim, warp_fn=warp_fn, stack=stack, al1_static=al1_s,
                true_hw=true_hw,
            )
            if cg_fn is not None:
                # mesh-sharded fused Pallas solver (parallel.cg / parallel.sor)
                du, dv = cg_fn(sys, tol, cgiters)
            elif solver == "sor":
                if fused_cg:
                    from octane_tpu.ops.pallas.sor import sor_solve_fused
                    du, dv = sor_solve_fused(sys, tol, cgiters,
                                             omega=sor_omega)
                else:
                    du, dv = sor_solve(sys, tol, cgiters, omega=sor_omega,
                                       true_hw=true_hw)
            elif fused_cg:
                from octane_tpu.ops.pallas.cg import pcg_solve_fused
                du, dv = pcg_solve_fused(sys, tol, cgiters)
            else:
                du, dv = pcg_solve(
                    lambda a, b: apply_stencil(sys, a, b, true_hw=true_hw),
                    sys.a1, sys.a4, sys.bu, sys.bv, tol, cgiters,
                )
            return u + du, v + dv

        return inner

    # Two traced bodies per level, not gnc_steps: the quadratic first step
    # (al1 == 1 at trace time) skips the robust-smoothness block and reads
    # scalar off-diagonals in its CG (see assemble's al1_static); all
    # remaining GNC steps share one fori_loop body with al1 = 1 - 0.5*g
    # computed from the loop index (their traces are otherwise identical).
    quad = make_inner(jnp.float32(1.0), 1.0)
    u, v = jax.lax.fori_loop(0, liters, lambda _, uv: quad(uv), (u, v))
    if gnc_steps > 1:
        def robust(i, uv):
            g = 1.0 + (i // liters).astype(jnp.float32)
            return make_inner(1.0 - 0.5 * g, None)(uv)
        u, v = jax.lax.fori_loop(0, (gnc_steps - 1) * liters, robust, (u, v))
    return u, v


def _solve_level_fused(
    g1, gx1, gy1, stack, u, v, uhat, vhat,
    alpha, lam_a, lambdac, tol,
    liters, cgiters, gnc_steps, dozim, warp_fn, sor_omega, pad_shape,
):
    """Fully fused Pallas inner loop: warp -> assemble -> SOR on one shared
    zero-padded (hp, wp) frame.

    The level-invariant [geo1, gx1, gy1] stack and the hint fields are
    padded once; u/v live padded through the GNC x liters loops (the SOR
    solution is exactly zero on padded cells -- identity equations, zero
    rhs, zero init -- so the zero padding is invariant, which keeps the
    warp's data-driven window stats identical to the crop-and-repad path).
    """
    from octane_tpu.ops.pallas.assemble import make_fused_assemble
    from octane_tpu.ops.pallas.sor import sor_solve_cf
    from octane_tpu.ops.pallas.warp import interpret_mode

    C, h, w = g1.shape
    hp, wp = pad_shape
    interp = interpret_mode()

    def pad2(a):
        return jnp.pad(a, ((0, hp - h), (0, wp - w)))

    g1s = jnp.pad(jnp.concatenate([g1, gx1, gy1], axis=0),
                  ((0, 0), (0, hp - h), (0, wp - w)))
    uhat_p, vhat_p = pad2(uhat), pad2(vhat)
    u, v = pad2(u), pad2(v)

    def make_inner(al1, quad):
        asm = make_fused_assemble((h, w), (hp, wp), C, quad, dozim,
                                  interpret=interp)

        def inner(uv):
            u, v = uv
            smp, bcx, bcy = warp_fn(stack, u, v)
            cf, r0 = asm(al1, lambdac, alpha, lam_a,
                         g1s, smp, bcx, bcy, u, v, uhat_p, vhat_p)
            du, dv = sor_solve_cf(cf, r0, tol, cgiters, (h, w),
                                  omega=sor_omega, interpret=interp,
                                  crop=False)
            return u + du, v + dv

        return inner

    quad = make_inner(jnp.float32(1.0), True)
    u, v = jax.lax.fori_loop(0, liters, lambda _, uv: quad(uv), (u, v))
    if gnc_steps > 1:
        def robust(i, uv):
            g = 1.0 + (i // liters).astype(jnp.float32)
            return make_inner(1.0 - 0.5 * g, False)(uv)
        u, v = jax.lax.fori_loop(0, (gnc_steps - 1) * liters, robust, (u, v))
    return u[:h, :w], v[:h, :w]


def _coarse_to_fine(geo1, geo2, u0, v0, cfg: OFConfig, warp_fns=None,
                    true_shape=None, allow_fused=False, cg_fns=None):
    """Trace the full pyramid schedule (shapes static, loop unrolled).

    ``warp_fns`` optionally maps level index -> warp sampler (Pallas or
    sharded halo-exchange paths).  ``true_shape`` gives the true (H, W) when
    the inputs carry trailing mesh-divisibility padding (padded with edge
    replication); level sizes, resampling positions and boundary handling
    then follow the TRUE dims, so true pixels match the unpadded schedule
    and the returned padded flow only needs cropping.
    """
    h, w = u0.shape
    th, tw = (h, w) if true_shape is None else true_shape
    padded = (th, tw) != (h, w)
    kiters = cfg.kiters
    u = v = None
    prev_true = None
    for k in range(kiters):
        factor = float(np.float32(cfg.scale_factor) ** (kiters - k - 1))
        nxx, nyy = zoom_size(w, factor), zoom_size(h, factor)
        tnx, tny = zoom_size(tw, factor), zoom_size(th, factor)
        lambdac_k = (cfg.lambdac / cfg.alpha) * (0.5 ** k)
        true_in = (th, tw) if padded else None

        if k == kiters - 1:
            g1, g2 = geo1, geo2
            uhat, vhat = u0, v0
        else:
            g1 = pyramid_downsample(geo1, factor, true_in)
            g2 = pyramid_downsample(geo2, factor, true_in)
            uhat = pyramid_downsample(u0, factor, true_in) * jnp.float32(factor)
            vhat = pyramid_downsample(v0, factor, true_in) * jnp.float32(factor)

        if k == 0:
            u, v = uhat, vhat
        else:
            zi = prev_true if padded else None
            zo = (tny, tnx) if padded else None
            u = zoom_in_flow(u, (nyy, nxx), cfg.scale_factor, zi, zo)
            v = zoom_in_flow(v, (nyy, nxx), cfg.scale_factor, zi, zo)

        # the fused Pallas solvers run single-device only (a pallas_call
        # cannot be GSPMD-partitioned) and at the true dims
        fused = False
        wf_k = warp_fns.get(k) if warp_fns else None
        fused_asm = getattr(wf_k, "fused_asm", None)  # set by flow_program
        if allow_fused and cfg.use_pallas and not padded:
            if cfg.solver == "pcg":
                from octane_tpu.ops.pallas.cg import pallas_cg_available
                fused = pallas_cg_available((nyy, nxx))
            else:
                from octane_tpu.ops.pallas.sor import pallas_sor_available
                fused = pallas_sor_available((nyy, nxx))
        u, v = solve_level(
            g1, g2, u, v, uhat, vhat,
            jnp.float32(cfg.alpha), jnp.float32(cfg.lambda_over_alpha),
            jnp.float32(lambdac_k), jnp.float32(cfg.cg_tol),
            cfg.liters, cfg.cgiters, cfg.gnc_steps, cfg.dozim, cfg.solver,
            warp_fn=wf_k,
            true_hw=(tny, tnx) if padded else None,
            fused_cg=fused,
            cg_fn=cg_fns.get(k) if cg_fns else None,
            sor_omega=cfg.sor_omega,
            fused_asm=fused_asm if (allow_fused and not padded) else None,
        )
        prev_true = (tny, tnx)
    return u, v


_program_cache = {}


def flow_program(cfg: OFConfig, shape, nchan: int):
    """One jitted program for the ENTIRE coarse-to-fine solve.

    A single dispatch per image pair: the level loop is unrolled at trace
    time, so pyramid construction, warping, assembly and all CG iterations
    compile into one XLA executable (no per-level host round trips -- this
    is what makes the solver latency-tolerant in production serving).
    """
    key = (shape, nchan, cfg.alpha, cfg.lambda_, cfg.lambdac, cfg.scale_factor,
           cfg.kiters, cfg.liters, cfg.cgiters, cfg.gnc_steps, cfg.dozim,
           cfg.solver, cfg.sor_omega, cfg.cg_tol, cfg.use_pallas)
    if key in _program_cache:
        return _program_cache[key]

    # per-level Pallas warp kernels on TPU backends.  With the SOR solver,
    # levels large enough for the Pallas SOR run the fully fused chain
    # (warp -> assemble -> SOR, ops.pallas.assemble): the warp is then
    # built uncropped on the chain's shared padded frame and tagged with
    # it (solve_level dispatches on the tag).
    warp_fns = {}
    if cfg.use_pallas:
        from octane_tpu.ops.pallas.warp import make_pallas_warp
        from octane_tpu.ops.pallas.sor import pallas_sor_available
        from octane_tpu.ops.pallas.assemble import fused_geometry
        h, w = shape
        for k in range(cfg.kiters):
            factor = float(np.float32(cfg.scale_factor) ** (cfg.kiters - k - 1))
            lvl = (zoom_size(h, factor), zoom_size(w, factor))
            if cfg.solver == "sor" and pallas_sor_available(lvl):
                pad_shape = fused_geometry(lvl, cfg.cgiters)
                wf = make_pallas_warp(lvl, pad_to=pad_shape, crop=False)
                if wf is not None:
                    wf.fused_asm = pad_shape
            else:
                wf = make_pallas_warp(lvl)
            if wf is not None:
                warp_fns[k] = wf

    @jax.jit
    def program(geo1, geo2, u0, v0):
        return _coarse_to_fine(geo1, geo2, u0, v0, cfg, warp_fns or None,
                               allow_fused=True)

    _program_cache[key] = program
    return program


def variational_flow(
    geo1: jnp.ndarray,
    geo2: jnp.ndarray,
    u0: jnp.ndarray,
    v0: jnp.ndarray,
    cfg: OFConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full coarse-to-fine solve.

    geo1/geo2: (C, H, W) float32 images normalized to [0, 255];
    u0/v0: (H, W) float32 first-guess pixel displacements (zeros if none).
    Returns (u, v) dense pixel displacements at full resolution.
    """
    geo1 = jnp.asarray(geo1, jnp.float32)
    geo2 = jnp.asarray(geo2, jnp.float32)
    if geo1.ndim == 2:
        geo1 = geo1[None]
        geo2 = geo2[None]
    u0 = jnp.asarray(u0, jnp.float32)
    v0 = jnp.asarray(v0, jnp.float32)
    program = flow_program(cfg, u0.shape, geo1.shape[0])
    return program(geo1, geo2, u0, v0)

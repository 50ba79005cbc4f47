"""Stage breakdown of the full-disk (config 3) solve on the real chip.

Times each pipeline stage standalone at 5424^2 (and its pyramid levels) so
perf work targets the actual top cost instead of guesses:

  * fused Pallas PCG (robust + quad) per iteration
  * XLA PCG per iteration (what the sharded path currently runs)
  * system assembly (robust + quad) per call
  * Pallas warp of the 6-field stack per call
  * pyramid downsample / flow upsample per level
  * the whole flow_program (the bench headline) for cross-checking

Each measurement chains K dependent dispatches and reports (chain - chain/2)
slope to cancel the ~30 ms tunnel round-trip.  Results are printed as a
table plus the implied per-pair accounting.

Run: python tools/profile_stages.py [--size 5424] [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, args, k=4, reps=2):
    """Seconds per call: k-chain of dispatches closed by ONE scalar readback
    (through the axon tunnel only a readback is a reliable barrier --
    block_until_ready can return before remote execution finishes).
    ``fn`` must return a scalar."""
    float(fn(*args))                    # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s = jnp.float32(0)
        for _ in range(k):
            s = s + fn(*args)
        float(s)
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def make_system(h, w, quad, seed=1):
    from octane_tpu.flow.stencil import StencilSystem

    rng = np.random.default_rng(seed)

    def arr(lo, hi):
        return jnp.asarray(rng.uniform(lo, hi, (h, w)).astype(np.float32))

    offd = ((jnp.float32(-1),) * 4 if quad
            else tuple(-arr(0.3, 1.0) for _ in range(4)))
    return StencilSystem(arr(4.5, 9.0), arr(-0.2, 0.2), arr(4.5, 9.0),
                         *offd, arr(-100, 100), arr(-100, 100))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=5424)
    ap.add_argument("--cgiters", type=int, default=30)
    ap.add_argument("--quick", action="store_true",
                    help="skip the full program cross-check")
    args = ap.parse_args()
    n = args.size
    print(f"backend: {jax.default_backend()}  size: {n}")

    from octane_tpu.config import OFConfig
    from octane_tpu.flow.stencil import assemble, apply_stencil, \
        warp_bilinear_dense
    from octane_tpu.flow.cg import pcg_solve
    from octane_tpu.ops.pallas.cg import pcg_solve_fused
    from octane_tpu.ops.pallas.warp import make_pallas_warp
    from octane_tpu.core.zoom import pyramid_downsample, zoom_in_flow, \
        zoom_size

    h = w = n
    mpx = h * w / 1e6
    results = {}

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(100, 30, (1, h, w)).astype(np.float32))
    u = jnp.asarray(rng.uniform(-2, 2, (h, w)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-2, 2, (h, w)).astype(np.float32))
    stack6 = jnp.asarray(rng.normal(0, 1, (6, h, w)).astype(np.float32))

    # ---- CG ----------------------------------------------------------------
    # while_loop carries full arrays, so the [0, 0] probe cannot be
    # dead-code-sliced; elementwise stages below use fused jnp.sum instead
    for name, quad in (("fused_cg_robust", False), ("fused_cg_quad", True)):
        sysm = make_system(h, w, quad)
        fn = jax.jit(lambda s: pcg_solve_fused(
            s, jnp.float32(0.0), args.cgiters)[0][0, 0])
        dt = timed(fn, (sysm,), k=2)
        results[name] = dt
        print(f"{name:24s} {dt*1e3:9.1f} ms/solve "
              f"({dt/args.cgiters*1e3:6.2f} ms/iter, "
              f"{mpx/dt:7.1f} Mpix/s-solve)")

    sysm = make_system(h, w, False)
    fn = jax.jit(lambda s: pcg_solve(
        lambda a, b: apply_stencil(s, a, b),
        s.a1, s.a4, s.bu, s.bv, jnp.float32(0.0), args.cgiters)[0][0, 0])
    dt = timed(fn, (sysm,), k=2)
    results["xla_cg_robust"] = dt
    print(f"{'xla_cg_robust':24s} {dt*1e3:9.1f} ms/solve "
          f"({dt/args.cgiters*1e3:6.2f} ms/iter)")

    # ---- SOR (the production relaxer / bench default) ----------------------
    from octane_tpu.ops.pallas.sor import sor_solve_fused
    for name, quad in (("fused_sor_robust", False), ("fused_sor_quad", True)):
        sysm = make_system(h, w, quad)
        fn = jax.jit(lambda s: sor_solve_fused(
            s, jnp.float32(1e-8), args.cgiters)[0][0, 0])
        dt = timed(fn, (sysm,), k=2)
        results[name] = dt
        print(f"{name:24s} {dt*1e3:9.1f} ms/solve "
              f"({dt/args.cgiters*1e3:6.2f} ms/sweep, "
              f"{mpx/dt:7.1f} Mpix/s-solve)")

    # ---- warp --------------------------------------------------------------
    wf = make_pallas_warp((h, w))
    if wf is not None:
        st = wf.pad(stack6) if hasattr(wf, "pad") else stack6
        fn = jax.jit(lambda s, a, b: wf(s, a, b)[0][0, 0, 0])
        dt = timed(fn, (st, u, v), k=4)
        results["pallas_warp"] = dt
        print(f"{'pallas_warp':24s} {dt*1e3:9.1f} ms/call")
    fn = jax.jit(lambda s, a, b: sum(jnp.sum(x) for x in
                                     warp_bilinear_dense(s, a, b)))
    dt = timed(fn, (stack6, u, v), k=2)
    results["xla_warp"] = dt
    print(f"{'xla_warp':24s} {dt*1e3:9.1f} ms/call")

    # ---- assembly (with the production Pallas warp + prepadded stack) ------
    st = wf.pad(stack6) if (wf is not None and hasattr(wf, "pad")) else stack6
    awf = wf if wf is not None else None
    for name, al1s in (("assemble_robust", None), ("assemble_quad", 1.0)):
        al1 = jnp.float32(1.0 if al1s else 0.5)

        def asm(g, stk, uu, vv, _al1=al1, _al1s=al1s):
            s = assemble(
                g, g, g, g, g, g, g, g, g, uu, vv, uu, vv,
                _al1, jnp.float32(5.0), jnp.float32(0.2), jnp.float32(0.0),
                True, warp_fn=awf, stack=stk, al1_static=_al1s)
            return (jnp.sum(s.a1) + jnp.sum(s.a2) + jnp.sum(s.a4)
                    + jnp.sum(s.bu) + jnp.sum(s.bv) + jnp.sum(s.a5))
        fn = jax.jit(asm)
        dt = timed(fn, (img, st, u, v), k=4)
        results[name] = dt
        print(f"{name:24s} {dt*1e3:9.1f} ms/call")

    # ---- fused Pallas assembly (warp -> assemble kernel, the production
    # SOR-path chain; includes the in-kernel resid0 and rdet) --------------
    from octane_tpu.ops.pallas.assemble import (fused_geometry,
                                                make_fused_assemble)
    ps = fused_geometry((h, w), args.cgiters)
    hp, wp_ = ps
    wf_f = make_pallas_warp((h, w), pad_to=ps, crop=False)
    if wf_f is not None:
        st_f = wf_f.pad(stack6)
        g1s = jnp.pad(jnp.concatenate([img, img, img], axis=0),
                      ((0, 0), (0, hp - h), (0, wp_ - w)))
        u_p = jnp.pad(u, ((0, hp - h), (0, wp_ - w)))
        v_p = jnp.pad(v, ((0, hp - h), (0, wp_ - w)))
        for name, quad in (("fused_asm_robust", False),
                           ("fused_asm_quad", True)):
            a = make_fused_assemble((h, w), ps, 1, quad, True)

            def fasm(stk, g1p, uu, vv, _a=a):
                smp, bcx, bcy = wf_f(stk, uu, vv)
                cf, r0 = _a(jnp.float32(0.5), jnp.float32(0.0),
                            jnp.float32(5.0), jnp.float32(0.2),
                            g1p, smp, bcx, bcy, uu, vv, uu, vv)
                return jnp.sum(cf[0]) + r0
            fn = jax.jit(fasm)
            dt = timed(fn, (st_f, g1s, u_p, v_p), k=4)
            results[name] = dt
            print(f"{name:24s} {dt*1e3:9.1f} ms/call (incl. warp)")

    # ---- resample ----------------------------------------------------------
    f = 0.5
    fn = jax.jit(lambda a: jnp.sum(pyramid_downsample(a, f)))
    dt = timed(fn, (img,), k=4)
    results["downsample_half"] = dt
    print(f"{'downsample_half':24s} {dt*1e3:9.1f} ms/call")
    hs, ws = zoom_size(h, f), zoom_size(w, f)
    us = jnp.asarray(rng.uniform(-2, 2, (hs, ws)).astype(np.float32))
    fn = jax.jit(lambda a: jnp.sum(zoom_in_flow(a, (h, w), f)))
    dt = timed(fn, (us,), k=4)
    results["zoom_in_flow"] = dt
    print(f"{'zoom_in_flow':24s} {dt*1e3:9.1f} ms/call")

    # ---- whole program cross-check ------------------------------------------
    if not args.quick:
        from octane_tpu.flow.variational import flow_program
        z = jnp.zeros((h, w), jnp.float32)
        img2 = jnp.roll(img, 3, axis=2)
        for solver in ("sor", "pcg"):
            cfg = OFConfig(kiters=4, alpha=5.0, lambda_=1.0, solver=solver)
            program = flow_program(cfg, (h, w), 1)
            fn = lambda a, b, c, d: program(a, b, c, d)[0][0, 0]  # noqa: E731
            dt = timed(fn, (img, img2, z, z), k=2)
            results[f"full_program_{solver}"] = dt
            print(f"{'full_program_' + solver:24s} {dt*1e3:9.1f} ms/pair "
                  f"({mpx/dt:7.2f} Mpix/s)")

        # implied accounting at default budget (3 GNC x 3 liters, 4 levels;
        # coarser levels cost ~(1/4 + 1/16 + 1/64) of the finest)
        lvl = 1 + 0.25 + 0.0625 + 0.015625
        inner = 9
        for solver, key_q, key_r in (("sor", "fused_sor_quad",
                                      "fused_sor_robust"),
                                     ("pcg", "fused_cg_quad",
                                      "fused_cg_robust")):
            cg = (results[key_q] * 3 + results[key_r] * 6) * lvl
            # the SOR path runs the fused Pallas assembly when available
            if solver == "sor" and "fused_asm_robust" in results:
                aq, ar = results["fused_asm_quad"], results["fused_asm_robust"]
            else:
                aq, ar = results["assemble_quad"], results["assemble_robust"]
            asm = (aq * 3 + ar * 6) * lvl
            wrp = results.get("pallas_warp", results["xla_warp"]) * inner * lvl
            print(f"implied[{solver}]: solve={cg*1e3:.0f} ms  "
                  f"assemble(incl warp)={asm*1e3:.0f} ms  "
                  f"warp-alone={wrp*1e3:.0f} ms  total-measured="
                  f"{results['full_program_' + solver]*1e3:.0f} ms")


if __name__ == "__main__":
    main()

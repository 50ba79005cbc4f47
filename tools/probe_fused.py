"""Quick TPU probe of the fused warp->assemble->SOR chain at the config-3
shape: steady-state ms/pair + numeric agreement vs the XLA-assembly path at
a smaller shape.  Used during round-5 perf work; PROFILE_r05.md records the
final numbers."""

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=5424)
    ap.add_argument("--check-size", type=int, default=1356)
    ap.add_argument("--skip-check", action="store_true")
    args = ap.parse_args()
    print("backend:", jax.default_backend())

    from octane_tpu.config import OFConfig
    from octane_tpu.flow.variational import flow_program, solve_level
    from octane_tpu.ops.pallas.assemble import fused_geometry
    from octane_tpu.ops.pallas.warp import make_pallas_warp

    if not args.skip_check:
        # numeric agreement fused vs XLA-assembly path at one level
        h = w = args.check_size
        rng = np.random.default_rng(7)
        base = rng.normal(100, 25, (h, w + 8)).astype(np.float32)
        g1 = jnp.asarray(base[:, 2:2 + w][None])
        g2 = jnp.asarray(base[:, 0:w][None])
        z = jnp.zeros((h, w), jnp.float32)
        sargs = (jnp.float32(5.0), jnp.float32(0.2), jnp.float32(0.05),
                 jnp.float32(1e-8))
        kw = dict(liters=3, cgiters=30, gnc_steps=3, dozim=True,
                  solver="sor")
        pad_shape = fused_geometry((h, w), 30)
        wf_f = make_pallas_warp((h, w), pad_to=pad_shape, crop=False)
        uf, vf = solve_level(g1, g2, z, z, z, z, *sargs, **kw,
                             warp_fn=wf_f, fused_asm=pad_shape)
        wf_p = make_pallas_warp((h, w))
        up, vp = solve_level(g1, g2, z, z, z, z, *sargs, **kw,
                             warp_fn=wf_p, fused_cg=True)
        du = np.abs(np.asarray(uf) - np.asarray(up))
        dv = np.abs(np.asarray(vf) - np.asarray(vp))
        print(f"fused-vs-plain level {h}^2: max|du|={du.max():.3e} "
              f"max|dv|={dv.max():.3e} p99|du|={np.percentile(du, 99):.3e}")

    h = w = args.size
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(100, 30, (1, h, w)).astype(np.float32))
    img2 = jnp.roll(img, 3, axis=2)
    z = jnp.zeros((h, w), jnp.float32)
    cfg = OFConfig(kiters=4, alpha=5.0, lambda_=1.0, solver="sor")
    program = flow_program(cfg, (h, w), 1)

    def timed(k=2, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            s = jnp.float32(0)
            for _ in range(k):
                s = s + program(img, img2, z, z)[0][0, 0]
            float(s)
            best = min(best, (time.perf_counter() - t0) / k)
        return best

    float(program(img, img2, z, z)[0][0, 0])
    dt = timed()
    print(f"full_program_sor: {dt*1e3:.1f} ms/pair ({h*w/1e6/dt:.2f} Mpix/s)")


if __name__ == "__main__":
    main()

"""Benchmark: dense variational optical flow throughput on one chip.

Runs the full coarse-to-fine solve (1024x1024 pair, default reference
settings: 4-level pyramid, 3 GNC x 3 inner iterations, <=30 CG, alpha=5,
lambda=1) on the default JAX backend and prints one JSON line:
  {"metric": "variational_flow_mpix_s", "value": ..., "unit": "Mpix/s",
   "vs_baseline": ...}

Throughput is measured at steady state, the production-serving condition:
K solves are dispatched back-to-back (inputs varied per rep so nothing can
be cached) and the per-pair time is the slope between a K-chain and a
2K-chain, which cancels the constant dispatch/readback latency of the host
link (~30 ms/round-trip through the axon tunnel -- an artifact of the
harness, not of the framework; a serving deployment keeps the device queue
fed exactly like the chain does).

vs_baseline normalizes against the north-star per-chip rate implied by
BASELINE.json: full-disk 0.5-km band-2 (21696^2 = 470.7 Mpix) in < 2 s on a
v5e-16 => ~14.7 Mpix/s/chip.  vs_baseline > 1 beats the target.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NORTH_STAR_MPIX_S_PER_CHIP = (21696.0 ** 2 / 1e6) / 2.0 / 16.0   # ~14.71


def synth_pair(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (
        120.0 * np.exp(-(((xx - w / 3) ** 2 + (yy - h / 3) ** 2) / (2 * (w / 8) ** 2)))
        + 60.0 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
        + 50.0
        + rng.normal(0, 2.0, (h, w)).astype(np.float32)
    )
    shift = 2.4
    warped = (
        120.0 * np.exp(-(((xx - shift - w / 3) ** 2 + (yy - h / 3) ** 2) / (2 * (w / 8) ** 2)))
        + 60.0 * np.sin((xx - shift) / 9.0) * np.cos(yy / 7.0)
        + 50.0
        + rng.normal(0, 2.0, (h, w)).astype(np.float32)
    )
    return base.astype(np.float32), warped.astype(np.float32)


def main():
    from octane_tpu.config import OFConfig
    from octane_tpu.flow.variational import flow_program

    h = w = 1024
    im1, im2 = synth_pair(h, w)
    zero = np.zeros((h, w), np.float32)
    cfg = OFConfig(kiters=4, alpha=5.0, lambda_=1.0)

    program = flow_program(cfg, (h, w), 1)
    g1 = jnp.asarray(im1[None])
    g2 = jnp.asarray(im2[None])
    z = jnp.asarray(zero)

    def chain(n, base):
        # n solves back-to-back; per-rep input perturbation defeats any
        # execution caching, single scalar readback drains the queue
        s = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(n):
            u, v = program(g1, g2, z + jnp.float32(base + i) * 1e-6, z)
            s = s + u[0, 0]
        float(s)
        return time.perf_counter() - t0

    chain(1, 999)  # warmup / compile
    K = 6
    t1 = min(chain(K, 1 + r * 100) for r in range(3))
    t2 = min(chain(2 * K, 51 + r * 100) for r in range(3))
    dt = (t2 - t1) / K  # steady-state per-pair seconds

    mpix_s = (h * w / 1e6) / dt
    print(json.dumps({
        "metric": "variational_flow_mpix_s",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / NORTH_STAR_MPIX_S_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()

"""Benchmark: dense variational optical flow throughput on one chip.

Runs the full coarse-to-fine solve (BASELINE config 1 style: 512x512 crop,
alpha=5, lambda=1) on the default JAX backend and prints one JSON line:
  {"metric": "variational_flow_mpix_s", "value": ..., "unit": "Mpix/s",
   "vs_baseline": ...}

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
    from octane_tpu.flow.variational import variational_flow

    h = w = 1024
    im1, im2 = synth_pair(h, w)
    zero = np.zeros((h, w), np.float32)
    cfg = OFConfig(kiters=4, alpha=5.0, lambda_=1.0)

    from octane_tpu.flow.variational import flow_program
    program = flow_program(cfg, (h, w), 1)
    g1 = jnp.asarray(im1[None])
    g2 = jnp.asarray(im2[None])
    z = jnp.asarray(zero)

    def run(i):
        # inputs vary per rep and the result is read back to host: guards
        # against any execution caching / async completion in the runtime
        u, v = program(g1, g2, z + jnp.float32(i) * 1e-6, z)
        return float(u.sum())

    run(0)  # warmup / compile
    n_rep = 12
    times = []
    for i in range(n_rep):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    # the TPU tunnel adds tens of ms of jitter per dispatch: min-of-N is the
    # faithful estimate of the steady-state per-pair time
    dt = min(times)

    mpix_s = (h * w / 1e6) / dt
    print(json.dumps({
        "metric": "variational_flow_mpix_s",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / NORTH_STAR_MPIX_S_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()

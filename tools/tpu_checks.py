"""On-TPU correctness checks (run manually: python tools/tpu_checks.py).

The CI test suite runs on CPU where the Pallas kernels are disabled; this
script verifies on real hardware that
  * the Pallas warp kernel is bit-exact vs the XLA gather sampler,
  * the full solve with Pallas kernels matches the solve without them.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp


def check_warp():
    from octane_tpu.ops.pallas.warp import make_pallas_warp
    from octane_tpu.flow.stencil import warp_bilinear_dense

    for hw in (512, 256):
        rng = np.random.default_rng(0)
        fields = jnp.asarray(rng.normal(0, 1, (6, hw, hw)).astype(np.float32))
        u = jnp.asarray(rng.uniform(-12, 12, (hw, hw)).astype(np.float32))
        v = jnp.asarray(rng.uniform(-12, 12, (hw, hw)).astype(np.float32))
        warp = make_pallas_warp((hw, hw))
        assert warp is not None, f"pallas warp unavailable at {hw}"
        got, gbx, gby = jax.jit(warp)(fields, u, v)
        want, bx, by = jax.jit(warp_bilinear_dense)(fields, u, v)
        d = float(jnp.abs(got - want).max())
        assert d == 0.0, f"warp mismatch {d} at {hw}"
        assert bool((gbx == bx).all() and (gby == by).all())
        print(f"warp {hw}: bit-exact")


def check_solver():
    from octane_tpu.config import OFConfig
    from octane_tpu.flow.variational import flow_program

    hw = 512
    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32)
    im1 = 200 * np.exp(-(((xx - 200) ** 2 + (yy - 256) ** 2) / 800.0)) + 30
    im2 = 200 * np.exp(-(((xx - 203) ** 2 + (yy - 256) ** 2) / 800.0)) + 30
    z = jnp.zeros((hw, hw), jnp.float32)
    args = (jnp.asarray(im1[None]), jnp.asarray(im2[None]), z, z)
    u1, v1 = flow_program(OFConfig(kiters=3, use_pallas=True), (hw, hw), 1)(*args)
    u2, v2 = flow_program(OFConfig(kiters=3, use_pallas=False), (hw, hw), 1)(*args)
    du = float(jnp.abs(u1 - u2).max())
    dvv = float(jnp.abs(v1 - v2).max())
    print(f"solver pallas-vs-xla: max |du|={du:.2e} |dv|={dvv:.2e}")
    assert du < 1e-4 and dvv < 1e-4


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    check_warp()
    check_solver()
    print("all TPU checks passed")

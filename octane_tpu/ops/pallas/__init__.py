"""Pallas TPU kernels.

Every kernel has identical semantics to its jnp counterpart (within the
documented displacement bounds) and is only selected on TPU backends.
"""

from octane_tpu.ops.pallas.warp import pallas_warp_available, make_pallas_warp

__all__ = ["pallas_warp_available", "make_pallas_warp"]

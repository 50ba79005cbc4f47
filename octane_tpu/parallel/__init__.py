"""Multi-chip spatial domain decomposition.

This is the headline new capability over the reference (which required one
GPU to hold the entire grid, SURVEY.md section 5): the H x W image grid is
sharded over a 2-D `jax.sharding.Mesh` ("dy", "dx").

Division of labour:
  * stencil shifts, blurs, gradients and CG reductions are expressed as
    slices/concats/sums -- XLA's SPMD partitioner turns these into
    collective-permute halo exchanges and psums automatically;
  * the flow-dependent bilinear warp gather is the one op GSPMD cannot
    localize, so it runs as an explicit `shard_map` kernel with ppermute
    halo exchange and a displacement clamp of +/-halo pixels
    (octane_tpu.parallel.sharded.make_sharded_warp).
"""

from octane_tpu.parallel.mesh import make_mesh, image_sharding, flow_sharding
from octane_tpu.parallel.halo import halo_pad2d
from octane_tpu.parallel.sharded import make_sharded_warp, sharded_variational_flow

__all__ = [
    "make_mesh", "image_sharding", "flow_sharding",
    "halo_pad2d", "make_sharded_warp", "sharded_variational_flow",
]

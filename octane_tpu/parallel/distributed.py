"""Multi-host execution: jax.distributed runtime + host-sharded ingest.

The reference is single-GPU/single-process; multi-host is a new capability.
Design (see SURVEY.md section 5 "long-context analog"): the full-disk grid is
row-sharded across hosts; each host reads only its row block of the input
files (hyperslab reads -- HDF5 handles partial IO natively), the global
device array is assembled with `jax.make_array_from_process_local_data`, and
from there the single-controller SPMD programs in
octane_tpu.parallel.sharded run unchanged -- halo traffic stays on ICI
inside a host's chips and crosses DCN only at host-boundary rows.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax

try:
    import h5py
except ImportError:                                    # pragma: no cover
    h5py = None

from octane_tpu.config import OFConfig
from octane_tpu.parallel.mesh import make_mesh, flow_sharding, image_sharding


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """Bring up the jax.distributed runtime (no-op for a single process)."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_row_block(h: int) -> Tuple[int, int]:
    """[row0, row1) of the global grid owned by this process (row sharding)."""
    p = jax.process_count()
    i = jax.process_index()
    rows = h // p
    r0 = i * rows
    r1 = h if i == p - 1 else r0 + rows
    return r0, r1


def read_counts_block(path: str, var: str, row_range: Tuple[int, int]) -> np.ndarray:
    """Hyperslab read of one variable's row block (host-sharded ingest)."""
    if h5py is None:
        raise RuntimeError("h5py is required for file ingest")
    with h5py.File(path, "r") as f:
        return np.asarray(f[var][row_range[0]:row_range[1], :])


def global_array_from_blocks(local_block: np.ndarray, global_shape, mesh):
    """Assemble the distributed global array from per-process row blocks."""
    sharding = (flow_sharding(mesh) if len(global_shape) == 2
                else image_sharding(mesh))
    return jax.make_array_from_process_local_data(
        sharding, local_block, global_shape)


def distributed_variational_flow(geo1_local, geo2_local, global_shape,
                                 cfg: OFConfig, mesh=None):
    """Multi-host entry: per-process local row blocks in, global flow out.

    Single-process callers can pass the full arrays (local == global).
    """
    from octane_tpu.parallel.sharded import sharded_variational_flow

    if mesh is None:
        mesh = make_mesh((jax.device_count(), 1))
    if geo1_local.ndim == 2:
        geo1_local = geo1_local[None]
        geo2_local = geo2_local[None]
    c = geo1_local.shape[0]
    gshape_img = (c,) + tuple(global_shape)
    geo1 = global_array_from_blocks(np.asarray(geo1_local, np.float32),
                                    gshape_img, mesh)
    geo2 = global_array_from_blocks(np.asarray(geo2_local, np.float32),
                                    gshape_img, mesh)
    h_loc, w = geo1_local.shape[-2:]
    zeros = np.zeros((h_loc, w), np.float32)
    u0 = global_array_from_blocks(zeros, tuple(global_shape), mesh)
    v0 = global_array_from_blocks(zeros, tuple(global_shape), mesh)
    return sharded_variational_flow(geo1, geo2, u0, v0, cfg, mesh)

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


def distributed_mesh(cfg: OFConfig):
    """(process_count * ry_local, rx) mesh: each process owns whole mesh
    rows, so row-block ingest matches the addressable shards and halo
    traffic crosses DCN only at host-boundary rows."""
    p = jax.process_count()
    n_local = jax.local_device_count()
    ry, rx = cfg.mesh_shape
    if ry * rx != p * n_local:
        # default: all local devices spread along columns
        return make_mesh((p, n_local))
    if ry % p != 0:
        raise ValueError(
            f"mesh rows {ry} must be a multiple of process count {p}")
    return make_mesh((ry, rx))


def run_pipeline_distributed(file1: str, file2: str, cfg: OFConfig,
                             outdir: str = "./") -> list:
    """Multi-process pipeline: host-sharded ingest -> SPMD flow + winds ->
    process-0 product write.

    Each process hyperslab-reads its row block and runs nav/cal on it; the
    global device arrays are assembled from the blocks; the solve and
    pix2uv run as the same SPMD programs as single-host; the final product
    fields are allgathered over DCN (bounded: int16/float32 product planes)
    and process 0 writes the netCDF.  GOES grids only; CTH/first-guess/
    interp extras stay single-host for now.
    """
    import os
    from jax.experimental import multihost_utils
    from octane_tpu.io.readers import read_scene
    from octane_tpu.io.writers import write_product
    from octane_tpu.parallel.post import sharded_pix2uv

    if cfg.grid != "goes":
        raise NotImplementedError("distributed pipeline is GOES-only")
    mesh = distributed_mesh(cfg)

    # global grid dims from the file header (cheap, every process)
    if h5py is None:
        raise RuntimeError("h5py is required for file ingest")
    with h5py.File(file1, "r") as f:
        h, w = f["Rad"].shape
        x_full = np.asarray(f["x"][()], np.int16)
        y_full = np.asarray(f["y"][()], np.int16)
    r0, r1 = host_row_block(h)

    scene1 = read_scene(file1, cfg, donav=True, channel=1, row_range=(r0, r1))
    scene2 = read_scene(file2, cfg, donav=False, channel=1, row_range=(r0, r1))
    scene1.nav.g2x_offset = scene2.nav.x_offset
    scene1.nav.g2y_offset = scene2.nav.y_offset
    cfg = cfg.replace(nchannels=scene1.nchannels)
    dt = scene2.t - scene1.t

    u, v = distributed_variational_flow(
        scene1.data, scene2.data, (h, w), cfg, mesh)
    uw, vw, ur, vr = sharded_pix2uv(u, v, scene1.nav, dt, mesh,
                                    grid=cfg.grid, pixuv=cfg.pixuv)

    # gather the product planes to every host (DCN allgather), write on 0
    def gather(a):
        return np.asarray(multihost_utils.process_allgather(
            a, tiled=True))

    scene1.u_pix = gather(u)
    scene1.v_pix = gather(v)
    scene1.u_wind = gather(uw)
    scene1.v_wind = gather(vw)
    scene1.u_raw = gather(ur)
    scene1.v_raw = gather(vr)
    scene1.raw_counts = gather_counts(scene1.raw_counts)
    scene1.x = x_full
    scene1.y = y_full
    scene1.dt = float(dt)

    written = []
    if jax.process_index() == 0:
        os.makedirs(outdir, exist_ok=True)
        outname = os.path.join(outdir, "outfile.nc")
        written.append(write_product(outname, scene1, cfg, interp=False))
    multihost_utils.sync_global_devices("octane_write_done")
    return written


def gather_counts(counts_local: np.ndarray) -> np.ndarray:
    """Allgather per-process (C, rows_local, W) raw-count blocks along rows."""
    from jax.experimental import multihost_utils
    out = []
    for c in range(counts_local.shape[0]):
        out.append(np.asarray(multihost_utils.process_allgather(
            counts_local[c], tiled=True)))
    return np.stack(out, axis=0)

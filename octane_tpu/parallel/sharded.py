"""Spatially sharded variational flow.

The per-level solver program is identical to the single-device one -- XLA's
SPMD partitioner localizes every shift/blur/reduction given sharded inputs --
except the flow-dependent warp gather, which is swapped for a shard_map
kernel: each shard pads its block with a +/-``halo``-pixel ppermute halo and
gathers locally, with displacements clamped to the halo (exact whenever
max |flow| < halo - 2 at that pyramid level, which coarse-to-fine guarantees
for physically plausible motion; the halo is configurable via
OFConfig.halo_warp).

Levels whose size does not divide the mesh fall back to the dense gather,
which GSPMD handles with collectives (correct, slower).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from octane_tpu.config import OFConfig
from octane_tpu.core.zoom import pyramid_downsample, zoom_in_flow, zoom_size
from octane_tpu.flow.variational import solve_level
from octane_tpu.parallel.halo import halo_pad2d
from octane_tpu.parallel.mesh import image_sharding, flow_sharding

_warp_cache = {}


def make_sharded_warp(mesh, global_hw: Tuple[int, int], halo: int):
    """Build a warp sampler (same signature as warp_bilinear_dense) that
    gathers from a halo-padded local block inside shard_map."""
    key = (id(mesh), global_hw, halo)
    if key in _warp_cache:
        return _warp_cache[key]
    gh, gw = global_hw
    ry = mesh.shape["dy"]
    rx = mesh.shape["dx"]
    hl, wl = gh // ry, gw // rx
    halo = min(halo, hl, wl)
    if halo < 4:
        # displacement reach (halo - 2) would be degenerate; caller falls
        # back to the dense gather, which GSPMD handles with collectives
        return None

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, "dy", "dx"), P("dy", "dx"), P("dy", "dx")),
        out_specs=(P(None, "dy", "dx"), P("dy", "dx"), P("dy", "dx")),
    )
    def warp(fields, u, v):
        k = fields.shape[0]
        gy0 = (lax.axis_index("dy") * hl).astype(jnp.float32)
        gx0 = (lax.axis_index("dx") * wl).astype(jnp.float32)
        ii = gx0 + jnp.arange(wl, dtype=jnp.float32)[None, :]
        jj = gy0 + jnp.arange(hl, dtype=jnp.float32)[:, None]
        px_true = ii + u
        py_true = jj + v
        bc_x = (px_true < 0.0) | (px_true >= gw)
        bc_y = (py_true < 0.0) | (py_true >= gh)
        # clamp the displacement to the halo reach (documented approximation)
        reach = float(halo - 2)
        px = ii + jnp.clip(u, -reach, reach)
        py = jj + jnp.clip(v, -reach, reach)
        # conditional global clamp (oct_bc semantics)
        px = jnp.where(px < 0.0, 0.0, jnp.where(px >= gw, float(gw - 1), px))
        py = jnp.where(py < 0.0, 0.0, jnp.where(py >= gh, float(gh - 1), py))
        iv1 = jnp.minimum(px.astype(jnp.int32), gw - 2)
        jv1 = jnp.minimum(py.astype(jnp.int32), gh - 2)
        p1 = (iv1 + 1).astype(jnp.float32) - px
        p2 = px - iv1.astype(jnp.float32)
        p3 = (jv1 + 1).astype(jnp.float32) - py
        p4 = py - jv1.astype(jnp.float32)

        fpad = halo_pad2d(fields, halo)                 # (K, hl+2h, wl+2h)
        wp = wl + 2 * halo
        hp = hl + 2 * halo
        li = jnp.clip(iv1 - gx0.astype(jnp.int32) + halo, 0, wp - 2)
        lj = jnp.clip(jv1 - gy0.astype(jnp.int32) + halo, 0, hp - 2)
        flat = fpad.reshape(k, -1)
        idx = (lj * wp + li).reshape(-1)

        def take(off):
            return jnp.take(flat, idx + off, axis=1).reshape(k, hl, wl)

        f11, f21, f12, f22 = take(0), take(1), take(wp), take(wp + 1)
        samples = p3 * (p1 * f11 + p2 * f21) + p4 * (p1 * f12 + p2 * f22)
        return samples, bc_x, bc_y

    _warp_cache[key] = warp
    return warp


_sharded_program_cache = {}


def sharded_flow_program(cfg: OFConfig, shape, nchan: int, mesh):
    """One jitted SPMD program for the whole coarse-to-fine solve over the
    mesh (single dispatch; XLA inserts halo collectives for the stencils
    and the shard_map warp kernels handle the gathers)."""
    from octane_tpu.flow.variational import _coarse_to_fine, flow_program

    h, w = shape
    key = (id(mesh), shape, nchan, cfg.alpha, cfg.lambda_, cfg.lambdac,
           cfg.scale_factor, cfg.kiters, cfg.liters, cfg.cgiters,
           cfg.gnc_steps, cfg.dozim, cfg.solver, cfg.cg_tol, cfg.halo_warp)
    if key in _sharded_program_cache:
        return _sharded_program_cache[key]

    ry = mesh.shape["dy"]
    rx = mesh.shape["dx"]
    warp_fns = {}
    for k in range(cfg.kiters):
        factor = float(np.float32(cfg.scale_factor) ** (cfg.kiters - k - 1))
        nxx, nyy = zoom_size(w, factor), zoom_size(h, factor)
        if nyy % ry == 0 and nxx % rx == 0 and ry * rx > 1:
            wf = make_sharded_warp(mesh, (nyy, nxx), cfg.halo_warp)
            if wf is not None:
                warp_fns[k] = wf

    fsh = flow_sharding(mesh)
    program = jax.jit(
        functools.partial(_coarse_to_fine, cfg=cfg, warp_fns=warp_fns),
        out_shardings=(fsh, fsh),
    )
    _sharded_program_cache[key] = program
    return program


def sharded_variational_flow(geo1, geo2, u0, v0, cfg: OFConfig, mesh):
    """Coarse-to-fine variational flow over a ("dy", "dx") device mesh.

    Same level schedule as octane_tpu.flow.variational.variational_flow,
    compiled as one SPMD program with spatially sharded inputs.
    """
    geo1 = jnp.asarray(geo1, jnp.float32)
    geo2 = jnp.asarray(geo2, jnp.float32)
    if geo1.ndim == 2:
        geo1 = geo1[None]
        geo2 = geo2[None]
    ish = image_sharding(mesh)
    fsh = flow_sharding(mesh)
    geo1 = jax.device_put(geo1, ish)
    geo2 = jax.device_put(geo2, ish)
    u0 = jax.device_put(jnp.asarray(u0, jnp.float32), fsh)
    v0 = jax.device_put(jnp.asarray(v0, jnp.float32), fsh)
    program = sharded_flow_program(cfg, u0.shape, geo1.shape[0], mesh)
    return program(geo1, geo2, u0, v0)

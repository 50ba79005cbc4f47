"""In-memory data model.

Replaces the reference's mutable blackboard objects ``GOESNAVVar`` /
``GOESVar`` / ``Image`` (include/goesread.h:3-57, include/image.h:3-24) with
explicit dataclasses.  Unlike the reference, pipeline stages return new
fields instead of mutating a shared struct, so each stage is a pure function
that jit/shard cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class NavConstants:
    """Projection + calibration constants (reference GOESNAVVar, goesread.h:3-14)."""

    grid: str = "goes"                # "goes" | "polar" | "mercator"
    nx: int = 0
    ny: int = 0
    # fixed-grid projection
    x_scale: float = 0.0              # rad / count
    x_offset: float = 0.0
    y_scale: float = 0.0
    y_offset: float = 0.0
    req: float = 6378137.0            # GRS80 semi-major (m)
    rpol: float = 6356752.31414       # GRS80 semi-minor (m)
    pph: float = 35786023.0           # perspective point height (m)
    lam0: float = 0.0                 # longitude of projection origin (rad)
    lpo: float = 0.0                  # same, degrees (as read)
    lat0: float = 0.0
    inverse_flattening: float = 298.2572221
    gip_val: float = 0.0
    # second-image offsets (sector-move guard, oct_pix2uv_cuda.cu:295)
    g2x_offset: float = 0.0
    g2y_offset: float = 0.0
    # polar / mercator grids (oct_polar_navcal_cuda.cu, oct_merc_navcal_cuda.cu)
    lat1: float = 0.0                 # polar reference latitude (deg)
    lon0_deg: float = 0.0             # polar reference longitude (deg)
    lon1: float = 0.0                 # mercator reference longitude (rad)
    R: float = 6371000.0              # sphere radius (m)
    # per-channel calibration (up to 3 channels)
    rad_scale: tuple = (1.0, 1.0, 1.0)
    rad_offset: tuple = (0.0, 0.0, 0.0)
    fk1: tuple = (0.0, 0.0, 0.0)
    fk2: tuple = (0.0, 0.0, 0.0)
    bc1: tuple = (0.0, 0.0, 0.0)
    bc2: tuple = (0.0, 0.0, 0.0)
    kap1: tuple = (0.0, 0.0, 0.0)
    # subset bookkeeping (reference keeps full-grid offsets; subsetting was
    # moved out of the tool but the fields survive: oct_fileread.cc:266-340)
    min_x: int = 0
    min_y: int = 0
    max_x: int = 0
    max_y: int = 0
    min_xc: int = 0
    min_yc: int = 0
    max_xc: int = 0
    max_yc: int = 0
    cth_nx: int = 0
    cth_ny: int = 0


@dataclasses.dataclass
class Scene:
    """One satellite image + derived products (reference GOESVar).

    ``data`` is the normalized [0,255] float image stack (C, H, W); raw count
    arrays and scan coordinates are kept for product output.
    """

    nav: NavConstants
    data: np.ndarray                         # (C, H, W) float32, normalized
    t: float = 0.0                           # J2000 epoch seconds (image time)
    t_units: str = ""
    band: tuple = (0, 0, 0)
    x: Optional[np.ndarray] = None           # (W,) int16 scan-coordinate counts
    y: Optional[np.ndarray] = None           # (H,) int16
    raw_counts: Optional[np.ndarray] = None  # (C, H, W) int16 (dataSVal)
    lat: Optional[np.ndarray] = None         # (H, W) degrees
    lon: Optional[np.ndarray] = None
    cth: Optional[np.ndarray] = None         # (H, W) cloud-top height (m)
    ufg: Optional[np.ndarray] = None         # (H, W) first-guess winds (m/s)
    vfg: Optional[np.ndarray] = None
    norm_ranges: tuple = ((0.0, 255.0),) * 3  # per-channel (min, max) used at ingest
    # flow products
    u_pix: Optional[np.ndarray] = None       # (H, W) float pixel displacement
    v_pix: Optional[np.ndarray] = None
    u_wind: Optional[np.ndarray] = None      # (H, W) int16, 100 * m/s
    v_wind: Optional[np.ndarray] = None
    u_ms: Optional[np.ndarray] = None        # (H, W) float m/s (flat-grid output)
    v_ms: Optional[np.ndarray] = None
    u_raw: Optional[np.ndarray] = None       # (H, W) int16, 100 * pixels
    v_raw: Optional[np.ndarray] = None
    ctp: Optional[np.ndarray] = None         # (H, W) int16 motion-vector height
    occlusion: Optional[np.ndarray] = None   # (H, W) int16 (temporal interp)
    dt: float = 0.0                          # t2 - t1 seconds
    frdt: float = 0.0                        # interpolation fraction
    t_interp: float = 0.0                    # interpolated frame time

    @property
    def shape(self):
        return self.data.shape[-2], self.data.shape[-1]

    @property
    def nchannels(self):
        return self.data.shape[0]

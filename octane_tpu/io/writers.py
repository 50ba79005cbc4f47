"""Product file writer (netCDF4-compatible HDF5 via h5py).

Replicates the reference's output variable/attribute schema
(oct_goeswrite, oct_filewrite.cc:17-349) so products are drop-in comparable:

  x, y (int16 + scale/offset), t (double, units attr), U/V (int16, 100*m/s),
  U_raw/V_raw (int16, 100*pixels), Upix/Vpix (float, optional), CTP (int16),
  Occlusion (int16, interp products), Rad[/2/3] (int16 counts),
  goes_imager_projection (int + projection attrs), optical_flow_settings
  (int + every solver hyper-parameter as attrs), planck_* / kappa0 scalars.

Files are written as HDF5 with netCDF-style dimension scales so standard
netCDF4 readers open them.
"""

from __future__ import annotations

import numpy as np

try:
    import h5py
except ImportError:                                    # pragma: no cover
    h5py = None

from octane_tpu.config import OFConfig
from octane_tpu.io.datamodel import Scene


class RowBlockSource:
    """Lazy 2-D product variable assembled from per-process row-block part
    files: the writer streams one block at a time into the final dataset,
    so merging a full-disk product never materializes more than one row
    block per variable (octane_tpu.parallel.distributed writes the parts
    in parallel, one per host)."""

    def __init__(self, parts, name, shape, dtype):
        self.parts = parts          # [(path, row0, row1), ...]
        self.name = name
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)

    def blocks(self):
        for path, r0, r1 in self.parts:
            with h5py.File(path, "r") as f:
                yield slice(r0, r1), np.asarray(f[self.name][()], self.dtype)


class RowBlockStack:
    """Channel-stacked view over RowBlockSources (raw_counts)."""

    def __init__(self, sources):
        self.sources = list(sources)
        self.shape = (len(self.sources),) + self.sources[0].shape

    def __getitem__(self, c):
        return self.sources[c]


def _asarray(data, dtype):
    return data if isinstance(data, RowBlockSource) else np.asarray(data, dtype)


def _dimvar(f, name, data, scale=None, offset=None):
    d = f.create_dataset(name, data=data)
    d.make_scale(name)
    if scale is not None:
        d.attrs["scale_factor"] = np.float32(scale)
        d.attrs["add_offset"] = np.float32(offset)
    return d


def _var2d(f, name, data, xdim, ydim, **attrs):
    if isinstance(data, RowBlockSource):
        d = f.create_dataset(name, shape=data.shape, dtype=data.dtype)
        for sl, blk in data.blocks():
            d[sl] = blk
    else:
        d = f.create_dataset(name, data=data)
    d.dims[0].attach_scale(ydim)
    d.dims[1].attach_scale(xdim)
    for k, v in attrs.items():
        d.attrs[k] = v
    return d


def write_product(path: str, scene: Scene, cfg: OFConfig,
                  interp: bool = False) -> str:
    """Write the flow product for ``scene``; returns the path."""
    if h5py is None:
        raise RuntimeError("h5py is required for product output")
    if cfg.grid != "goes":
        return _write_flat_product(path, scene, cfg, interp)
    nav = scene.nav
    h, w = nav.ny, nav.nx
    with h5py.File(path, "w") as f:
        x = scene.x if scene.x is not None else np.arange(w, dtype=np.int16)
        y = scene.y if scene.y is not None else np.arange(h, dtype=np.int16)
        xd = _dimvar(f, "x", np.asarray(x, np.int16), nav.x_scale, nav.x_offset)
        yd = _dimvar(f, "y", np.asarray(y, np.int16), nav.y_scale, nav.y_offset)

        t = f.create_dataset("t", data=np.float64(scene.t_interp if interp else scene.t))
        t.attrs["standard_name"] = "time"
        t.attrs["units"] = scene.t_units
        t.attrs["axis"] = "T"
        t.attrs["bounds"] = "time_bounds"
        t.attrs["long_name"] = (
            "J2000 epoch mid-point between the start and end image scan in seconds")
        if interp:
            t.attrs["frdt"] = np.float32(scene.frdt)

        units_uv = "meters per second" if not cfg.pixuv else "x-pixels"
        if cfg.out_nav and scene.u_wind is not None:
            _var2d(f, "U", _asarray(scene.u_wind, np.int16), xd, yd,
                   long_name="U", grid_mapping="goes_imager_projection",
                   scale_factor=np.float32(0.01), units=units_uv)
            _var2d(f, "V", _asarray(scene.v_wind, np.int16), xd, yd,
                   long_name="V", grid_mapping="goes_imager_projection",
                   scale_factor=np.float32(0.01),
                   units="meters per second" if not cfg.pixuv else "y-pixels")
        if cfg.out_raw and scene.u_raw is not None:
            _var2d(f, "U_raw", _asarray(scene.u_raw, np.int16), xd, yd,
                   long_name="U Raw", grid_mapping="goes_imager_projection",
                   scale_factor=np.float32(0.01), units="x-pixels")
            _var2d(f, "V_raw", _asarray(scene.v_raw, np.int16), xd, yd,
                   long_name="V Raw", grid_mapping="goes_imager_projection",
                   scale_factor=np.float32(0.01), units="y-pixels")
        if cfg.pixuv and scene.u_pix is not None:
            _var2d(f, "Upix", _asarray(scene.u_pix, np.float32), xd, yd,
                   long_name="Upix", grid_mapping="goes_imager_projection")
            _var2d(f, "Vpix", _asarray(scene.v_pix, np.float32), xd, yd,
                   long_name="Vpix", grid_mapping="goes_imager_projection")
        if interp and scene.occlusion is not None:
            _var2d(f, "Occlusion", _asarray(scene.occlusion, np.int16), xd, yd,
                   long_name="Occlusion Masks",
                   key="0 - both, 1 - only in image 1, 2 - only in image 2")
        if cfg.out_ctp and cfg.do_cth and scene.ctp is not None:
            _var2d(f, "CTP", _asarray(scene.ctp, np.int16), xd, yd,
                   long_name="CTP", grid_mapping="goes_imager_projection",
                   interpcth=np.float32(1.0 if cfg.interp_cth_bicubic else 0.0))
        if cfg.out_rad and scene.raw_counts is not None:
            names = ["Rad", "Rad2", "Rad3"]
            for c in range(scene.raw_counts.shape[0]):
                _var2d(f, names[c], _asarray(scene.raw_counts[c], np.int16),
                       xd, yd, long_name=names[c],
                       grid_mapping="goes_imager_projection",
                       scale_factor=np.float32(nav.rad_scale[c]),
                       add_offset=np.float32(nav.rad_offset[c]))
                for nm, tup in (("planck_fk1", nav.fk1), ("planck_fk2", nav.fk2),
                                ("planck_bc1", nav.bc1), ("planck_bc2", nav.bc2),
                                ("kappa0", nav.kap1)):
                    suffix = "" if c == 0 else f"_{c + 1}"
                    f.create_dataset(nm + suffix, data=np.float32(tup[c]))

        gip = f.create_dataset("goes_imager_projection", data=np.int32(0))
        gip.attrs["long_name"] = "GOES-R ABI fixed grid projection"
        gip.attrs["grid_mapping_name"] = "geostationary"
        gip.attrs["perspective_point_height"] = np.float64(nav.pph)
        gip.attrs["semi_major_axis"] = np.float64(nav.req)
        gip.attrs["semi_minor_axis"] = np.float64(nav.rpol)
        gip.attrs["inverse_flattening"] = np.float64(nav.inverse_flattening)
        gip.attrs["latitude_of_projection_origin"] = np.float64(nav.lat0)
        gip.attrs["longitude_of_projection_origin"] = np.float64(nav.lpo)
        gip.attrs["sweep_angle_axis"] = "x"

        ofv = f.create_dataset("optical_flow_settings", data=np.int32(cfg.oftype))
        ofv.attrs["long_name"] = "Optical Flow Settings"
        ofv.attrs["key"] = ("1 = Modified Zimmer et al. (2011), 2 = Farneback, "
                            "3 = Brox (2004), 4 = Least Squares")
        ofv.attrs["Image2_xOffset"] = np.float32(nav.g2x_offset)
        ofv.attrs["Image2_yOffset"] = np.float32(nav.g2y_offset)
        nmin, nmax = scene.norm_ranges[0]
        if cfg.oftype in (1, 3):
            # full reference attr set, in schema order (oct_filewrite.cc:
            # 239-251); filtsigma/M_Iterations are deprecated echo-only
            # knobs and NormMax/NormMin the channel-1 normalization range
            # actually used at ingest (oct_fileread.cc:341-359)
            ofv.attrs["lambda"] = np.float64(cfg.lambda_)
            ofv.attrs["lambdac"] = np.float64(cfg.lambdac)
            ofv.attrs["alpha"] = np.float64(cfg.alpha)
            ofv.attrs["filtsigma"] = np.float64(cfg.filtsigma)
            ofv.attrs["ScaleF"] = np.float64(cfg.scale_factor)
            ofv.attrs["K_Iterations"] = np.int32(cfg.kiters)
            ofv.attrs["L_Iterations"] = np.int32(cfg.liters)
            ofv.attrs["M_Iterations"] = np.int32(cfg.miters)
            ofv.attrs["CG_Iterations"] = np.int32(cfg.cgiters)
            ofv.attrs["NormMax"] = np.float32(nmax)
            ofv.attrs["NormMin"] = np.float32(nmin)
            ofv.attrs["dofirstguess"] = np.int32(1 if cfg.do_firstguess else 0)
            # extension beyond the reference schema: which relaxer produced
            # the flow (provenance for the promoted production SOR path)
            ofv.attrs["solver"] = cfg.solver
            if cfg.solver == "sor":
                ofv.attrs["sor_omega"] = np.float64(cfg.sor_omega)
        if cfg.oftype == 4:
            ofv.attrs["Rad"] = np.int32(cfg.rad)
            ofv.attrs["SRad"] = np.int32(cfg.srad)
            ofv.attrs["NormMax"] = np.float32(nmax)
            ofv.attrs["NormMin"] = np.float32(nmin)
        ofv.attrs["dt_seconds"] = np.float32(scene.dt)
    return path


def _write_flat_product(path: str, scene: Scene, cfg: OFConfig,
                        interp: bool) -> str:
    """Polar / mercator product writer (oct_polarwrite, oct_filewrite.cc:
    353-563; oct_mercwrite, :565-704): U/V stored as full-precision doubles
    ("important for slow motions", ref :352), Rad as float, plus the grid's
    projection variable."""
    nav = scene.nav
    polar = cfg.grid == "polar"
    gmap = "polar_orthonormal" if polar else "Mercator Sphere"
    with h5py.File(path, "w") as f:
        xd = _dimvar(f, "x", np.asarray(scene.x, np.int16),
                     nav.x_scale, nav.x_offset)
        yd = _dimvar(f, "y", np.asarray(scene.y, np.int16),
                     nav.y_scale, nav.y_offset)
        t = f.create_dataset("t", data=np.float64(
            scene.t_interp if interp else scene.t))
        t.attrs["standard_name"] = "time"
        t.attrs["units"] = scene.t_units
        t.attrs["axis"] = "T"
        t.attrs["long_name"] = (
            "J2000 epoch mid-point between the start and end image scan in seconds")
        if interp:
            t.attrs["frdt"] = np.float32(scene.frdt)

        if scene.u_ms is not None:
            _var2d(f, "U", _asarray(scene.u_ms, np.float64), xd, yd,
                   long_name="U", grid_mapping=gmap,
                   units="meters per second" if not cfg.pixuv else "x-pixels")
            _var2d(f, "V", _asarray(scene.v_ms, np.float64), xd, yd,
                   long_name="V", grid_mapping=gmap,
                   units="meters per second" if not cfg.pixuv else "y-pixels")
        if scene.u_pix is not None and (cfg.pixuv or scene.u_ms is None):
            _var2d(f, "Upix", _asarray(scene.u_pix, np.float32), xd, yd,
                   long_name="Upix", grid_mapping=gmap)
            _var2d(f, "Vpix", _asarray(scene.v_pix, np.float32), xd, yd,
                   long_name="Vpix", grid_mapping=gmap)
        if interp and scene.occlusion is not None:
            _var2d(f, "Occlusion", _asarray(scene.occlusion, np.int16),
                   xd, yd, long_name="Occlusion Masks",
                   key="0 - both, 1 - only in image 1, 2 - only in image 2")
        if cfg.out_rad and scene.raw_counts is not None:
            names = ["Rad", "Rad2", "Rad3"]
            for c in range(scene.raw_counts.shape[0]):
                _var2d(f, names[c], _asarray(scene.raw_counts[c], np.float32),
                       xd, yd, long_name=names[c], grid_mapping=gmap)

        gname = "polar_imager_projection" if polar else "merc_imager_projection"
        gip = f.create_dataset(gname, data=np.int32(0))
        if polar:
            gip.attrs["long_name"] = "Polar_Orthonormal_Grid"
            gip.attrs["grid_mapping_name"] = "polar"
            gip.attrs["lat1"] = np.float64(nav.lat1)
            gip.attrs["lon0"] = np.float64(nav.lon0_deg)
        else:
            gip.attrs["long_name"] = "Mercator_Grid"
            gip.attrs["lon1"] = np.float64(nav.lon1 / (np.pi / 180.0))
        gip.attrs["R"] = np.float64(nav.R)

        ofv = f.create_dataset("optical_flow_settings", data=np.int32(cfg.oftype))
        ofv.attrs["long_name"] = "Optical Flow Settings"
        ofv.attrs["key"] = ("1 = Modified Sun (2014), 2 = Farneback, "
                            "3 = Brox (2004)")
        if cfg.oftype in (1, 3):
            # flat-grid twin of the GOES attr set (oct_filewrite.cc:475-490
            # polar, :657-670 mercator)
            nmin, nmax = scene.norm_ranges[0]
            ofv.attrs["lambda"] = np.float64(cfg.lambda_)
            ofv.attrs["lambdac"] = np.float64(cfg.lambdac)
            ofv.attrs["alpha"] = np.float64(cfg.alpha)
            ofv.attrs["filtsigma"] = np.float64(cfg.filtsigma)
            ofv.attrs["ScaleF"] = np.float64(cfg.scale_factor)
            ofv.attrs["K_Iterations"] = np.int32(cfg.kiters)
            ofv.attrs["L_Iterations"] = np.int32(cfg.liters)
            ofv.attrs["M_Iterations"] = np.int32(cfg.miters)
            ofv.attrs["CG_Iterations"] = np.int32(cfg.cgiters)
            ofv.attrs["NormMax"] = np.float32(nmax)
            ofv.attrs["NormMin"] = np.float32(nmin)
            ofv.attrs["dofirstguess"] = np.int32(1 if cfg.do_firstguess else 0)
        ofv.attrs["dt_seconds"] = np.float32(scene.dt)
    return path

"""Synthetic GOES-R L1b file builder for IO / pipeline tests."""

import math

import numpy as np
import h5py

G16_PROJ = dict(
    longitude_of_projection_origin=-75.0,
    semi_major_axis=6378137.0,
    semi_minor_axis=6356752.31414,
    inverse_flattening=298.2572221,
    latitude_of_projection_origin=0.0,
    perspective_point_height=35786023.0,
)


def make_goes_file(path, counts, band=13, t=650000000.0,
                   rad_scale=0.01, rad_offset=-0.5,
                   x_scale=5.6e-05, x_offset=None, y_scale=-5.6e-05,
                   y_offset=None):
    """Write a GOES-R L1b-like HDF5/netCDF4 file with the variables and
    attributes the reader ingests (oct_fileread.cc:99-263)."""
    h, w = counts.shape
    # half-pixel offset so no scan coordinate is EXACTLY zero: real GOES
    # offsets never are, and the reference's `sz == 0` off-earth guard
    # (oct_pix2uv_cuda.cu:119) is FMA-contraction-sensitive at exact zeros
    if x_offset is None:
        x_offset = -x_scale * (w / 2 - 0.5)
    if y_offset is None:
        y_offset = -y_scale * (h / 2 - 0.5)
    with h5py.File(path, "w") as f:
        d = f.create_dataset("Rad", data=np.asarray(counts, np.int16))
        d.attrs["scale_factor"] = np.float32(rad_scale)
        d.attrs["add_offset"] = np.float32(rad_offset)
        x = f.create_dataset("x", data=np.arange(w, dtype=np.int16))
        x.attrs["scale_factor"] = np.float32(x_scale)
        x.attrs["add_offset"] = np.float32(x_offset)
        y = f.create_dataset("y", data=np.arange(h, dtype=np.int16))
        y.attrs["scale_factor"] = np.float32(y_scale)
        y.attrs["add_offset"] = np.float32(y_offset)
        tv = f.create_dataset("t", data=np.float64(t))
        tv.attrs["units"] = "seconds since 2000-01-01 12:00:00"
        f.create_dataset("band_id", data=np.int8(band))
        gip = f.create_dataset("goes_imager_projection", data=np.int32(0))
        for k, v in G16_PROJ.items():
            gip.attrs[k] = np.float64(v)
        f.create_dataset("planck_fk1", data=np.float32(10803.3))
        f.create_dataset("planck_fk2", data=np.float32(1392.74))
        f.create_dataset("planck_bc1", data=np.float32(0.07544))
        f.create_dataset("planck_bc2", data=np.float32(0.99975))
        f.create_dataset("kappa0", data=np.float32(0.0015))
    return path


def make_cth_file(path, cth):
    with h5py.File(path, "w") as f:
        f.create_dataset("Cloud_Top_Height_Effective", data=np.asarray(cth, np.float32))
    return path


def make_firstguess_file(path, ufg, vfg):
    with h5py.File(path, "w") as f:
        f.create_dataset("UFG", data=np.asarray(ufg, np.float32))
        f.create_dataset("VFG", data=np.asarray(vfg, np.float32))
    return path


def blob_counts(h, w, cx, cy, amp=12000, sigma=6.0, base=2000):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = base + amp * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sigma ** 2)))
    return img.astype(np.int16)


def make_flat_grid_file(path, data, grid="polar", t=650000000.0,
                        x_scale=1000.0, y_scale=1000.0,
                        lat1=90.0, lon0=0.0, lon1=0.0, R=6371000.0):
    """Polar / mercator input file per oct_polarread / oct_mercread:
    float Rad, int16 x/y (projected metres via scale/offset), a grid_mapping
    variable with lat1/lon0/R or lon1/R, and t."""
    h, w = data.shape
    with h5py.File(path, "w") as f:
        f.create_dataset("Rad", data=np.asarray(data, np.float32))
        x = f.create_dataset("x", data=np.arange(w, dtype=np.int16))
        x.attrs["scale_factor"] = np.float32(x_scale)
        x.attrs["add_offset"] = np.float32(-x_scale * w / 2)
        y = f.create_dataset("y", data=np.arange(h, dtype=np.int16))
        y.attrs["scale_factor"] = np.float32(y_scale)
        y.attrs["add_offset"] = np.float32(-y_scale * h / 2)
        tv = f.create_dataset("t", data=np.float64(t))
        tv.attrs["units"] = "seconds since 2000-01-01 12:00:00"
        gm = f.create_dataset("grid_mapping", data=np.int32(0))
        gm.attrs["R"] = np.float32(R)
        if grid == "polar":
            gm.attrs["lat1"] = np.float32(lat1)
            gm.attrs["lon0"] = np.float32(lon0)
        else:
            gm.attrs["lon1"] = np.float32(lon1)
    return path

"""Data model and file IO (HDF5/netCDF4-compatible readers and writers)."""

from octane_tpu.io.datamodel import NavConstants, Scene
from octane_tpu.io.readers import read_scene, read_cth, read_first_guess
from octane_tpu.io.writers import write_product

__all__ = [
    "NavConstants", "Scene",
    "read_scene", "read_cth", "read_first_guess",
    "write_product",
]

"""Geodesy and calibration: fixed-grid / polar / mercator navigation,
Planck & kappa calibration, limb filtering, and pixel<->wind conversion."""

from octane_tpu.nav.goes import (
    goes_latlon,
    goes_xy_from_latlon,
    planck_temp,
    kappa_reflectance,
    limb_ramp,
    navcal_goes,
)
from octane_tpu.nav.polar import polar_latlon
from octane_tpu.nav.mercator import mercator_latlon
from octane_tpu.nav.winds import pix2uv, pix2uv_ms, uv2pix, haversine_m

__all__ = [
    "goes_latlon", "goes_xy_from_latlon", "planck_temp", "kappa_reflectance",
    "limb_ramp", "navcal_goes", "polar_latlon", "mercator_latlon",
    "pix2uv", "pix2uv_ms", "uv2pix", "haversine_m",
]

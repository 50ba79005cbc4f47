"""Post-processing: bilateral flow smoothing and temporal frame interpolation."""

from octane_tpu.post.srsal import srsal_smooth
from octane_tpu.post.temporal import interpolate_frame

__all__ = ["srsal_smooth", "interpolate_frame"]

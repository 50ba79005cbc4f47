"""Utilities: profiling, logging, provenance."""

from octane_tpu.utils.profiling import StageTimer, trace

__all__ = ["StageTimer", "trace"]

"""Multi-frame sequence processing with warm starts and checkpoint/resume.

The reference's only sequence mechanism is the -firstguess flag: a previous
product's navigated winds seed the next solve (main.cc:274-278,
oct_fileread.cc:817-868, oct_optical_flow.cc:52).  This module makes that a
first-class mode (BASELINE config 5: N-frame rapid-scan loops):

  * consecutive pairs are solved sequentially, each warm-started from the
    previous pair's flow (optionally weighted into the energy via the
    lambdac hinting term, exactly the reference's mechanism);
  * after each pair the flow state is checkpointed to HDF5, so long jobs
    resume mid-sequence -- a capability the reference lacks entirely
    (SURVEY.md section 5, "Checkpoint / resume: none");
  * optional temporal interpolation between each pair.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

try:
    import h5py
except ImportError:                                    # pragma: no cover
    h5py = None

from octane_tpu.config import OFConfig
from octane_tpu.flow.dispatcher import compute_flow
from octane_tpu.io.readers import read_scene
from octane_tpu.io.writers import write_product
from octane_tpu.pipeline import interpolate_sequence


def _cfg_key(cfg: OFConfig) -> str:
    """Fingerprint of the settings that must not change across a resume."""
    import hashlib
    return hashlib.sha256(repr(cfg).encode()).hexdigest()


def _save_checkpoint(path: str, index: int, u: np.ndarray, v: np.ndarray,
                     key: str, files_done: List[str]):
    tmp = path + ".tmp"
    with h5py.File(tmp, "w") as f:
        f.create_dataset("pair_index", data=np.int64(index))
        f.create_dataset("u_pix", data=np.asarray(u, np.float32))
        f.create_dataset("v_pix", data=np.asarray(v, np.float32))
        f.attrs["cfg_key"] = key
        f.attrs["files_done"] = "\n".join(files_done)
    os.replace(tmp, path)        # atomic: a kill mid-save keeps the old one


def _load_checkpoint(path: str, key: str = None, files: List[str] = None):
    if not os.path.exists(path):
        return None
    with h5py.File(path, "r") as f:
        def _s(a):
            return a.decode() if isinstance(a, bytes) else str(a)

        if key is not None and _s(f.attrs.get("cfg_key", "")) != key:
            raise ValueError(
                "checkpoint was written by a run with different solver "
                "settings; delete it (or rerun with the original settings) "
                f"to resume: {path}")
        idx = int(f["pair_index"][()])
        if files is not None:
            done = _s(f.attrs.get("files_done", "")).split("\n")
            if done != list(files[:len(done)]):
                raise ValueError(
                    "checkpoint was written against a different frame list "
                    f"(appending new frames is fine; reordering is not): {path}")
        return (idx,
                np.asarray(f["u_pix"][()]),
                np.asarray(f["v_pix"][()]))


def run_sequence(
    files: List[str],
    cfg: OFConfig,
    outdir: str = "./",
    checkpoint: Optional[str] = None,
    warm_start: bool = True,
    interp_dir: str = "./interpolation",
) -> List[str]:
    """Process consecutive pairs of ``files``; returns the products written.

    With ``checkpoint`` set, the flow state is saved after each pair and a
    rerun resumes from the first unprocessed pair.
    """
    if len(files) < 2:
        raise ValueError("a sequence needs at least two frames")
    os.makedirs(outdir, exist_ok=True)
    written: List[str] = []
    start = 0
    u_prev = v_prev = None
    key = _cfg_key(cfg)
    if checkpoint:
        state = _load_checkpoint(checkpoint, key, files)
        if state is not None:
            start, u_prev, v_prev = state
            start += 1

    scene1 = read_scene(files[start], cfg, donav=True)
    for i in range(start, len(files) - 1):
        scene2 = read_scene(files[i + 1], cfg, donav=False)
        if cfg.grid == "goes":
            scene1.nav.g2x_offset = scene2.nav.x_offset
            scene1.nav.g2y_offset = scene2.nav.y_offset
        # the previous pair's pixel flow seeds the solver (and the hinting
        # term when cfg.lambdac > 0) -- the reference's first-guess path
        # without the netCDF round trip
        fg = (u_prev, v_prev) if (warm_start and u_prev is not None) else None
        compute_flow(scene1, scene2, cfg, first_guess=fg)

        suffix = {"goes": "", "polar": "_polar", "mercator": "_merc"}[cfg.grid]
        out = os.path.join(outdir, f"outfile{suffix}_{i:03d}.nc")
        written.append(write_product(out, scene1, cfg, interp=False))
        if cfg.do_interp:
            # per-pair subdirectory: frame indices restart at 1 every pair
            # (pipeline.interpolate_sequence naming), so a flat dir would
            # overwrite the previous pair's frames
            written += interpolate_sequence(
                scene1, scene2, cfg, os.path.join(interp_dir, f"pair_{i:03d}"))

        u_prev = scene1.u_pix
        v_prev = scene1.v_pix
        if checkpoint:
            _save_checkpoint(checkpoint, i, u_prev, v_prev, key,
                             files[:i + 2])
        # roll: frame i+1 becomes the new reference frame
        scene2 = read_scene(files[i + 1], cfg, donav=True, scene=scene2)
        scene1 = scene2
    return written

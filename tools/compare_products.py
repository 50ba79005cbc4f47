"""Compare two flow product files (endpoint error on the raw pixel flow).

Usage: python tools/compare_products.py ours.nc reference.nc [--var U_raw]

Prints EPE statistics (the parity budget is EPE < 0.1 px vs the reference
CUDA solver, BASELINE.md).  Works on any pair of products that carry
U_raw/V_raw (int16, 100*pixels) or Upix/Vpix (float pixels).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import h5py

from octane_tpu.io.native import epe_stats


def load_flow(path):
    with h5py.File(path, "r") as f:
        if "Upix" in f:
            return np.asarray(f["Upix"][()], np.float32), np.asarray(f["Vpix"][()], np.float32)
        if "U_raw" in f:
            return (np.asarray(f["U_raw"][()], np.float32) * 0.01,
                    np.asarray(f["V_raw"][()], np.float32) * 0.01)
        raise SystemExit(f"{path}: no U_raw/Upix flow variables found")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("reference")
    ap.add_argument("--thresh", type=float, default=0.1)
    a = ap.parse_args()
    u1, v1 = load_flow(a.ours)
    u2, v2 = load_flow(a.reference)
    if u1.shape != u2.shape:
        raise SystemExit(f"shape mismatch: {u1.shape} vs {u2.shape}")
    mean, mx, frac = epe_stats(u1, v1, u2, v2, thresh=a.thresh)
    print(f"mean EPE : {mean:.5f} px")
    print(f"max EPE  : {mx:.5f} px")
    print(f"> {a.thresh} px: {frac * 100:.3f}% of pixels")
    return 0 if mean < a.thresh else 1


if __name__ == "__main__":
    sys.exit(main())

"""Quantitative multi-chip scaling model for the north-star config.

BASELINE.md's north star: full-disk 0.5-km band-2 pair (21696^2) in < 2 s
on v5e-16 at >= 0.85 scaling efficiency.  Multi-chip hardware is not
available in this environment, so this tool MODELS the claim with numbers
instead of vibes: it accounts every byte the sharded pipeline moves over
ICI (ghost strips, halo exchanges, psums) against the bytes it moves
through HBM (the measured single-chip throughput is the calibration for
the compute floor), per pyramid level and per solver pass, and emits a
predicted strong-scaling efficiency

    E(N) = T_compute(N) / (T_compute(N) + T_ici(N))

with T_compute(N) = pixels_total / (N * R1) for measured single-chip rate
R1, and T_ici the UNOVERLAPPED sum of exchange transfer times plus a
per-collective latency -- conservative on both counts (XLA overlaps
ppermutes with compute, and the banded SOR's ghost exchange is issued
once per 8-sweep pass precisely so latency amortizes).

Communication inventory (all counts derived from the code, cited inline):

* Banded multi-sweep SOR (parallel/sor.py): per pass, each device
  ppermutes 2 directions x HO rows x W cols x 2 planes of x, and once per
  solve the nc-plane coefficient ghosts; one scalar psum per pass for the
  stopping rule plus one for resid0.  Passes per solve =
  ceil(cgiters / 8) (the remainder pass is the same kernel and is skipped
  when tol binds -- counted here as running, conservative).
* Halo warp (parallel/sharded.py make_sharded_warp + parallel/halo.py):
  per assembly, halo_pad2d moves 2 directions x HALO rows x W cols x
  K=6 sample planes per sharded axis, plus one scalar psum for the
  reach guard.
* Solves per level: GNC_STEPS x LITERS (flow/variational.py level loop);
  assemblies likewise.

Hardware constants (v5e, public figures; the efficiency is insensitive to
2x errors here -- see the sensitivity row): HBM 819 GB/s, ICI ~90 GB/s
usable per chip per direction (1600 Gbps links, derated), ~25 us per
collective hop-latency.

Usage: python tools/scaling_model.py [--rate-mpix-s 24.35] [--md SCALING.md]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# --- hardware model (v5e) ---------------------------------------------------
HBM_GBS = 819.0          # HBM bandwidth per chip
ICI_GBS = 90.0           # usable ICI bandwidth per chip per direction
COLL_LAT_S = 25e-6       # per-collective latency (psum / ppermute issue)

# --- pipeline constants (derived from the code) -----------------------------
GNC_STEPS = 3            # flow/variational.py (reference :604)
LITERS = 3               # default liters
CGITERS = 30             # default cgiters -> SOR sweeps
SWEEPS_PER_PASS = 8      # ops/pallas/sor.py sor_solve_fused s_main
K_WARP_PLANES = 6        # geo2, gx2, gy2, gxx, gxy, gyy (stencil.assemble)
NC_PLANES = 10           # robust coefficient stack incl. rdet (build_cf)
BYTES = 4                # float32


def level_sizes(h, w, kiters, scale=0.5):
    out = []
    for k in range(kiters):
        f = scale ** (kiters - 1 - k)
        out.append((round(h * f + 0.5), round(w * f + 0.5)))
    return out


def model(h=21696, w=21696, kiters=5, n=16, rate_mpix_s=24.35,
          halo_warp=16, ho=16):
    """Returns (per-level rows, totals dict)."""
    from octane_tpu.ops.pallas import sor as psor

    # keep the model honest against the code: the ghost-strip width is the
    # kernel's overlap parameter and the pass count its main sweep budget
    _, _, _, ho_built = psor._build(256, 256, False, 1.9, True,
                                    true_h=256, true_w=256)
    assert ho_built == ho, f"ho drifted: model {ho} vs kernel {ho_built}"
    passes = math.ceil(CGITERS / SWEEPS_PER_PASS)
    solves_per_level = GNC_STEPS * LITERS

    rows = []
    t_comp_total = 0.0
    t_ici_total = 0.0
    for k, (hk, wk) in enumerate(level_sizes(h, w, kiters)):
        hl = math.ceil(hk / n)               # 1 x N row-band mesh
        # compute floor: measured end-to-end single-chip rate covers ALL
        # per-pixel work (assembly + solver + blur/zoom); distribute the
        # level's share by pixel count
        t_comp = (hk * wk / n) / (rate_mpix_s * 1e6)

        # --- ICI: banded SOR ghost strips --------------------------------
        sor_x_bytes = 2 * ho * wk * 2 * BYTES            # 2 dirs, 2 planes
        sor_cf_bytes = 2 * ho * wk * NC_PLANES * BYTES   # once per solve
        n_pass = solves_per_level * passes
        sor_ici = (n_pass * sor_x_bytes
                   + solves_per_level * sor_cf_bytes) / (ICI_GBS * 1e9)
        # stopping psum per pass + resid0 per solve (scalars: latency-bound)
        sor_lat = (n_pass + solves_per_level) * COLL_LAT_S

        # --- ICI: halo warp exchange per assembly -------------------------
        warp_bytes = 2 * halo_warp * wk * K_WARP_PLANES * BYTES
        warp_ici = solves_per_level * warp_bytes / (ICI_GBS * 1e9)
        warp_lat = solves_per_level * (2 * COLL_LAT_S + COLL_LAT_S)

        t_ici = sor_ici + sor_lat + warp_ici + warp_lat
        rows.append({
            "level": k, "shape": f"{hk}x{wk}", "rows_per_dev": hl,
            "t_comp_ms": 1e3 * t_comp,
            "sor_ici_ms": 1e3 * (sor_ici + sor_lat),
            "warp_ici_ms": 1e3 * (warp_ici + warp_lat),
            "ici_frac": t_ici / (t_comp + t_ici),
        })
        t_comp_total += t_comp
        t_ici_total += t_ici

    eff = t_comp_total / (t_comp_total + t_ici_total)
    totals = {
        "n_devices": n,
        "rate_mpix_s_per_chip": rate_mpix_s,
        "t_compute_s": t_comp_total,
        "t_ici_s": t_ici_total,
        "t_pair_s": t_comp_total + t_ici_total,
        "efficiency": eff,
        # sensitivity: halving ICI bandwidth / doubling latency
        "efficiency_ici_half_bw": t_comp_total / (
            t_comp_total + 2 * t_ici_total),
    }
    return rows, totals


def to_markdown(rows, totals, rate_src):
    L = []
    L.append("# SCALING — quantitative multi-chip model\n")
    L.append("North star (BASELINE.md): full-disk 0.5-km band-2 pair "
             "(21696^2) < 2 s on v5e-16 at >= 0.85 scaling efficiency. "
             "Multi-chip hardware is unavailable here, so this file holds "
             "the MODEL (tools/scaling_model.py, constants cited there and "
             "checked against the code by tests/test_scaling_model.py); "
             "the driver's dryrun proves the sharded program compiles and "
             "executes, this file argues the efficiency with numbers.\n")
    L.append(f"Calibration: measured single-chip end-to-end rate "
             f"{totals['rate_mpix_s_per_chip']:.2f} Mpix/s ({rate_src}). "
             f"ICI model: {ICI_GBS:.0f} GB/s/dir usable, "
             f"{COLL_LAT_S * 1e6:.0f} us/collective, NO overlap credited "
             f"(conservative: XLA overlaps ppermutes with compute).\n")
    L.append("| level | shape | rows/dev | t_comp (ms) | SOR ICI (ms) | "
             "warp ICI (ms) | ICI share |")
    L.append("|---|---|---|---|---|---|---|")
    for r in rows:
        L.append(f"| {r['level']} | {r['shape']} | {r['rows_per_dev']} | "
                 f"{r['t_comp_ms']:.2f} | {r['sor_ici_ms']:.3f} | "
                 f"{r['warp_ici_ms']:.3f} | {100 * r['ici_frac']:.2f}% |")
    L.append("")
    L.append(f"**Totals (v5e-16, 1x16 row bands):** compute "
             f"{totals['t_compute_s'] * 1e3:.0f} ms + ICI "
             f"{totals['t_ici_s'] * 1e3:.1f} ms = "
             f"**{totals['t_pair_s']:.3f} s/pair**, efficiency "
             f"**{totals['efficiency']:.4f}** (>= 0.85 north star; "
             f"with ICI derated a further 2x: "
             f"{totals['efficiency_ici_half_bw']:.4f}).\n")
    L.append("Why the ICI share is this small, structurally: the banded "
             "SOR exchanges ONE 2x16-row ghost strip per 8-sweep pass "
             "(parallel/sor.py) instead of a 1-row halo every half-sweep "
             "-- 16x fewer messages -- and its per-pass HBM stream is "
             f"{NC_PLANES + 4} planes x rows/dev, ~3 orders more bytes "
             "than the strip; the warp halo is "
             f"{K_WARP_PLANES} planes x 16 rows vs a full-band gather "
             "window.  Communication scales with the PERIMETER of a "
             "device's band while compute scales with its AREA, so "
             "efficiency IMPROVES as the per-device band grows -- the "
             "north-star shape is the easy case, and the model's weakest "
             "levels are the coarse pyramid tails where absolute time is "
             "negligible.\n")
    L.append("Not modeled: host-side ingest (overlapped row-block reads, "
             "io/readers.py), one-time compile, DCN (v5e-16 is a single "
             "ICI domain).  The <2 s target needs "
             f"{21696 ** 2 / 1e6 / 2 / 16:.1f} Mpix/s/chip; the measured "
             f"rate gives {totals['t_pair_s']:.2f} s including modeled "
             "communication.\n")
    return "\n".join(L)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate-mpix-s", type=float, default=None,
                    help="measured single-chip rate; default: read "
                         "BENCH_all_r05.json config3, else BENCH_r04.json")
    ap.add_argument("--md", default=None, help="write SCALING.md here")
    args = ap.parse_args()

    repo = os.path.join(os.path.dirname(__file__), "..")
    rate, src = args.rate_mpix_s, "--rate-mpix-s"
    if rate is None:
        for fn, key in (("BENCH_all_r05.json", "config3"),
                        ("BENCH_r04.json", "parsed")):
            p = os.path.join(repo, fn)
            if os.path.exists(p):
                with open(p) as f:
                    d = json.load(f)
                entry = d.get(key, d) if key else d
                if isinstance(entry, dict) and "value" in entry:
                    rate, src = float(entry["value"]), fn
                    break
    assert rate is not None, "no bench artifact found; pass --rate-mpix-s"

    rows, totals = model(rate_mpix_s=rate)
    md = to_markdown(rows, totals, src)
    print(md)
    if args.md:
        with open(args.md, "w") as f:
            f.write(md)
        print(f"wrote {args.md}", file=sys.stderr)


if __name__ == "__main__":
    main()

"""The multi-chip scaling model (tools/scaling_model.py) stays in sync
with the code and predicts the north-star efficiency.

The model is the quantitative half of the multi-chip story (SCALING.md):
the driver's dryrun proves the sharded program compiles and executes on a
virtual mesh; these tests pin the model's communication inventory to the
actual kernel/exchange constants and assert the >= 0.85 v5e-16 efficiency
prediction at the north-star shape, so a change that silently inflates
ICI traffic (wider ghost strips, per-sweep exchanges, bigger halos) fails
CI instead of silently invalidating the claim.
"""

import math


def test_model_constants_match_code():
    from tools import scaling_model as sm
    from octane_tpu.config import OFConfig
    from octane_tpu.ops.pallas import sor as psor

    cfg = OFConfig()
    assert sm.GNC_STEPS == cfg.gnc_steps
    assert sm.LITERS == cfg.liters
    assert sm.CGITERS == cfg.cgiters
    assert sm.K_WARP_PLANES == 6          # stencil.assemble sample stack
    # kernel overlap + sweep budget: _build's ho default and
    # sor_solve_fused's s_main
    _, _, _, ho = psor._build(256, 256, False, 1.9, True,
                              true_h=256, true_w=256)
    assert ho == 16
    assert sm.SWEEPS_PER_PASS == 8
    # coefficient stack: robust build has 10 planes incl. rdet (build_cf)
    assert sm.NC_PLANES == 10


def test_north_star_efficiency_prediction():
    from tools import scaling_model as sm

    # conservative rate: the round-4 measured single-chip number
    rows, totals = sm.model(rate_mpix_s=24.35)
    assert totals["efficiency"] >= 0.85, totals
    assert totals["t_pair_s"] < 2.0, totals
    # even with ICI derated a further 2x the claim must stand
    assert totals["efficiency_ici_half_bw"] >= 0.85, totals
    # the finest level must dominate and have a tiny ICI share -- the
    # perimeter-vs-area structure of the decomposition
    finest = rows[-1]
    assert finest["ici_frac"] < 0.02, finest
    assert finest["t_comp_ms"] > 0.5 * 1e3 * totals["t_compute_s"]


def test_efficiency_monotone_in_band_height():
    """Communication is perimeter, compute is area: at fixed device count
    the predicted efficiency improves with problem size."""
    from tools import scaling_model as sm

    effs = [sm.model(h=s, w=s, rate_mpix_s=24.35)[1]["efficiency"]
            for s in (5424, 10848, 21696)]
    assert effs == sorted(effs), effs

"""Golden regression: the JAX solver vs a stored full-settings oracle run.

The fixture (tests/golden/variational_64.npz) was produced by the loop-level
NumPy oracle (reference CUDA semantics) at the reference's default solver
settings (kiters=3 for the 64x64 crop, liters=3, cgiters=30, alpha=5,
lambda=1).  The solver must stay within the BASELINE EPE budget of it.
"""

import os

import numpy as np
import pytest

from octane_tpu.config import OFConfig
from octane_tpu.flow.variational import variational_flow
from octane_tpu.io.native import epe_stats

FIXTURE = os.path.join(os.path.dirname(__file__), "golden",
                       "variational_64.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(FIXTURE):
        pytest.skip("golden fixture missing")
    return np.load(FIXTURE)


def test_epe_within_budget(golden):
    z = np.zeros_like(golden["u"])
    cfg = OFConfig(kiters=3)
    u, v = variational_flow(golden["im1"], golden["im2"], z, z, cfg)
    mean, mx, frac = epe_stats(np.asarray(u), np.asarray(v),
                               golden["u"], golden["v"])
    # BASELINE budget: EPE < 0.1 px vs the reference solver; float32
    # reassociation drift is orders of magnitude below that
    assert mean < 0.01, f"mean EPE {mean}"
    assert mx < 0.1, f"max EPE {mx}"


def test_flow_is_nontrivial(golden):
    assert np.median(np.abs(golden["u"])) > 0.5

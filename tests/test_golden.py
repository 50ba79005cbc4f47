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


FIXTURE256 = os.path.join(os.path.dirname(__file__), "golden",
                          "variational_256.npz")
PRODUCT512 = os.path.join(os.path.dirname(__file__), "golden",
                          "product_512.npz")


@pytest.fixture(scope="module")
def golden256():
    if not os.path.exists(FIXTURE256):
        pytest.skip("golden fixture missing")
    return np.load(FIXTURE256)


def test_matfree_oracle_matches_dense():
    """The matrix-free oracle PCG (used for the 256^2 fixture, where the
    dense 2N x 2N matrix would be 64 GB) is the same operator as
    dense_matrix row-for-row."""
    import reference_impl as ref

    rng = np.random.default_rng(0)
    h, w = 12, 14
    A = {k: rng.uniform(4.5, 9.0, (h, w)).astype(np.float32)
         for k in ("a1", "a4")}
    A["a2"] = rng.uniform(-0.3, 0.3, (h, w)).astype(np.float32)
    for k in ("a5", "a6", "a7", "a8"):
        A[k] = -rng.uniform(0.3, 1.0, (h, w)).astype(np.float32)
    A["bu"] = rng.normal(0, 1, (h, w)).astype(np.float32)
    A["bv"] = rng.normal(0, 1, (h, w)).astype(np.float32)
    du = rng.normal(0, 1, (h, w)).astype(np.float32)
    dv = rng.normal(0, 1, (h, w)).astype(np.float32)
    M = ref.dense_matrix(A)
    x = np.empty(2 * h * w, np.float32)
    x[0::2] = du.ravel()
    x[1::2] = dv.ravel()
    want = (M @ x).astype(np.float32)
    au, av = ref.apply_stencil_np(A, du, dv)
    got = np.empty_like(want)
    got[0::2] = au.ravel()
    got[1::2] = av.ravel()
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-5)


@pytest.mark.parametrize("solver", ["pcg", "sor"])
def test_epe_within_budget_256_full_defaults(golden256, solver):
    """256^2 fixture at FULL default settings -- kiters=4, 3 GNC steps
    (robust al1<1 coefficients engaged), liters=3, cgiters=30 -- for both
    solvers.  This is the regression net that catches flow-level drift
    from solver changes (e.g. the round-4 remainder-pass defect) at the
    settings production actually runs."""
    z = np.zeros_like(golden256["u"])
    cfg = OFConfig(kiters=4, solver=solver)
    u, v = variational_flow(golden256["im1"], golden256["im2"], z, z, cfg)
    mean, mx, frac = epe_stats(np.asarray(u), np.asarray(v),
                               golden256["u"], golden256["v"])
    assert mean < 0.01, f"mean EPE {mean} ({solver})"
    assert mx < 0.1, f"max EPE {mx} ({solver})"


def test_product_short_planes_regression(tmp_path):
    """Product-file-level golden: U/V/U_raw/V_raw short planes of a full
    default-settings pipeline run on the pinned synthetic pair.  A
    regression net at the surface users see: numerics changes beyond
    short-quantization noise (0.01 px / 0.01 m/s per count) fail here."""
    import h5py
    from tests.synth import make_goes_file
    from octane_tpu.pipeline import run_pipeline

    if not os.path.exists(PRODUCT512):
        pytest.skip("product fixture missing")
    want = np.load(PRODUCT512)

    h = w = 512
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    def scene(sx, sy):
        return (3000 + 8000 * np.exp(
            -(((xx - sx - w / 2) ** 2 + (yy - sy - h / 2) ** 2)
              / (2 * 60.0 ** 2)))
            + 1500 * np.sin((xx - sx) / 11.0) * np.cos((yy - sy) / 13.0)
        ).astype(np.int16)

    f1 = make_goes_file(str(tmp_path / "g1.nc"), scene(0, 0), band=13)
    f2 = make_goes_file(str(tmp_path / "g2.nc"), scene(3.0, -1.5),
                        band=13, t=650000060.0)
    run_pipeline(f1, f2, OFConfig(), outdir=str(tmp_path))
    with h5py.File(str(tmp_path / "outfile.nc")) as f:
        for var in ("U", "V", "U_raw", "V_raw"):
            got = np.asarray(f[var][()], np.int32)
            ref_p = np.asarray(want[var], np.int32)
            d = np.abs(got - ref_p)
            assert d.max() <= 1, f"{var}: max short diff {d.max()}"
            assert (d == 0).mean() > 0.999, f"{var}: {(d == 0).mean():.4f}"

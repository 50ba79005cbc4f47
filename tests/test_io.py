"""IO + end-to-end pipeline tests on synthetic GOES-like files."""

import numpy as np
import h5py
import pytest

from octane_tpu.config import OFConfig
from octane_tpu.io.readers import read_scene, read_cth, read_first_guess
from octane_tpu.io.writers import write_product
from octane_tpu.pipeline import run_pipeline
from octane_tpu.cli import main as cli_main

import synth


@pytest.fixture
def pair(tmp_path):
    h = w = 48
    c1 = synth.blob_counts(h, w, 20, 24)
    c2 = synth.blob_counts(h, w, 23, 24)
    f1 = synth.make_goes_file(str(tmp_path / "g1.nc"), c1, t=650000000.0)
    f2 = synth.make_goes_file(str(tmp_path / "g2.nc"), c2, t=650000600.0)
    return f1, f2, (h, w)


class TestReader:
    def test_reads_nav_and_normalizes(self, pair):
        f1, _, (h, w) = pair
        cfg = OFConfig()
        sc = read_scene(f1, cfg, donav=True)
        assert sc.data.shape == (1, h, w)
        assert sc.nav.nx == w and sc.nav.ny == h
        assert sc.band[0] == 13
        assert sc.t == 650000000.0
        assert np.isfinite(sc.lat).all()
        assert 0.0 <= sc.data.min() and sc.data.max() <= 260.0
        # norm range defaults to the band-13 table entry
        assert sc.norm_ranges[0] == (-1.6443, 185.5699)

    def test_norm_override(self, pair):
        f1, _, _ = pair
        cfg = OFConfig(norm_min=0.0, norm_max=500.0)
        sc = read_scene(f1, cfg, donav=False)
        assert sc.norm_ranges[0] == (0.0, 500.0)

    def test_cth_and_firstguess(self, pair, tmp_path):
        f1, _, (h, w) = pair
        cfg = OFConfig(do_cth=True)
        sc = read_scene(f1, cfg, donav=True)
        synth.make_cth_file(str(tmp_path / "cth.nc"),
                            np.full((h, w), 8000.0, np.float32))
        read_cth(str(tmp_path / "cth.nc"), sc, cfg)
        assert sc.cth.shape == (h, w)
        np.testing.assert_allclose(sc.cth, 8000.0, rtol=1e-5)
        synth.make_firstguess_file(str(tmp_path / "fg.nc"),
                                   np.ones((h, w)), np.zeros((h, w)))
        read_first_guess(str(tmp_path / "fg.nc"), sc)
        assert sc.ufg.shape == (h, w)


class TestPipeline:
    def test_end_to_end_product(self, pair, tmp_path):
        f1, f2, (h, w) = pair
        cfg = OFConfig(kiters=3)
        out = run_pipeline(f1, f2, cfg, outdir=str(tmp_path))
        assert len(out) == 1
        with h5py.File(out[0], "r") as f:
            for name in ("x", "y", "t", "U", "V", "U_raw", "V_raw", "Rad",
                         "goes_imager_projection", "optical_flow_settings"):
                assert name in f, name
            u_raw = f["U_raw"][()] * 0.01
            ofs = f["optical_flow_settings"]
            assert ofs.attrs["dt_seconds"] == pytest.approx(600.0)
            assert ofs[()] == 1
            assert ofs.attrs["alpha"] == 5.0
        # the blob moved +3 px in x: raw flow over the blob should say so
        blob = synth.blob_counts(h, w, 20, 24) > 8000
        assert abs(np.median(u_raw[blob]) - 3.0) < 0.15

    def test_interp_products(self, pair, tmp_path):
        f1, f2, _ = pair
        cfg = OFConfig(kiters=2, do_interp=True, deltat=200.0)
        out = run_pipeline(f1, f2, cfg, outdir=str(tmp_path),
                           interp_dir=str(tmp_path / "interp"))
        # dT=600 s, frames at frt = 1/3 and 2/3
        assert len(out) == 3
        with h5py.File(out[1], "r") as f:
            assert "Occlusion" in f
            assert f["t"].attrs["frdt"] == pytest.approx(1.0 / 3.0)
            assert f["t"][()] == pytest.approx(650000200.0)

    def test_pixuv_mode(self, pair, tmp_path):
        f1, f2, _ = pair
        cfg = OFConfig(kiters=2, pixuv=True)
        out = run_pipeline(f1, f2, cfg, outdir=str(tmp_path))
        with h5py.File(out[0], "r") as f:
            assert "Upix" in f and "Vpix" in f


class TestCLI:
    def test_cli_runs(self, pair, tmp_path):
        f1, f2, _ = pair
        rc = cli_main(["-i1", f1, "-i2", f2, "-o", str(tmp_path),
                       "-kiters", "2", "-cgiters", "10"])
        assert rc == 0
        assert (tmp_path / "outfile.nc").exists()

    def test_cli_patch_match(self, pair, tmp_path):
        f1, f2, _ = pair
        rc = cli_main(["-i1", f1, "-i2", f2, "-o", str(tmp_path), "-sosm", "-pd"])
        assert rc == 0


class TestWriterRoundtrip:
    def test_attrs_schema(self, pair, tmp_path):
        f1, f2, _ = pair
        cfg = OFConfig(kiters=2)
        sc1 = read_scene(f1, cfg, donav=True)
        sc2 = read_scene(f2, cfg, donav=False)
        from octane_tpu.flow.dispatcher import compute_flow
        sc1.nav.g2x_offset = sc2.nav.x_offset
        sc1.nav.g2y_offset = sc2.nav.y_offset
        compute_flow(sc1, sc2, cfg)
        p = write_product(str(tmp_path / "out.nc"), sc1, cfg)
        with h5py.File(p, "r") as f:
            gip = f["goes_imager_projection"]
            assert gip.attrs["grid_mapping_name"] == "geostationary"
            assert gip.attrs["semi_major_axis"] == pytest.approx(6378137.0)
            assert f["planck_fk1"][()] == pytest.approx(10803.3)
            # dimension scales attached
            assert f["U"].dims[0][0] == f["y"]


class TestFlatGridPipeline:
    def _flat_pair(self, tmp_path, grid):
        h = w = 40
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        blob = lambda cx: 200 * np.exp(-(((xx - cx) ** 2 + (yy - 20) ** 2) / 32.0)) + 20
        f1 = synth.make_flat_grid_file(str(tmp_path / "p1.nc"), blob(18),
                                       grid=grid, t=0.0)
        f2 = synth.make_flat_grid_file(str(tmp_path / "p2.nc"), blob(20),
                                       grid=grid, t=600.0)
        return f1, f2

    @pytest.mark.parametrize("grid", ["polar", "mercator"])
    def test_flat_pipeline(self, tmp_path, grid):
        f1, f2 = self._flat_pair(tmp_path, grid)
        cfg = OFConfig(grid=grid, kiters=2, cgiters=10)
        out = run_pipeline(f1, f2, cfg, outdir=str(tmp_path))
        suffix = "_polar" if grid == "polar" else "_merc"
        assert out[0].endswith(f"outfile{suffix}.nc")
        with h5py.File(out[0], "r") as f:
            assert "U" in f and f["U"].dtype == np.float64
            proj = ("polar_imager_projection" if grid == "polar"
                    else "merc_imager_projection")
            assert proj in f
            assert "Rad" in f and f["Rad"].dtype == np.float32
            u = f["U"][()]
        # the blob moved +2 px = 2 km east over 600 s ~ 3.3 m/s
        assert np.nanmax(np.abs(u)) > 1.0

    def test_polar_reader_nav(self, tmp_path):
        f1, _ = self._flat_pair(tmp_path, "polar")
        cfg = OFConfig(grid="polar", kiters=2)
        sc = read_scene(f1, cfg, donav=True)
        assert sc.nav.lat1 == 90.0
        assert sc.lat.max() <= 90.0 and sc.lat.min() > 80.0


class TestMultiChannel:
    def test_two_channel_pipeline(self, pair, tmp_path):
        f1, f2, (h, w) = pair
        # channel-2 files on the same grid (band 2 scaled counts)
        c21 = synth.make_goes_file(str(tmp_path / "c21.nc"),
                                   synth.blob_counts(h, w, 20, 24), band=9)
        c22 = synth.make_goes_file(str(tmp_path / "c22.nc"),
                                   synth.blob_counts(h, w, 23, 24), band=9)
        cfg = OFConfig(kiters=2, cgiters=10)
        out = run_pipeline(f1, f2, cfg, outdir=str(tmp_path),
                           channel2=(c21, c22))
        with h5py.File(out[0], "r") as f:
            assert "Rad2" in f
            assert "planck_fk1_2" in f
            u_raw = f["U_raw"][()] * 0.01
        blob = synth.blob_counts(h, w, 20, 24) > 8000
        assert abs(np.median(u_raw[blob]) - 3.0) < 0.3

    def test_firstguess_pipeline(self, pair, tmp_path):
        f1, f2, (h, w) = pair
        fg = synth.make_firstguess_file(str(tmp_path / "fg.nc"),
                                        np.full((h, w), 3.0, np.float32),
                                        np.zeros((h, w), np.float32))
        cfg = OFConfig(kiters=2, cgiters=10, lambdac=0.5)
        out = run_pipeline(f1, f2, cfg, outdir=str(tmp_path),
                           firstguess_file=fg)
        with h5py.File(out[0], "r") as f:
            assert f["optical_flow_settings"].attrs["dofirstguess"] == 1


class TestHybrid:
    def test_hybrid_pipeline(self, pair, tmp_path):
        f1, f2, (h, w) = pair
        cfg = OFConfig(algorithm="hybrid", kiters=2, cgiters=10)
        out = run_pipeline(f1, f2, cfg, outdir=str(tmp_path))
        with h5py.File(out[0], "r") as f:
            u_raw = f["U_raw"][()] * 0.01
        blob = synth.blob_counts(h, w, 20, 24) > 8000
        assert abs(np.median(u_raw[blob]) - 3.0) < 0.3


class TestMeshPipeline:
    def test_pipeline_on_virtual_mesh(self, pair, tmp_path):
        """Full pipeline with the solve sharded over the 8-device CPU mesh."""
        f1, f2, (h, w) = pair
        # halo_warp must exceed max|flow|+2 (3 px blob shift here)
        cfg = OFConfig(kiters=2, cgiters=10, mesh_shape=(2, 4), halo_warp=8)
        out = run_pipeline(f1, f2, cfg, outdir=str(tmp_path))
        cfg1 = OFConfig(kiters=2, cgiters=10)
        out1 = run_pipeline(f1, f2, cfg1, outdir=str(tmp_path / "s"))
        with h5py.File(out[0], "r") as fa, h5py.File(out1[0], "r") as fb:
            np.testing.assert_allclose(fa["U_raw"][()], fb["U_raw"][()],
                                       atol=1)   # +-0.01 px encoding steps

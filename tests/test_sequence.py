"""Sequence mode: warm starts, checkpoint/resume, multi-host scaffolding."""

import numpy as np
import h5py
import jax
import pytest

from octane_tpu.config import OFConfig
from octane_tpu.sequence import run_sequence, _load_checkpoint
from octane_tpu.utils.profiling import StageTimer

import synth


@pytest.fixture
def frames(tmp_path):
    h = w = 40
    files = []
    for i in range(4):
        c = synth.blob_counts(h, w, 16 + 2 * i, 20)
        files.append(synth.make_goes_file(
            str(tmp_path / f"f{i}.nc"), c, t=650000000.0 + 600.0 * i))
    return files, (h, w)


class TestSequence:
    def test_sequence_products(self, frames, tmp_path):
        files, (h, w) = frames
        cfg = OFConfig(kiters=2, cgiters=10)
        out = run_sequence(files, cfg, outdir=str(tmp_path / "seq"),
                           checkpoint=str(tmp_path / "ckpt.h5"))
        assert len(out) == 3
        for p in out:
            with h5py.File(p, "r") as f:
                u = f["U_raw"][()] * 0.01
                # each pair moved +2 px in x
                blob_mask = np.abs(u) > 0.5
                assert blob_mask.any()
        idx, u, v = _load_checkpoint(str(tmp_path / "ckpt.h5"))
        assert idx == 2
        assert u.shape == (h, w)

    def test_resume_skips_done_pairs(self, frames, tmp_path):
        files, _ = frames
        cfg = OFConfig(kiters=2, cgiters=10)
        ck = str(tmp_path / "ckpt.h5")
        run_sequence(files[:3], cfg, outdir=str(tmp_path / "seq"), checkpoint=ck)
        # resume over the full list: only the remaining pair runs
        out = run_sequence(files, cfg, outdir=str(tmp_path / "seq"),
                           checkpoint=ck)
        assert len(out) == 1
        assert out[0].endswith("_002.nc")

    def test_warm_start_consistency(self, frames, tmp_path):
        """Warm-started sequence flow stays close to cold-start flow."""
        files, _ = frames
        cfg = OFConfig(kiters=2, cgiters=10)
        warm = run_sequence(files[:3], cfg, outdir=str(tmp_path / "w"),
                            warm_start=True)
        cold = run_sequence(files[:3], cfg, outdir=str(tmp_path / "c"),
                            warm_start=False)
        with h5py.File(warm[1], "r") as fw, h5py.File(cold[1], "r") as fc:
            uw = fw["U_raw"][()] * 0.01
            uc = fc["U_raw"][()] * 0.01
        assert np.abs(np.median(uw) - np.median(uc)) < 0.5


class TestDistributedScaffold:
    def test_single_process_roundtrip(self):
        from octane_tpu.parallel.distributed import (
            distributed_variational_flow, host_row_block)
        h = w = 32
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        im1 = 200 * np.exp(-(((xx - 14) ** 2 + (yy - 16) ** 2) / 16.0)) + 20
        im2 = 200 * np.exp(-(((xx - 16) ** 2 + (yy - 16) ** 2) / 16.0)) + 20
        r0, r1 = host_row_block(h)
        assert (r0, r1) == (0, h)          # single process owns everything
        cfg = OFConfig(kiters=2, cgiters=8, halo_warp=4)
        u, v = distributed_variational_flow(im1[r0:r1], im2[r0:r1], (h, w), cfg)
        um = np.asarray(u)
        assert np.isfinite(um).all()
        assert um.max() > 1.0              # found the eastward motion


class TestProfiling:
    def test_stage_timer(self):
        t = StageTimer()
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        with t.stage("b", sync_on=jax.numpy.zeros(3)):
            pass
        rows = dict((r[0], r[1]) for r in t.summary())
        assert rows == {"a": 2, "b": 1}
        assert "total_ms" in t.report()


class TestCheckpointRobustness:
    def test_killed_and_resumed_with_interp(self, frames, tmp_path):
        """A job killed mid-sequence resumes to the same products as an
        uninterrupted run, including the interpolated frames."""
        files, _ = frames
        cfg = OFConfig(kiters=2, cgiters=10, do_interp=True, deltat=200.0)
        ref_dir = str(tmp_path / "ref")
        ref = run_sequence(files, cfg, outdir=ref_dir,
                           interp_dir=str(tmp_path / "ref_interp"))

        # "killed" run: stop after the first two pairs, then resume
        ck = str(tmp_path / "ckpt.h5")
        part_dir = str(tmp_path / "part")
        run_sequence(files[:3], cfg, outdir=part_dir, checkpoint=ck,
                     interp_dir=str(tmp_path / "part_interp"))
        out = run_sequence(files, cfg, outdir=part_dir, checkpoint=ck,
                           interp_dir=str(tmp_path / "part_interp"))
        # resume produced only the remaining pair's products
        assert all("_002" in p or "interp" in p for p in out)

        import os
        for rp in ref:
            pp = rp.replace(ref_dir, part_dir).replace("ref_interp",
                                                       "part_interp")
            assert os.path.exists(pp), pp
            with h5py.File(rp) as fr, h5py.File(pp) as fp:
                for var in ("U_raw", "V_raw"):
                    if var in fr:
                        np.testing.assert_array_equal(fr[var][()], fp[var][()])

    def test_resume_refuses_changed_settings(self, frames, tmp_path):
        files, _ = frames
        ck = str(tmp_path / "ckpt.h5")
        run_sequence(files[:3], OFConfig(kiters=2, cgiters=10),
                     outdir=str(tmp_path / "a"), checkpoint=ck)
        with pytest.raises(ValueError, match="different solver settings"):
            run_sequence(files, OFConfig(kiters=2, cgiters=12),
                         outdir=str(tmp_path / "a"), checkpoint=ck)

    def test_resume_refuses_reordered_frames(self, frames, tmp_path):
        files, _ = frames
        cfg = OFConfig(kiters=2, cgiters=10)
        ck = str(tmp_path / "ckpt.h5")
        run_sequence(files[:3], cfg, outdir=str(tmp_path / "a"), checkpoint=ck)
        reordered = [files[1], files[0]] + files[2:]
        with pytest.raises(ValueError, match="different frame list"):
            run_sequence(reordered, cfg, outdir=str(tmp_path / "a"),
                         checkpoint=ck)

"""Multi-host (2-process CPU cluster) end-to-end parity.

Spawns two worker processes that form a jax.distributed cluster over
localhost, run the distributed pipeline (host-sharded hyperslab ingest ->
SPMD flow over a (2, 4) global mesh -> process-0 write) and checks the
product against a single-process run of the same pair.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import h5py

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_pair(tmp_path):
    from tests.synth import make_goes_file

    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    def scene(s):
        return (3000 + 8000 * np.exp(-(((xx - s - w / 2) ** 2
                                        + (yy - h / 2) ** 2) / (2 * 14.0 ** 2)))
                + 1500 * np.sin((xx - s) / 7.0) * np.cos(yy / 9.0)
                ).astype(np.int16)

    f1 = make_goes_file(str(tmp_path / "g1.nc"), scene(0.0), band=13)
    f2 = make_goes_file(str(tmp_path / "g2.nc"), scene(2.0), band=13,
                        t=650000060.0)
    return f1, f2


CLI_FLAGS = ["-kiters", "2", "-liters", "2", "-cgiters", "8",
             "-mesh", "2x4"]


def _make_extras(tmp_path, h=96, w=128):
    from tests.synth import make_cth_file, make_firstguess_file

    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cth = (8000 + 2000 * np.sin(xx / 11.0) * np.cos(yy / 13.0)
           + rng.normal(0, 30, (h, w))).astype(np.float32)
    cthf = make_cth_file(str(tmp_path / "cth.nc"), cth)
    ufg = (4.0 + 0.5 * np.sin(yy / 9.0)).astype(np.float32)
    vfg = (-1.0 + 0.5 * np.cos(xx / 7.0)).astype(np.float32)
    fgf = make_firstguess_file(str(tmp_path / "fg.nc"), ufg, vfg)
    return cthf, fgf


@pytest.mark.slow
def test_two_process_full_featured(tmp_path):
    """CTH + first guess + SRSAL + temporal interpolation under -nprocs:
    the 2-process products must match the plain single-host pipeline."""
    f1, f2 = _make_pair(tmp_path)
    cthf, fgf = _make_extras(tmp_path)
    port = _free_port()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    env["PYTHONPATH"] = REPO

    extra = ["-i1cth", cthf, "-firstguess", fgf, "-srsal",
             "-interp", "-deltat", "20"]
    fm_out = str(tmp_path / "fm")          # shared: parts + merged product
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "octane_tpu.cli",
             "-i1", f1, "-i2", f2, "-o", fm_out,
             "-interploc", str(tmp_path / "fm_interp"),
             "-coordinator", f"127.0.0.1:{port}",
             "-nprocs", "2", "-procid", str(pid)] + CLI_FLAGS + extra,
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outputs = [p.communicate(timeout=1800)[0].decode() for p in procs]
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"

    # single-host reference (same (2,4) mesh so the SPMD programs match)
    env1 = dict(env)
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    single_out = str(tmp_path / "fsingle")
    r = subprocess.run(
        [sys.executable, "-m", "octane_tpu.cli",
         "-i1", f1, "-i2", f2, "-o", single_out,
         "-interploc", str(tmp_path / "fsingle_interp")]
        + CLI_FLAGS + extra,
        env=env1, cwd=REPO, capture_output=True, timeout=1800)
    assert r.returncode == 0, r.stderr.decode()[-4000:]

    with h5py.File(os.path.join(fm_out, "outfile.nc")) as fm, \
            h5py.File(os.path.join(single_out, "outfile.nc")) as fs:
        np.testing.assert_array_equal(fm["Rad"][()], fs["Rad"][()])
        np.testing.assert_array_equal(fm["CTP"][()], fs["CTP"][()])
        for var in ("U", "V", "U_raw", "V_raw"):
            d = np.abs(np.asarray(fm[var][()], np.int32)
                       - np.asarray(fs[var][()], np.int32))
            # cross-process CG psums + eager-vs-jit pix2uv FMA: short-level
            assert d.max() <= 5, f"{var}: max short diff {d.max()}"
            assert (d == 0).mean() > 0.98, f"{var}: {(d == 0).mean()}"

    # interpolated frames: flow differs at float level between runs, so
    # requantized counts may flip the odd count; occlusion nearly equal
    m_frames = sorted(os.listdir(str(tmp_path / "fm_interp")))
    s_frames = sorted(os.listdir(str(tmp_path / "fsingle_interp")))
    m_frames = [x for x in m_frames if x.endswith(".nc")]
    s_frames = [x for x in s_frames if x.endswith(".nc")]
    assert m_frames == s_frames and len(m_frames) >= 2
    for name in m_frames:
        with h5py.File(os.path.join(str(tmp_path / "fm_interp"), name)) as fm, \
                h5py.File(os.path.join(str(tmp_path / "fsingle_interp"),
                                       name)) as fs:
            d = np.abs(np.asarray(fm["Rad"][()], np.int32)
                       - np.asarray(fs["Rad"][()], np.int32))
            assert d.max() <= 2 and (d == 0).mean() > 0.99, name
            docc = (fm["Occlusion"][()] != fs["Occlusion"][()])
            assert docc.mean() < 0.01, name


@pytest.mark.slow
@pytest.mark.parametrize("grid", ["polar", "mercator"])
def test_two_process_flat_grid_matches_single(tmp_path, grid):
    """The distributed pipeline on polar/mercator grids (the reference's
    other two grid types, oct_fileread.cc:871-895) must match the
    single-host pipeline: hyperslab flat-grid ingest, SPMD solve,
    full-precision U/V doubles merged from row-block parts."""
    from tests.synth import make_flat_grid_file

    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    def blob(s):
        return (200 + 55 * np.exp(-(((xx - s - w / 2) ** 2
                                     + (yy - h / 2) ** 2) / (2 * 14.0 ** 2)))
                + 20 * np.sin((xx - s) / 7.0) * np.cos(yy / 9.0))

    # lat1=45 keeps the polar grid off the pole: AT the pole the E-W
    # haversine is discontinuous in longitude, so the float-level flow
    # drift between runs (cross-process CG psums) amplifies to full wind
    # flips on a measure-zero pixel set -- projection geometry, not
    # pipeline mechanics (V, which depends on smooth lat diffs, is exact)
    f1 = make_flat_grid_file(str(tmp_path / "p1.nc"), blob(0.0), grid=grid,
                             lat1=45.0)
    f2 = make_flat_grid_file(str(tmp_path / "p2.nc"), blob(2.0), grid=grid,
                             t=650000060.0, lat1=45.0)
    gflag = "-Polar" if grid == "polar" else "-Merc"
    port = _free_port()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    env["PYTHONPATH"] = REPO

    multi_out = str(tmp_path / "multi")
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "octane_tpu.cli",
             "-i1", f1, "-i2", f2, "-o", multi_out, gflag,
             "-coordinator", f"127.0.0.1:{port}",
             "-nprocs", "2", "-procid", str(pid)] + CLI_FLAGS,
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outputs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"

    env1 = dict(env)
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    single_out = str(tmp_path / "single")
    r = subprocess.run(
        [sys.executable, "-m", "octane_tpu.cli",
         "-i1", f1, "-i2", f2, "-o", single_out, gflag] + CLI_FLAGS,
        env=env1, cwd=REPO, capture_output=True, timeout=900)
    assert r.returncode == 0, r.stderr.decode()[-4000:]

    name = "outfile_polar.nc" if grid == "polar" else "outfile_merc.nc"
    with h5py.File(os.path.join(multi_out, name)) as fm, \
            h5py.File(os.path.join(single_out, name)) as fs:
        np.testing.assert_array_equal(fm["Rad"][()], fs["Rad"][()])
        proj = ("polar_imager_projection" if grid == "polar"
                else "merc_imager_projection")
        assert proj in fm
        for var in ("U", "V"):
            a = np.asarray(fm[var][()], np.float64)
            b = np.asarray(fs[var][()], np.float64)
            assert fm[var].dtype == np.float64      # flat grids keep doubles
            # cross-process collectives reassociate the CG psums -> float
            # drift on the winds (m/s); no short quantization to hide it
            assert np.abs(a - b).max() < 0.05, var
            assert np.abs(a - b).mean() < 0.005, var


@pytest.mark.slow
def test_two_process_product_matches_single(tmp_path):
    f1, f2 = _make_pair(tmp_path)
    port = _free_port()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    env["PYTHONPATH"] = REPO

    # the row-block product write needs a SHARED output directory (each
    # process writes its part file there; process 0 streams the merge)
    multi_out = str(tmp_path / "multi")
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "octane_tpu.cli",
             "-i1", f1, "-i2", f2, "-o", multi_out,
             "-coordinator", f"127.0.0.1:{port}",
             "-nprocs", "2", "-procid", str(pid)] + CLI_FLAGS,
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outputs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"

    # same distributed path, single process, 8 local devices, SAME (2,4)
    # global mesh -> the multi-process mechanics (hyperslab ingest, block
    # assembly, allgather, write) must be bit-invisible
    env1 = dict(env)
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    dist1_out = str(tmp_path / "dist1")
    r = subprocess.run(
        [sys.executable, "-m", "octane_tpu.cli",
         "-i1", f1, "-i2", f2, "-o", dist1_out, "-nprocs", "1"] + CLI_FLAGS,
        env=env1, cwd=REPO, capture_output=True, timeout=900)
    assert r.returncode == 0, r.stderr.decode()[-4000:]

    # plain single-host pipeline (eager pix2uv): loose agreement only --
    # the haversine is cancellation-sensitive to jit FMA contraction
    single_out = str(tmp_path / "single")
    r = subprocess.run(
        [sys.executable, "-m", "octane_tpu.cli",
         "-i1", f1, "-i2", f2, "-o", single_out] + CLI_FLAGS[:-2],
        env=env, cwd=REPO, capture_output=True, timeout=900)
    assert r.returncode == 0, r.stderr.decode()[-4000:]

    with h5py.File(os.path.join(multi_out, "outfile.nc")) as fm, \
            h5py.File(os.path.join(dist1_out, "outfile.nc")) as f1p, \
            h5py.File(os.path.join(single_out, "outfile.nc")) as fs:
        np.testing.assert_array_equal(fm["Rad"][()], f1p["Rad"][()])
        for var in ("U", "V", "U_raw", "V_raw"):
            # same global mesh/program, but cross-process collectives may
            # use different reduction trees -> ulp drift in the CG psums
            d = np.abs(np.asarray(fm[var][()], np.int32)
                       - np.asarray(f1p[var][()], np.int32))
            assert d.max() <= 2, f"{var}: 2p vs 1p max short diff {d.max()}"
            assert (d == 0).mean() > 0.99, f"{var}: {(d == 0).mean()}"
        for var in ("U", "V", "U_raw", "V_raw"):
            d = np.abs(np.asarray(fm[var][()], np.int32)
                       - np.asarray(fs[var][()], np.int32))
            assert d.max() <= 5, f"{var}: max short diff {d.max()}"
        np.testing.assert_array_equal(fm["Rad"][()], fs["Rad"][()])


@pytest.mark.slow
def test_two_process_sequence_matches_single(tmp_path):
    """run_sequence_distributed: 3-frame sequence over a 2-process cluster
    -- warm-started pair 2, row-block checkpoints and a mid-sequence resume
    (the second invocation continues from the checkpoint) -- must match the
    single-process run_sequence products."""
    from tests.synth import make_goes_file

    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    def scene(s):
        return (3000 + 8000 * np.exp(-(((xx - s - w / 2) ** 2
                                        + (yy - h / 2) ** 2) / (2 * 14.0 ** 2)))
                + 1500 * np.sin((xx - s) / 7.0) * np.cos(yy / 9.0)
                ).astype(np.int16)

    files = [make_goes_file(str(tmp_path / f"g{k}.nc"), scene(2.0 * k),
                            band=13, t=650000000.0 + 60.0 * k)
             for k in range(3)]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    env["PYTHONPATH"] = REPO

    worker = (
        "import sys\n"
        "from octane_tpu.parallel.distributed import (initialize_multihost,"
        " run_sequence_distributed)\n"
        "from octane_tpu.config import OFConfig\n"
        "coord, pid, out, ck, nfiles = sys.argv[1], int(sys.argv[2]), "
        "sys.argv[3], sys.argv[4], int(sys.argv[5])\n"
        "files = sys.argv[6:6 + nfiles]\n"
        "initialize_multihost(coord, 2, pid)\n"
        "cfg = OFConfig(kiters=2, liters=2, cgiters=8, lambdac=0.1,\n"
        "               mesh_shape=(2, 4))\n"
        "run_sequence_distributed(files, cfg, outdir=out, checkpoint=ck)\n"
    )

    def launch(nfiles):
        port = _free_port()
        procs = [subprocess.Popen(
            [sys.executable, "-c", worker, f"127.0.0.1:{port}", str(pid),
             str(tmp_path / "dist_out"), str(tmp_path / "seq.ckpt"),
             str(nfiles)] + files[:nfiles],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for pid in range(2)]
        outs = [p.communicate(timeout=1800)[0].decode() for p in procs]
        for p, o in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"

    launch(2)                 # first invocation: pair 0 only
    assert os.path.exists(str(tmp_path / "seq.ckpt.p0.h5"))
    launch(3)                 # resume: loads the checkpoint, runs pair 1

    # single-process reference on the same (2, 4) mesh (8 virtual devices)
    env1 = dict(env)
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    single = (
        "import sys\n"
        "from octane_tpu.sequence import run_sequence\n"
        "from octane_tpu.config import OFConfig\n"
        "cfg = OFConfig(kiters=2, liters=2, cgiters=8, lambdac=0.1,\n"
        "               mesh_shape=(2, 4))\n"
        "run_sequence(sys.argv[2:], cfg, outdir=sys.argv[1])\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", single, str(tmp_path / "single_out")] + files,
        env=env1, cwd=REPO, capture_output=True, timeout=1800)
    assert r.returncode == 0, r.stderr.decode()[-4000:]

    for i in range(2):
        pd = os.path.join(str(tmp_path / "dist_out"), f"outfile_{i:03d}.nc")
        ps = os.path.join(str(tmp_path / "single_out"), f"outfile_{i:03d}.nc")
        with h5py.File(pd) as fd, h5py.File(ps) as fs:
            np.testing.assert_array_equal(fd["Rad"][()], fs["Rad"][()])
            for var in ("U", "V", "U_raw", "V_raw"):
                d = np.abs(np.asarray(fd[var][()], np.int32)
                           - np.asarray(fs[var][()], np.int32))
                assert d.max() <= 5, f"pair {i} {var}: max short diff {d.max()}"
                assert (d == 0).mean() > 0.98, f"pair {i} {var}"

"""Single-device Pallas warp kernel in interpret mode on CPU.

tools/tpu_checks.py validates Mosaic lowering + bit-exactness on hardware;
these tests guard the kernel's dispatch/index logic on CI -- in particular
the 3-third fallback (``need3``), which small-|u| tests never reach: under
CPAD=64 and 128-aligned window origins, a per-block u-spread beyond ~127 px
pushes some column index past lane 255 and must dispatch the general
3-gather variant, bit-identical to the dense XLA gather.
"""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture
def interpret_pallas(monkeypatch):
    import octane_tpu.ops.pallas.warp as warpmod

    monkeypatch.setenv("OCTANE_PALLAS_INTERPRET", "1")
    warpmod._build.cache_clear()
    warpmod._stats_build.cache_clear()
    yield
    warpmod._build.cache_clear()
    warpmod._stats_build.cache_clear()


def _need3(u, v, h, w):
    """Reproduce the kernel's per-call third-dispatch decision on the host."""
    import octane_tpu.ops.pallas.warp as wm

    dv = wm._round_dv(wm.DV)
    bh = wm._pick_bh(h, dv)
    hp = -(-h // bh) * bh
    wp = -(-w // wm.BW) * wm.BW
    jv1, iv1, up, vp = wm._sample_indices(
        jnp.asarray(u), jnp.asarray(v), h, w, hp, wp)
    _, _, c_min, c_max, _ = wm._block_stats(jv1, iv1, vp, h, w, hp, wp, bh)
    s_col = jnp.clip(c_min // 128 * 128, 0, 1 << 30)
    return bool(jnp.any(c_max - s_col >= 255))


def _parity(h, w, u, v, seed=0):
    from octane_tpu.flow.stencil import warp_bilinear_dense
    from octane_tpu.ops.pallas.warp import make_pallas_warp

    rng = np.random.default_rng(seed)
    fields = jnp.asarray(rng.normal(0, 1, (6, h, w)).astype(np.float32))
    warp = make_pallas_warp((h, w))
    assert warp is not None
    got, gbx, gby = warp(fields, u, v)
    want, bx, by = warp_bilinear_dense(fields, u, v)
    # CPU interpret mode may FMA-contract the two separately-jitted
    # programs differently (~ulps); hardware bit-exactness (d == 0.0) is
    # asserted on the chip by tools/tpu_checks.py check_warp, including a
    # need3-forcing sawtooth case
    assert float(jnp.abs(got - want).max()) < 1e-5
    assert bool((gbx == bx).all() and (gby == by).all())


def test_three_third_fallback_bit_exact(interpret_pallas):
    """A ~120-px within-block u-spread forces need3=True (the general
    3-gather variant) while staying inside the window slack (no clamping):
    must be bit-exact vs the dense gather."""
    from octane_tpu.ops.pallas.warp import row_spread_within_reach

    h, w = 128, 256
    rng = np.random.default_rng(3)
    # 128-px sawtooth + jitter: within-128-lane-block column spread ~127 px
    # plus the 128-lane base span crosses lane 255 (need3) while staying
    # under the 382-lane window slack (no clamping)
    i = np.arange(w, dtype=np.float32)[None, :]
    u = ((i % 128) - 63.0 + rng.uniform(0, 0.9, (h, w))).astype(np.float32)
    v = rng.uniform(-2, 2, (h, w)).astype(np.float32)
    u, v = jnp.asarray(u), jnp.asarray(v)
    assert _need3(u, v, h, w), "test must exercise the 3-third variant"
    assert row_spread_within_reach(u, v, (h, w)), \
        "spread must stay inside the window (else clamping breaks parity)"
    _parity(h, w, u, v)


def test_two_third_path_bit_exact(interpret_pallas):
    """Small spread dispatches the cheap 2-third variant (need3=False)."""
    h, w = 128, 256
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.uniform(-5, 5, (h, w)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-5, 5, (h, w)).astype(np.float32))
    assert not _need3(u, v, h, w)
    _parity(h, w, u, v)


def test_large_uniform_bias_moves_window(interpret_pallas):
    """A jet-scale uniform displacement moves the data-driven window without
    touching the third third; bit-exact incl. boundary-clamped rows."""
    h, w = 128, 384
    rng = np.random.default_rng(5)
    u = jnp.asarray((150.0 + rng.uniform(-3, 3, (h, w))).astype(np.float32))
    v = jnp.asarray((-40.0 + rng.uniform(-3, 3, (h, w))).astype(np.float32))
    _parity(h, w, u, v)


def test_small_bucket_boundary_offset(interpret_pallas):
    """Row-bucket dispatch boundary: a within-block row spread whose maximum
    packed row offset is EXACTLY 2*dv_small + 1 must take the LARGE bucket
    (the kernel clips d2 to 2*dv, so the small bucket would silently sample
    one source row too high for the extreme pixels).  Regression test for
    the off-by-one fits_lo guard."""
    import jax.numpy as jnp
    import octane_tpu.ops.pallas.warp as wm

    h, w = 128, 256
    dv = wm._round_dv(wm.DV)
    dv_small = min(11, dv)
    bh = wm._pick_bh(h, dv)
    hp = -(-h // bh) * bh
    wp = -(-w // wm.BW) * wm.BW

    # v == 0 everywhere gives every block the constant packed row index
    # bh*(rb+1) (8-aligned, so s_row == r_min); a patch of v == 2*dv_small+1
    # in interior rows then makes r_max - s_row exactly 2*dv_small + 1 --
    # one past the small bucket's d2 clip range.
    v_np = np.zeros((h, w), np.float32)
    v_np[4:8, 10:40] = float(2 * dv_small + 1)
    u = jnp.zeros((h, w), jnp.float32)
    v = jnp.asarray(v_np)

    jv1, iv1, up, vp = wm._sample_indices(u, v, h, w, hp, wp)
    r_min, r_max, _, _, _ = wm._block_stats(jv1, iv1, vp, h, w, hp, wp, bh)
    s_row = jnp.clip(r_min // 8 * 8, 0, 1 << 30)
    assert int(jnp.max(r_max - s_row)) == 2 * dv_small + 1, \
        "test must land exactly on the dispatch boundary"
    assert wm.row_spread_within_reach(u, v, (h, w))
    _parity(h, w, u, v)


def test_stats_kernel_matches_xla_stats(interpret_pallas):
    """The banded Pallas stats kernel (the per-call window-origin pass) must
    reproduce _sample_indices + _block_stats exactly -- integer math, so
    array_equal, including boundary-clamped rows, padding, and a field frame
    larger than the output grid (the sharded halo case)."""
    import octane_tpu.ops.pallas.warp as wm

    rng = np.random.default_rng(11)
    for (h, w, fh, fw) in [(100, 130, 100, 130), (64, 128, 64, 128),
                           (200, 300, 220, 320)]:
        bh = wm._pick_bh(h, wm._round_dv(wm.DV))
        hp = -(-h // bh) * bh
        wp = -(-w // wm.BW) * wm.BW
        u = jnp.asarray(rng.normal(0, 5, (h, w)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 5, (h, w)).astype(np.float32))
        v = v.at[:3].add(-50.0).at[-3:].add(50.0)   # clamped rows (eflag)
        jv1, iv1, up, vp = wm._sample_indices(u, v, fh, fw, hp, wp)
        want = wm._block_stats(jv1, iv1, vp, h, w, hp, wp, bh, fh)
        got = wm._stats_build(h, w, fh, fw, bh, hp, wp)(up, vp)
        for name, a, b in zip(("rmin", "rmax", "cmin", "cmax", "ef"),
                              want, got):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{name} {h}x{w}")

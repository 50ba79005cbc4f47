"""Patch-match flow: oracle parity + translation recovery."""

import numpy as np
import jax.numpy as jnp
import pytest

from octane_tpu.flow.patch_match import patch_match_flow, spiral_offsets

import reference_impl as ref


def test_spiral_covers_square():
    off = spiral_offsets(2)
    assert len(off) == 25
    assert len({tuple(o) for o in off.tolist()}) == 25
    assert off[:, 0].min() == -2 and off[:, 0].max() == 2
    assert off[:, 1].min() == -2 and off[:, 1].max() == 2
    assert tuple(off[0]) == (0, 0)


def test_matches_oracle():
    rng = np.random.default_rng(5)
    h, w = 14, 16
    im1 = rng.normal(100, 25, (h, w)).astype(np.float32)
    im2 = np.roll(im1, (0, 1), axis=(0, 1)) + rng.normal(0, 0.5, (h, w)).astype(np.float32)
    z = np.zeros((h, w), np.float32)
    want_u, want_v = ref.patch_match(im1, im2, z, z, rad=2, srad=2)
    got_u, got_v = patch_match_flow(im1, im2, z, z, rad=2, srad=2)
    np.testing.assert_allclose(np.asarray(got_u), want_u, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=2e-3)


def test_matches_oracle_with_first_guess():
    rng = np.random.default_rng(7)
    h, w = 12, 12
    im1 = rng.normal(100, 25, (h, w)).astype(np.float32)
    im2 = np.roll(im1, (1, 2), axis=(0, 1)).astype(np.float32)
    u0 = np.full((h, w), 1.4, np.float32)
    v0 = np.full((h, w), 0.6, np.float32)
    want_u, want_v = ref.patch_match(im1, im2, u0, v0, rad=1, srad=2)
    got_u, got_v = patch_match_flow(im1, im2, u0, v0, rad=1, srad=2)
    np.testing.assert_allclose(np.asarray(got_u), want_u, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=2e-3)


def test_fast_path_matches_gather_path():
    """u0=None (slice-based) must equal u0=zeros (gather-based) exactly."""
    rng = np.random.default_rng(11)
    h, w = 18, 22
    im1 = rng.normal(100, 25, (h, w)).astype(np.float32)
    im2 = np.roll(im1, (1, -1), axis=(0, 1)) + rng.normal(0, 0.4, (h, w)).astype(np.float32)
    z = np.zeros((h, w), np.float32)
    want_u, want_v = patch_match_flow(im1, im2, z, z, rad=2, srad=2)
    got_u, got_v = patch_match_flow(im1, im2, None, None, rad=2, srad=2)
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


@pytest.mark.slow
def test_sharded_matches_single_device():
    # rad/srad 1 keeps the shard_map CPU compile fast; the halo/probe logic
    # exercised is identical to the production rad=srad=2
    import jax
    from octane_tpu.flow.patch_match import patch_match_flow_sharded
    from octane_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(13)
    h, w = 32, 64
    im1 = rng.normal(100, 25, (h, w)).astype(np.float32)
    im2 = np.roll(im1, (0, 1), axis=(0, 1)) + rng.normal(0, 0.4, (h, w)).astype(np.float32)
    want_u, want_v = patch_match_flow(im1, im2, None, None, rad=1, srad=1)
    mesh = make_mesh((2, 4))
    got_u, got_v = patch_match_flow_sharded(im1, im2, mesh, rad=1, srad=1)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-5)


@pytest.mark.slow
def test_sharded_non_divisible_shape():
    """Real sector dims rarely divide the mesh: the edge-replication pad
    must keep true pixels identical to the single-device fast path."""
    from octane_tpu.flow.patch_match import patch_match_flow_sharded
    from octane_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(17)
    h, w = 35, 61                       # divides neither dy=2 nor dx=4
    im1 = rng.normal(100, 25, (h, w)).astype(np.float32)
    im2 = np.roll(im1, (1, -1), axis=(0, 1)) \
        + rng.normal(0, 0.4, (h, w)).astype(np.float32)
    want_u, want_v = patch_match_flow(im1, im2, None, None, rad=1, srad=1)
    mesh = make_mesh((2, 4))
    got_u, got_v = patch_match_flow_sharded(im1, im2, mesh, rad=1, srad=1)
    assert got_u.shape == (h, w)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-5)


def test_integer_translation_recovered():
    rng = np.random.default_rng(9)
    h = w = 32
    im1 = rng.normal(100, 25, (h, w)).astype(np.float32)
    im2 = np.roll(im1, (0, 2), axis=(0, 1))
    z = np.zeros((h, w), np.float32)
    u, v = patch_match_flow(im1, im2, z, z, rad=2, srad=2)
    interior = np.asarray(u)[6:-6, 6:-6]
    # sub-pixel refinement perturbs exact integer matches slightly
    assert abs(np.median(interior) - 2.0) < 0.2
    assert abs(interior.mean() - 2.0) < 0.2
    assert abs(np.median(np.asarray(v)[6:-6, 6:-6])) < 0.2


def test_first_guess_scale_guard():
    """-sosm + first guess refuses beyond sector scale with a clear message
    (the guessed patch origins force full-field gathers; the zero-guess
    slice path stays available at any size)."""
    import jax.numpy as jnp
    import pytest
    from octane_tpu.flow import patch_match as pm

    big = pm.FIRST_GUESS_MAX_PIXELS
    h = 4096
    w = big // h + 1
    g = jnp.zeros((h, w), jnp.float32)
    u0 = jnp.zeros((h, w), jnp.float32)
    with pytest.raises(ValueError, match="sector-scale only"):
        pm.patch_match_flow(g, g, u0, u0)

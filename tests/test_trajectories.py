"""Trajectory chaining tests with synthetic (exact) flows."""

import pytest
import numpy as np
import jax.numpy as jnp

from dino_tracker_tpu.preprocessing import trajectories as traj_lib


def constant_flow(t, h, w, dx, dy):
    """Perfectly cycle-consistent constant-translation flow fields."""
    fwd = np.zeros((t - 1, 2, h, w), np.float32)
    fwd[:, 0] = dx
    fwd[:, 1] = dy
    bwd = -fwd.copy()
    return fwd, bwd


def test_compute_flow_masks_consistent_flow():
    t, h, w = 5, 16, 20
    fwd, bwd = constant_flow(t, h, w, 1.0, 0.0)
    masks = np.asarray(traj_lib.compute_flow_masks(
        jnp.asarray(fwd), jnp.asarray(bwd), threshold=1.0))
    assert masks.shape == (t, h, w)
    assert not masks[0].any()  # frame 0 defined as inconsistent
    # interior pixels of later frames are consistent (border misses fwd warp)
    assert masks[1:, :, 2:].mean() > 0.8


def test_static_scene_single_start_frame():
    """Zero flow: every pixel tracked from frame 0; later start frames add
    nothing thanks to look-behind dedup."""
    t, h, w = 4, 10, 12
    fwd, bwd = constant_flow(t, h, w, 0.0, 0.0)
    out = traj_lib.extract_trajectories(fwd, bwd, threshold=1.0)
    # all pixels spawn at frame 0 and survive everywhere
    from_start0 = out[~np.isnan(out[:, 0, 0])]
    assert from_start0.shape[0] == h * w
    # no duplicates: total trajectory count equals pixels that ever started
    assert out.shape[0] == h * w
    # static coords
    np.testing.assert_allclose(out[:, 0], out[:, -1], atol=1e-4)


def test_translation_tracks_move_and_die_at_border():
    t, h, w = 5, 12, 16
    dx = 2.0
    fwd, bwd = constant_flow(t, h, w, dx, 0.0)
    out = traj_lib.extract_trajectories(fwd, bwd, threshold=1.0)
    start0 = out[~np.isnan(out[:, 0, 0])]
    # a pixel starting at x=3 moves to x=3+2k
    xs0 = start0[:, 0, 0]
    sel = xs0 == 3.0
    tracked = start0[sel]
    for k in range(t):
        valid = ~np.isnan(tracked[:, k, 0])
        np.testing.assert_allclose(tracked[valid, k, 0], 3.0 + dx * k)
    # pixels near the right border die when pushed out of bounds
    far_right = start0[xs0 == w - 1.0]
    assert np.isnan(far_right[:, 1:, 0]).all()


def test_min_trajectory_length_filters():
    t, h, w = 4, 8, 8
    fwd, bwd = constant_flow(t, h, w, 0.0, 0.0)
    # poison the bwd flow at the last transition so frame-3 cycle fails
    bwd2 = bwd.copy()
    bwd2[2] += 10.0
    out = traj_lib.extract_trajectories(fwd, bwd2, threshold=1.0,
                                        min_trajectory_length=4)
    assert out.shape[0] == 0  # longest surviving segment is 3 frames


def test_direct_flow_filter_kills_inconsistent():
    t, h, w = 4, 8, 10
    fwd, bwd = constant_flow(t, h, w, 1.0, 0.0)

    def direct_fn(start):
        n = t - 1 - start
        dflows = np.zeros((n, h, w, 2), np.float32)
        for k in range(n):
            dflows[k, :, :, 0] = 1.0 * (k + 1)  # consistent with chaining
        dmasks = np.ones((n, h, w), np.float32)
        # make direct flow disagree on the top half
        dflows[:, : h // 2, :, 0] += 50.0
        return dflows, dmasks

    out = traj_lib.extract_trajectories(fwd, bwd, threshold=1.0,
                                        direct_flow_fn=direct_fn,
                                        direct_flow_threshold=2.5)
    start0 = out[~np.isnan(out[:, 0, 0])]
    ys = start0[:, 0, 1]
    # top-half trajectories die after frame 0 -> dropped by min length
    assert (ys >= h // 2 - 1).all()


def _noisy_flows(t, h, w, seed=3):
    """Translation flows with localized cycle breakage so the two passes
    (filtered / unfiltered) genuinely diverge and look-behind matters."""
    rng = np.random.default_rng(seed)
    fwd, bwd = constant_flow(t, h, w, 1.0, 0.0)
    # break the cycle check for a random pixel blob at each transition
    for k in range(t - 1):
        y0 = rng.integers(0, h - 3)
        x0 = rng.integers(0, w - 3)
        bwd[k, :, y0:y0 + 3, x0:x0 + 3] += 10.0
    return fwd, bwd


def _disagreeing_direct_fn(t, h, w):
    def direct_fn(start):
        n = t - 1 - start
        dflows = np.zeros((n, h, w, 2), np.float32)
        for k in range(n):
            dflows[k, :, :, 0] = 1.0 * (k + 1)
        dmasks = np.ones((n, h, w), np.float32)
        dflows[:, : h // 2, :, 0] += 50.0  # direct filter kills top half
        return dflows, dmasks
    return direct_fn


@pytest.mark.slow
def test_dual_extraction_matches_two_single_passes():
    """extract_trajectories_dual == the two independent reference-style
    script runs (with / without the direct filter), element-for-element."""
    t, h, w = 6, 12, 14
    fwd, bwd = _noisy_flows(t, h, w)
    direct_fn = _disagreeing_direct_fn(t, h, w)

    want_f = traj_lib.extract_trajectories(
        fwd, bwd, threshold=1.0, direct_flow_fn=direct_fn,
        direct_flow_threshold=2.5, min_trajectory_length=2)
    want_u = traj_lib.extract_trajectories(
        fwd, bwd, threshold=1.0, min_trajectory_length=2)
    got_f, got_u = traj_lib.extract_trajectories_dual(
        fwd, bwd, threshold=1.0, direct_flow_fn=direct_fn,
        direct_flow_threshold=2.5, min_trajectory_length=2)

    assert got_f.shape == want_f.shape
    assert got_u.shape == want_u.shape
    np.testing.assert_array_equal(got_f, want_f)
    np.testing.assert_array_equal(got_u, want_u)
    # the two passes genuinely diverge in this setup
    assert want_f.shape[0] != want_u.shape[0]


@pytest.mark.slow
@pytest.mark.parametrize("start_group", [1, 3, 4])
def test_grouped_decode_path_matches_fallback(start_group):
    """The traceable-decode path with multi-start group dispatch (the
    production TPU path; groups padded by repeating the last start) must
    equal the per-start fallback path element-for-element."""
    t, h, w = 6, 12, 14
    fwd, bwd = _noisy_flows(t, h, w)
    direct_fn = _disagreeing_direct_fn(t, h, w)

    # fake traceable decode: same fields as direct_fn, pure-jnp, padded to
    # the (t-1) rows the engine contract specifies
    base = np.zeros((t - 1, h, w, 2), np.float32)
    for k in range(t - 1):
        base[k, :, :, 0] = 1.0 * (k + 1)
    base[:, : h // 2, :, 0] += 50.0
    base_dev = jnp.asarray(base)

    def decode_fn(_unused, start, thresh):
        n = t - 1
        k = jnp.arange(n)
        # rows are relative to `start`: row k = direct flow start -> start+1+k
        rows = jnp.clip(k, 0, n - 1)
        dflows = jnp.where((k < n - start)[:, None, None, None],
                           base_dev[rows], 0.0)
        dmasks = jnp.where((k < n - start)[:, None, None],
                           jnp.ones((n, h, w), jnp.float32), 0.0)
        return dflows, dmasks

    want_f, want_u = traj_lib.extract_trajectories_dual(
        fwd, bwd, threshold=1.0, direct_flow_fn=direct_fn,
        direct_flow_threshold=2.5, min_trajectory_length=2)
    got_f, got_u = traj_lib.extract_trajectories_dual(
        fwd, bwd, threshold=1.0, decode=(decode_fn, (jnp.zeros(()),)),
        direct_flow_threshold=2.5, min_trajectory_length=2,
        start_group=start_group)
    np.testing.assert_array_equal(got_f, want_f)
    np.testing.assert_array_equal(got_u, want_u)

    if start_group == 4:  # mesh-wrapped group dispatch path (one variant)
        from dino_tracker_tpu.parallel.mesh import make_mesh
        m_f, m_u = traj_lib.extract_trajectories_dual(
            fwd, bwd, threshold=1.0, decode=(decode_fn, (jnp.zeros(()),)),
            direct_flow_threshold=2.5, min_trajectory_length=2,
            mesh=make_mesh(8), start_group=4)
        np.testing.assert_array_equal(np.asarray(m_f), want_f)
        np.testing.assert_array_equal(np.asarray(m_u), want_u)

"""Visualization tests: homography stabilization recovers camera motion,
drawing functions produce valid frames."""

import numpy as np

from dino_tracker_tpu.visualization import viz

RNG = np.random.default_rng(41)


def test_estimate_homographies_recovers_translation():
    """Background points shifted by a per-frame camera translation: the
    homography to the canonical frame must undo it."""
    n, t = 120, 6
    base = RNG.random((n, 2)).astype(np.float64) * [300, 200]
    shifts = np.stack([np.arange(t) * 5.0, np.arange(t) * -3.0], -1)  # T×2
    tracks = base[:, None, :] + shifts[None]
    occ = np.zeros((n, t), bool)
    homogs = viz.estimate_homographies(tracks, occ, canonical_frame=0)
    for f in range(t):
        pts = viz._apply_homography(tracks[:, f], homogs[f])
        np.testing.assert_allclose(pts, base, atol=0.5)


def test_filter_bg_trajectories():
    n, t = 200, 8
    traj = RNG.random((n, t, 2)).astype(np.float32) * 100
    traj[:50, 3:] = np.nan  # short trajectories
    out = viz.filter_bg_trajectories_for_homographies(traj, count=64,
                                                      canonical_frame=4)
    assert out.shape[0] > 0
    # every picked trajectory is valid at the canonical frame
    assert not np.isnan(out[:, 4]).any()


def test_plot_tracks_and_tails_shapes():
    t, h, w, n = 4, 60, 80, 10
    video = (RNG.random((t, h, w, 3)) * 255).astype(np.uint8)
    tracks = RNG.random((n, t, 2)).astype(np.float32) * [w - 1, h - 1]
    occ = RNG.random((n, t)) < 0.3
    dotted = viz.plot_tracks(video, tracks, occ)
    assert dotted.shape == video.shape and dotted.dtype == np.uint8
    trails = viz.plot_tracks_tails(video, tracks, occ)
    assert trails.shape == video.shape
    overlay = viz.overlay_pred_gt(video, tracks, occ, tracks, occ)
    assert overlay.shape == video.shape
    # drawing changed pixels
    assert (dotted != video).any()


def test_erode_mask():
    m = np.zeros((20, 20), np.float32)
    m[5:15, 5:15] = 1.0
    e = viz.erode_mask(m, 3)
    assert e.sum() < m.sum()
    assert e[10, 10] == 1.0 and e[5, 5] == 0.0

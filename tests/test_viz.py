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


def test_estimate_homographies_pan_with_outliers():
    """Synthetic camera pan with 30% gross outliers (foreground-like
    motion): RANSAC must recover the pan for the inlier set, and warped
    inlier points must land back on their canonical positions."""
    n, t, w, h = 150, 7, 320, 240
    base = RNG.random((n, 2)).astype(np.float64) * [w * 0.8, h * 0.8] + \
        [w * 0.1, h * 0.1]
    shifts = np.stack([np.arange(t) * 8.0, np.arange(t) * 4.0], -1)
    tracks = base[:, None, :] + shifts[None]
    # 30% outliers: random independent motion per frame
    n_out = int(n * 0.3)
    tracks[:n_out] = RNG.random((n_out, t, 2)) * [w, h]
    occ = np.zeros((n, t), bool)
    homogs = viz.estimate_homographies(tracks, occ, canonical_frame=0,
                                       image_dimensions=(w, h))
    for f in range(t):
        pts = viz._apply_homography(tracks[n_out:, f], homogs[f])
        np.testing.assert_allclose(pts, base[n_out:], atol=1.0,
                                   err_msg=f"frame {f}")


def test_estimate_homographies_low_inlier_fallback():
    """Frames with too few mutual visible points (or no consensus) must
    fall back to the nearest successful estimate instead of a garbage fit —
    the stabilization stays finite and continuous."""
    n, t = 30, 5
    base = RNG.random((n, 2)).astype(np.float64) * [300, 200]
    shifts = np.stack([np.arange(t) * 5.0, np.arange(t) * 0.0], -1)
    tracks = base[:, None, :] + shifts[None]
    occ = np.zeros((n, t), bool)
    occ[:, 3] = True  # frame 3: nothing visible
    occ[5:, 4] = True  # frame 4: only 5 points (< 8 minimum)
    homogs = viz.estimate_homographies(tracks, occ, canonical_frame=0,
                                       image_dimensions=(320, 240))
    assert np.isfinite(homogs).all()
    # frames 3 and 4 chain the last good estimate (frame 2's)
    np.testing.assert_allclose(homogs[3], homogs[2])
    np.testing.assert_allclose(homogs[4], homogs[3])
    # frames 1-2 still recover the pan
    pts = viz._apply_homography(tracks[:, 2], homogs[2])
    np.testing.assert_allclose(pts, base, atol=0.5)


def test_canonical_homographies_recover_pan():
    """Canonical-point estimator (reference get_homographies_wrt_frame,
    viz_utils_tapir.py:499-662): a pure camera pan must be undone — every
    frame's homography maps its points onto the canonical positions."""
    n, t, w, h = 120, 6, 320, 240
    base = RNG.random((n, 2)).astype(np.float64) * [w * 0.7, h * 0.7] + \
        [w * 0.1, h * 0.1]
    shifts = np.stack([np.arange(t) * 6.0, np.arange(t) * -4.0], -1)
    tracks = base[:, None, :] + shifts[None]
    occ = np.zeros((n, t), bool)
    homogs, err, canon = viz.estimate_homographies_canonical(
        tracks, occ, image_dimensions=(w, h), reference_frame=0)
    assert homogs.shape == (t, 3, 3) and canon.shape == (n, 2)
    # canonical points converge to the reference-frame positions
    np.testing.assert_allclose(canon, base, atol=0.5)
    for f in range(t):
        pts = viz._apply_homography(tracks[:, f], homogs[f])
        np.testing.assert_allclose(pts, base, atol=0.5, err_msg=f"frame {f}")
    assert (err < (0.07 / 2) ** 2).all()


def test_canonical_homographies_outliers_and_partial_visibility():
    """30% gross outliers + points never visible at the reference frame:
    RANSAC with evolving canonical points must still register every frame
    (the canonical average lets non-reference-visible points contribute
    through intermediate frames — the advantage over the direct cv2 path)."""
    n, t, w, h = 150, 7, 320, 240
    base = RNG.random((n, 2)).astype(np.float64) * [w * 0.7, h * 0.7] + \
        [w * 0.1, h * 0.1]
    shifts = np.stack([np.arange(t) * 8.0, np.arange(t) * 4.0], -1)
    tracks = base[:, None, :] + shifts[None]
    n_out = int(n * 0.3)
    tracks[:n_out] = RNG.random((n_out, t, 2)) * [w, h]
    occ = np.zeros((n, t), bool)
    occ[n_out:n_out + 30, :2] = True  # 30 inliers hidden at ref frame 0
    homogs, _, _ = viz.estimate_homographies_canonical(
        tracks, occ, image_dimensions=(w, h), reference_frame=0)
    assert np.isfinite(homogs).all()
    for f in range(t):
        pts = viz._apply_homography(tracks[n_out:, f], homogs[f])
        np.testing.assert_allclose(pts, base[n_out:], atol=1.5,
                                   err_msg=f"frame {f}")


def test_canonical_homographies_default_reference_is_middle():
    """No reference_frame -> t//2, whose homography is the identity."""
    n, t, w, h = 60, 5, 160, 120
    base = RNG.random((n, 2)).astype(np.float64) * [w * 0.8, h * 0.8]
    tracks = np.repeat(base[:, None, :], t, axis=1)
    occ = np.zeros((n, t), bool)
    homogs, _, _ = viz.estimate_homographies_canonical(
        tracks, occ, image_dimensions=(w, h))
    np.testing.assert_allclose(homogs[t // 2], np.eye(3), atol=1e-9)


def test_canonical_homographies_degenerate_frame_falls_back():
    """A frame whose visible points are all collinear (every 4-point DLT
    draw rank-deficient) must chain a neighboring estimate instead of
    emitting a singular H — plot_tracks_tails inverts every homography."""
    n, t, w, h = 40, 6, 160, 120
    base = RNG.random((n, 2)).astype(np.float64) * [w * 0.8, h * 0.8]
    tracks = np.repeat(base[:, None, :], t, axis=1)
    # frame 4: collapse every point onto one line (x, 0.3x + 5)
    tracks[:, 4, 1] = 0.3 * tracks[:, 4, 0] + 5.0
    occ = np.zeros((n, t), bool)
    homogs, _, _ = viz.estimate_homographies_canonical(
        tracks, occ, image_dimensions=(w, h), reference_frame=0)
    assert np.isfinite(homogs).all()
    inv = np.linalg.inv(homogs)  # raises LinAlgError on a singular fit
    assert np.isfinite(inv).all()
    video = np.zeros((t, h, w, 3), np.uint8)
    tails = viz.plot_tracks_tails(video, tracks.astype(np.float32), occ,
                                  homogs=homogs)
    assert tails.shape == video.shape


def test_plot_tracks_tails_fade_dims_older_segments():
    """Reference trail_fade semantics (viz_utils_tapir.py:758): segment
    alpha decays with age, so on a black video the oldest trail pixels are
    dimmer than the newest."""
    t, h, w = 8, 40, 200
    video = np.zeros((t, h, w, 3), np.uint8)
    xs = np.linspace(10, 180, t, dtype=np.float32)
    tracks = np.stack([xs, np.full(t, 20.0, np.float32)], -1)[None]  # 1×T×2
    occ = np.zeros((1, t), bool)
    tails = viz.plot_tracks_tails(video, tracks, occ, point_size=1)
    last = tails[-1].astype(np.int32).sum(-1)  # brightness at frame T-1
    old_seg = last[20, int((xs[0] + xs[1]) / 2)]
    new_seg = last[20, int((xs[-2] + xs[-1]) / 2)]
    assert 0 < old_seg < new_seg
    # fade off -> uniform brightness
    flat = viz.plot_tracks_tails(video, tracks, occ, point_size=1,
                                 trail_fade=False)[-1].astype(np.int32).sum(-1)
    assert flat[20, int((xs[0] + xs[1]) / 2)] == flat[
        20, int((xs[-2] + xs[-1]) / 2)]


def test_plot_tracks_tails_survives_extreme_homographies():
    """Near-degenerate homography chains reproject points to inf/NaN or past
    C-int range; cv2.line hard-errors on those — they must be dropped/clipped
    (found by driving cli.visualize on a collinear-frame video)."""
    t, h, w, n = 4, 60, 80, 12
    video = np.zeros((t, h, w, 3), np.uint8)
    tracks = RNG.random((n, t, 2)).astype(np.float32) * [w - 1, h - 1]
    occ = np.zeros((n, t), bool)
    homogs = np.tile(np.eye(3)[None], (t, 1, 1))
    # strong perspective row: many points land near the w=0 horizon
    homogs[2] = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.05, 0.05, -1.0]])
    tails = viz.plot_tracks_tails(video, tracks, occ, homogs=homogs)
    assert tails.shape == video.shape


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

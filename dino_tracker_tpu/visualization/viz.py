"""Track visualization: dotted tracks, stabilized motion trails, pred-vs-gt.

Functional equivalents of the reference visualization/ package
(visualize_rainbow.py, viz_utils_tapir.py ``plot_tracks_v2`` /
``plot_tracks_tails`` / ``get_homographies_wrt_frame``,
visualize_pred_vs_gt.py), drawn with OpenCV primitives instead of a
matplotlib figure per frame (same outputs: uint8 T×H×W×3 videos; occluded
points hidden or drawn hollow; trails stabilized by RANSAC homographies
estimated from background flow trajectories).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def rainbow_colors(n: int, rainbow: bool = True, seed: int = 0) -> np.ndarray:
    """n×3 uint8 BGR-independent RGB colors from the HSV wheel. With
    rainbow=False the hue order is shuffled (reference plot_tracks_v2
    z_list permutation)."""
    import matplotlib.cm as cm
    idx = np.arange(n)
    if not rainbow:
        idx = np.random.default_rng(seed).permutation(n)[idx % n]
    colors = cm.hsv(idx / max(n, 1))[:, :3]
    return (colors * 255).astype(np.uint8)


def plot_tracks(video_thwc: np.ndarray, tracks: np.ndarray,
                occluded: np.ndarray, point_size: int = 4,
                rainbow: bool = True,
                show_occluded_hollow: bool = False) -> np.ndarray:
    """Dotted-track video. tracks: N×T×2 pixel coords; occluded: N×T.

    Occluded points are hidden (alpha-0 in the reference) unless
    ``show_occluded_hollow`` draws them as outline circles.
    """
    import cv2
    t, h, w = video_thwc.shape[:3]
    n = tracks.shape[0]
    colors = rainbow_colors(n, rainbow)
    out = []
    for i in range(t):
        frame = np.ascontiguousarray(video_thwc[i].copy())
        pts = np.clip(tracks[:, i], 0, [w - 1, h - 1])
        for p in range(n):
            x, y = int(round(float(pts[p, 0]))), int(round(float(pts[p, 1])))
            color = tuple(int(c) for c in colors[p])
            if occluded[p, i]:
                if show_occluded_hollow:
                    cv2.circle(frame, (x, y), point_size, color, 1,
                               lineType=cv2.LINE_AA)
            else:
                cv2.circle(frame, (x, y), point_size, color, -1,
                           lineType=cv2.LINE_AA)
        out.append(frame)
    return np.stack(out)


def filter_bg_trajectories_for_homographies(bg_trajectories: np.ndarray,
                                            count: int = 500,
                                            canonical_frame: Optional[int] = None,
                                            min_len: int = 10,
                                            seed: int = 0) -> np.ndarray:
    """Pick long background trajectories covering every frame w.r.t. the
    canonical frame (reference visualize_rainbow.py:32-54)."""
    n, t = bg_trajectories.shape[:2]
    if canonical_frame is None:
        canonical_frame = t // 2
    valid = ~np.isnan(bg_trajectories).any(axis=-1)  # N×T
    lengths = valid.sum(axis=1)
    rng = np.random.default_rng(seed)
    per_frame = max(count // t, 1)
    picks = []
    for f in range(t):
        ok = valid[:, f] & valid[:, canonical_frame]
        idx = np.where(ok & (lengths > min_len))[0]
        if len(idx) < per_frame:
            idx = np.where(ok & (lengths > 5))[0]
        if len(idx) == 0:
            continue
        picks.append(rng.permutation(idx)[:per_frame])
    if not picks:
        return bg_trajectories[:0]
    uniq = np.unique(np.concatenate(picks))
    return bg_trajectories[uniq]


def estimate_homographies(bg_tracks: np.ndarray, occluded: np.ndarray,
                          canonical_frame: Optional[int] = None,
                          ransac_threshold: float = 0.014,
                          image_dimensions: Optional[Tuple[int, int]] = None,
                          min_inlier_frac: float = 0.25) -> np.ndarray:
    """Per-frame homography to the canonical frame from background tracks.

    RANSAC in NORMALIZED [0, 1] coordinates (the reference's own RANSAC
    rescales for numerical stability, viz_utils_tapir.py:389-441,530-534;
    its default outlier threshold is 0.07 of the image extent with two
    refinement passes — cv2.findHomography's LMeDS-polished RANSAC fills
    the same role here, with a tighter threshold since a single pass does
    both ransac + refinement). ``ransac_threshold`` is a fraction of the
    image extent; ``image_dimensions`` is (width, height) (inferred from
    the track extent when absent).

    Degenerate / low-inlier cases fall back to the previous frame's
    homography (identity at the start), keeping the trail stabilization
    finite and continuous instead of snapping through a garbage fit.

    Returns T×3×3 with identity at the canonical frame.
    """
    import cv2
    n, t = bg_tracks.shape[:2]
    if canonical_frame is None:
        canonical_frame = t // 2
    if image_dimensions is None:
        finite = bg_tracks[~occluded.astype(bool)]
        upper = finite.max(axis=0) if len(finite) else np.ones(2)
        image_dimensions = (max(float(upper[0]), 1.0),
                            max(float(upper[1]), 1.0))
    wh = np.asarray(image_dimensions, np.float64)
    s = np.diag([1.0 / wh[0], 1.0 / wh[1], 1.0])
    s_inv = np.diag([wh[0], wh[1], 1.0])

    homogs = np.tile(np.eye(3, dtype=np.float64)[None], (t, 1, 1))
    visible = ~occluded.astype(bool)

    def fit(f):
        ok = visible[:, f] & visible[:, canonical_frame]
        if ok.sum() < 8:
            return None
        src = bg_tracks[ok, f].astype(np.float64) / wh
        dst = bg_tracks[ok, canonical_frame].astype(np.float64) / wh
        hm, inliers = cv2.findHomography(src, dst, cv2.RANSAC,
                                         ransac_threshold)
        if hm is None or not np.isfinite(hm).all():
            return None
        if inliers is not None and inliers.sum() < max(
                8, min_inlier_frac * len(src)):
            return None
        return s_inv @ hm @ s

    # sweep outward from the canonical frame so the fallback chains the
    # nearest successful estimate (reference processes frames after the
    # reference frame ascending, then before it descending — :556-560)
    order = list(range(canonical_frame + 1, t)) + \
        list(range(canonical_frame - 1, -1, -1))
    for f in order:
        hm = fit(f)
        if hm is None:
            prev = f - 1 if f > canonical_frame else f + 1
            hm = homogs[prev]
        homogs[f] = hm
    return homogs


def _apply_homography(pts_n2: np.ndarray, hm: np.ndarray) -> np.ndarray:
    hom = np.concatenate([pts_n2, np.ones_like(pts_n2[:, :1])], axis=1)
    out = hom @ hm.T
    return out[:, :2] / np.clip(out[:, 2:3], 1e-8, None)


def plot_tracks_tails(video_thwc: np.ndarray, tracks: np.ndarray,
                      occluded: np.ndarray, homogs: Optional[np.ndarray] = None,
                      point_size: int = 4, linewidth: int = 1,
                      tail_length: Optional[int] = None) -> np.ndarray:
    """Motion-trail video: each point drags its (camera-stabilized) past
    positions (reference viz_utils_tapir.py:665-780). ``homogs[f]`` maps
    frame-f coords to the canonical frame; past points are re-projected into
    the current frame via inv(H_i) @ H_j."""
    import cv2
    t, h, w = video_thwc.shape[:3]
    n = tracks.shape[0]
    colors = rainbow_colors(n, rainbow=True)
    if homogs is None:
        homogs = np.tile(np.eye(3)[None], (t, 1, 1))
    inv_homogs = np.linalg.inv(homogs)
    out = []
    for i in range(t):
        frame = np.ascontiguousarray(video_thwc[i].copy())
        start = 0 if tail_length is None else max(0, i - tail_length)
        # past positions re-projected into frame i
        proj = []
        for j in range(start, i + 1):
            warped = _apply_homography(tracks[:, j], inv_homogs[i] @ homogs[j])
            proj.append(warped)
        proj = np.stack(proj, axis=1)  # N×(i-start+1)×2
        vis = ~occluded[:, start:i + 1].astype(bool)
        for p in range(n):
            color = tuple(int(c) for c in colors[p])
            seg = proj[p]
            ok = vis[p]
            for j in range(len(seg) - 1):
                if ok[j] and ok[j + 1]:
                    a = (int(round(seg[j, 0])), int(round(seg[j, 1])))
                    b = (int(round(seg[j + 1, 0])), int(round(seg[j + 1, 1])))
                    cv2.line(frame, a, b, color, linewidth, cv2.LINE_AA)
            if not occluded[p, i]:
                x, y = int(round(tracks[p, i, 0])), int(round(tracks[p, i, 1]))
                cv2.circle(frame, (x, y), point_size, color, -1, cv2.LINE_AA)
        out.append(frame)
    return np.stack(out)


def overlay_pred_gt(video_thwc: np.ndarray, pred_tracks: np.ndarray,
                    pred_occluded: np.ndarray, gt_tracks: np.ndarray,
                    gt_occluded: np.ndarray, point_size: int = 4) -> np.ndarray:
    """Prediction-vs-GT overlay (reference visualize_pred_vs_gt.py:21-38):
    filled circle = visible prediction, cross = occluded prediction,
    hollow diamond-ish circle = ground truth."""
    import cv2
    t = video_thwc.shape[0]
    n = pred_tracks.shape[0]
    colors = rainbow_colors(n, rainbow=True)
    out = []
    for i in range(t):
        frame = np.ascontiguousarray(video_thwc[i].copy())
        for p in range(n):
            color = tuple(int(c) for c in colors[p])
            x, y = (int(round(pred_tracks[p, i, 0])),
                    int(round(pred_tracks[p, i, 1])))
            if pred_occluded[p, i]:
                d = point_size
                cv2.line(frame, (x - d, y - d), (x + d, y + d), color, 1,
                         cv2.LINE_AA)
                cv2.line(frame, (x - d, y + d), (x + d, y - d), color, 1,
                         cv2.LINE_AA)
            else:
                cv2.circle(frame, (x, y), point_size, color, -1, cv2.LINE_AA)
            if not gt_occluded[p, i]:
                gx, gy = (int(round(gt_tracks[p, i, 0])),
                          int(round(gt_tracks[p, i, 1])))
                cv2.circle(frame, (gx, gy), point_size + 2, color, 1,
                           cv2.LINE_AA)
        out.append(frame)
    return np.stack(out)


def erode_mask(mask_hw: np.ndarray, kernel_size: int) -> np.ndarray:
    """Binary erosion (replaces kornia.morphology.erosion,
    visualize_rainbow.py:90)."""
    import cv2
    kernel = np.ones((kernel_size, kernel_size), np.uint8)
    return cv2.erode(mask_hw.astype(np.uint8), kernel).astype(mask_hw.dtype)

"""TAP-Vid metric tests: hand-computed mini-cases + (when available) parity
against the reference implementation at /root/reference."""

import os
import sys

import numpy as np
import pytest

from dino_tracker_tpu.evaluation import metrics as M

RNG = np.random.default_rng(13)


def perfect_case(n=3, t=5):
    qp = np.zeros((1, n, 3), np.float32)
    qp[0, :, 0] = [0, 2, 4][:n]  # query frames
    gt_tracks = RNG.random((1, n, t, 2)).astype(np.float32) * 200
    gt_occ = np.zeros((1, n, t), bool)
    return qp, gt_occ, gt_tracks


def test_perfect_predictions_score_one():
    qp, gt_occ, gt_tracks = perfect_case()
    m = M.compute_tapvid_metrics(qp, gt_occ, gt_tracks, gt_occ.copy(),
                                 gt_tracks.copy(), "strided")
    assert m["occlusion_accuracy"][0] == 1.0
    assert m["average_jaccard"][0] == 1.0
    assert m["average_pts_within_thresh"][0] == 1.0


def test_strided_excludes_query_frame():
    """An error placed exactly on the query frame must not hurt metrics."""
    qp, gt_occ, gt_tracks = perfect_case(n=1, t=5)
    qp[0, 0, 0] = 2
    pred = gt_tracks.copy()
    pred[0, 0, 2] += 100.0  # only wrong at the query frame
    m = M.compute_tapvid_metrics(qp, gt_occ, gt_tracks, gt_occ.copy(), pred,
                                 "strided")
    assert m["average_jaccard"][0] == 1.0


def test_first_mode_excludes_frames_before_query():
    qp, gt_occ, gt_tracks = perfect_case(n=1, t=5)
    qp[0, 0, 0] = 2
    pred = gt_tracks.copy()
    pred[0, 0, :2] += 100.0  # wrong before the query frame
    m = M.compute_tapvid_metrics(qp, gt_occ, gt_tracks, gt_occ.copy(), pred,
                                 "first")
    assert m["average_pts_within_thresh"][0] == 1.0
    m2 = M.compute_tapvid_metrics(qp, gt_occ, gt_tracks, gt_occ.copy(), pred,
                                  "strided")
    assert m2["average_pts_within_thresh"][0] < 1.0


def test_threshold_ladder_hand_case():
    """One point offset by 3px: fails pts_within_{1,2}, passes {4,8,16}."""
    qp, gt_occ, gt_tracks = perfect_case(n=1, t=2)
    qp[0, 0, 0] = 0
    pred = gt_tracks.copy()
    pred[0, 0, 1, 0] += 3.0
    m = M.compute_tapvid_metrics(qp, gt_occ, gt_tracks, gt_occ.copy(), pred,
                                 "strided")
    assert m["pts_within_1"][0] == 0.0
    assert m["pts_within_2"][0] == 0.0
    assert m["pts_within_4"][0] == 1.0


def test_occlusion_jaccard_interplay():
    """A visible point predicted occluded is a false negative for Jaccard."""
    qp, gt_occ, gt_tracks = perfect_case(n=1, t=3)
    pred_occ = gt_occ.copy()
    pred_occ[0, 0, 1] = True  # wrongly predicted occluded at frame 1
    m = M.compute_tapvid_metrics(qp, gt_occ, gt_tracks, pred_occ,
                                 gt_tracks.copy(), "strided")
    # frames 1, 2 evaluated; tp=1 (frame 2), gt_pos=2, fp=0 -> jaccard = 1/2
    assert m["jaccard_1"][0] == 0.5
    assert m["occlusion_accuracy"][0] == 0.5
    # pts_within ignores predicted occlusion
    assert m["pts_within_1"][0] == 1.0


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_parity_with_reference_implementation():
    sys.path.insert(0, "/root/reference")
    try:
        from eval.metrics import compute_tapvid_metrics as ref_metrics
    finally:
        sys.path.pop(0)

    b, n, t = 2, 7, 6
    qp = np.concatenate([RNG.integers(0, t, (b, n, 1)).astype(np.float32),
                         RNG.random((b, n, 2), dtype=np.float32) * 256], -1)
    gt_occ = RNG.random((b, n, t)) < 0.2
    pred_occ = RNG.random((b, n, t)) < 0.2
    gt_trk = RNG.random((b, n, t, 2)).astype(np.float32) * 256
    pred_trk = gt_trk + RNG.standard_normal((b, n, t, 2)).astype(np.float32) * 4

    for mode in ["strided", "first"]:
        ours = M.compute_tapvid_metrics(qp, gt_occ, gt_trk, pred_occ,
                                        pred_trk, mode)
        ref = ref_metrics(qp, gt_occ, gt_trk, pred_occ, pred_trk, mode)
        for k in ref:
            np.testing.assert_allclose(ours[k], ref[k], atol=1e-6,
                                       err_msg=f"{mode}/{k}")


def test_per_video_assembly_roundtrip(tmp_path):
    """compute_tapvid_metrics_for_video: saved .npy predictions + benchmark
    dict -> perfect predictions score 1.0 after the 256× rescale."""
    import os
    h, w, t, n = 120, 160, 5, 3
    gt = RNG.random((n, t, 2)).astype(np.float32) * [w - 1, h - 1]
    occ = np.zeros((n, t), bool)
    qp = [[float(gt[i, 0, 0]), float(gt[i, 0, 1])] for i in range(n)]
    benchmark = {"videos": [{"video_idx": 0, "h": h, "w": w,
                             "query_points": {0: qp},
                             "target_points": {0: gt},
                             "occluded": {0: occ}}]}
    # predictions at a different (model) resolution: scale gt accordingly
    pw, ph = 80, 60
    pred = gt * np.asarray([pw / w, ph / h], np.float32)
    tdir = tmp_path / "trajectories"; tdir.mkdir()
    odir = tmp_path / "occlusions"; odir.mkdir()
    np.save(tdir / "trajectories_0.npy", pred)
    np.save(odir / "occlusion_preds_0.npy", occ)
    m = M.compute_tapvid_metrics_for_video(str(tdir), str(odir), benchmark, 0,
                                           pred_video_sizes=[pw, ph])
    assert abs(m["average_jaccard"] - 1.0) < 1e-6
    assert abs(m["occlusion_accuracy"] - 1.0) < 1e-6


def test_badja_metrics(tmp_path):
    h, w, t, n = 100, 100, 4, 2
    segs = np.zeros((t, h, w), np.float32)
    segs[:, 20:80, 20:80] = 1.0  # area 3600 -> thr = 12
    gt = np.full((n, t, 2), 50.0, np.float32)
    occ = np.zeros((n, t))
    pred = gt.copy()
    pred[0] += 5.0   # within seg thr (12), outside 3px
    pred[1] += 1.0   # within both
    tdir = tmp_path / "traj"; tdir.mkdir()
    np.save(tdir / "trajectories_0.npy", pred)
    benchmark = {"videos": [{"video_idx": 0, "h": h, "w": w,
                             "target_points": {0: gt}, "occluded": {0: occ},
                             "segmentations": segs}]}
    m = M.compute_badja_metrics_for_video(str(tdir), benchmark, 0)
    assert abs(m["acc_seg"] - 100.0) < 1e-6
    assert abs(m["acc_3px"] - 50.0) < 1e-6

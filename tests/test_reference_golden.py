"""Golden parity tests against the REFERENCE'S OWN torch modules.

Every other parity test in this suite compares against builder-written torch
mirrors, which could encode the same misreading twice. These tests import the
reference's actual code (pure-python + CPU-torch importable modules:
models/networks/tracker_head.py, models/networks/conv_norm.py,
eval/metrics.py, data/dataset.py) and assert our JAX implementations
reproduce it on shared random inputs.

The reference hardcodes device='cuda' in RangeNormalizer's default arg
(data/dataset.py:15); we rebind that single default to 'cpu' so its forward
runs on the in-env CPU torch — no reference logic is altered.
"""

import math
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE),
    reason="reference checkout not present on this machine")
if REFERENCE not in sys.path:
    sys.path.append(REFERENCE)

import jax
import jax.numpy as jnp

from dino_tracker_tpu.evaluation import metrics as our_metrics
from dino_tracker_tpu.models import tracker_head as our_head
from dino_tracker_tpu.utils import coords as coord_utils


@pytest.fixture(scope="module")
def ref_modules():
    from data import dataset as ref_dataset  # noqa: reference import
    from models.networks import conv_norm as ref_conv_norm
    from models.networks import tracker_head as ref_tracker_head
    from eval import metrics as ref_metrics
    # reference RangeNormalizer defaults to device='cuda'
    # (data/dataset.py:15); run it on the CPU torch in this env
    ref_dataset.RangeNormalizer.__init__.__defaults__ = ("cpu",)
    return ref_dataset, ref_conv_norm, ref_tracker_head, ref_metrics


def test_range_normalizer_matches_reference(ref_modules):
    ref_dataset = ref_modules[0]
    rng = np.random.default_rng(0)
    shapes = (854.0, 476.0, 50.0)
    x = (rng.random((64, 3)) * np.asarray([853, 475, 49])).astype(np.float32)

    ref_norm = ref_dataset.RangeNormalizer(shapes=shapes)
    ours = coord_utils.make_range_normalizer(shapes)
    for dst in [(0.0, 1.0), (-1.0, 1.0)]:
        for dims in [[0, 1, 2], [0, 1]]:
            ref = ref_norm(torch.from_numpy(x), dst=dst, dims=dims).numpy()
            got = np.asarray(coord_utils.normalize_range(
                jnp.asarray(x), ours, dst=dst, dims=tuple(dims)))
            np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
            # and the inverse (reference data/dataset.py:39-53)
            ref_un = ref_norm.unnormalize(torch.from_numpy(ref), src=dst,
                                          dims=dims).numpy()
            got_un = np.asarray(coord_utils.unnormalize_range(
                jnp.asarray(ref), ours, src=dst, dims=tuple(dims)))
            np.testing.assert_allclose(got_un, ref_un, atol=1e-4, rtol=1e-5)


def test_normalized_conv2d_matches_reference(ref_modules):
    _, ref_conv_norm, _, _ = ref_modules
    rng = np.random.default_rng(1)
    in_ch, out_ch, k = 3, 5, 3
    conv = ref_conv_norm.NormalizedConv2d(in_ch, out_ch, k, padding=k // 2)
    w = rng.standard_normal((out_ch, in_ch, k, k)).astype(np.float32)
    # plant an exactly-representable sub-EPS spatial sum (one element, no
    # accumulation rounding) to exercise the |sum|<1e-8 sign guard
    # (reference conv_norm.py:34-40)
    w[0, 0] = 0.0
    w[0, 0, 1, 1] = 1e-9
    b = rng.standard_normal((out_ch,)).astype(np.float32)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))

    x = rng.standard_normal((2, in_ch, 17, 23)).astype(np.float32)
    ref = conv(torch.from_numpy(x)).detach().numpy()

    params = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}
    got = our_head.normalized_conv2d(
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), params, kernel_size=k)
    got = np.asarray(jnp.transpose(got, (0, 3, 1, 2)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("video_hw", [(140, 238), (476, 854)])
def test_tracker_head_matches_reference(ref_modules, video_hw):
    """Full head forward: raw-argmax + normalized convs + softmax + masked
    soft-argmax + (-1,1) normalization (reference tracker_head.py:107-121),
    with the reference's own weights loaded into our layout."""
    _, _, ref_tracker_head, _ = ref_modules
    video_h, video_w = video_hw
    stride, patch = 7, 14
    hp = 1 + (video_h - patch) // stride
    wp = 1 + (video_w - patch) // stride

    head = ref_tracker_head.TrackerHead(
        use_cnn_refiner=True, patch_size=patch, step_h=stride, step_w=stride,
        video_h=video_h, video_w=video_w)

    rng = np.random.default_rng(2)
    b = 16
    cost = rng.random((b, 1, hp, wp)).astype(np.float32)
    # a few rows with a dominant peak (typical post-ReLU cosine volume)
    cost[:4, 0, hp // 3, wp // 2] = 3.0

    ref = head(torch.from_numpy(cost)).detach().numpy()

    def to_jax(conv):
        return {"w": jnp.asarray(conv.weight.detach().numpy()
                                 .transpose(2, 3, 1, 0)),
                "b": jnp.asarray(conv.bias.detach().numpy())}

    params = {"conv1": to_jax(head.cnn_refiner[0]),
              "conv2": to_jax(head.cnn_refiner[2])}
    got = np.asarray(our_head.apply_tracker_head(
        params, jnp.asarray(cost), (video_h, video_w),
        patch_size=patch, stride=stride, argmax_radius=35.0))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_tracker_head_zero_sum_fallback_matches_reference(ref_modules):
    """The uniform-inside-mask fallback for an all-(near-)zero masked heatmap
    (reference tracker_head.py:87-94): force the refined softmax mass far
    outside the argmax circle."""
    _, _, ref_tracker_head, _ = ref_modules
    video_h, video_w = 140, 238
    stride, patch = 7, 14
    hp = 1 + (video_h - patch) // stride
    wp = 1 + (video_w - patch) // stride
    head = ref_tracker_head.TrackerHead(
        use_cnn_refiner=False, patch_size=patch, step_h=stride, step_w=stride,
        video_h=video_h, video_w=video_w)

    cost = np.zeros((2, 1, hp, wp), np.float32)
    cost[:, 0, 0, 0] = 60.0       # raw argmax at the top-left corner
    cost[:, 0, -1, -1] = 100.0    # softmax mass at the bottom-right corner
    with torch.no_grad():
        ref = head(torch.from_numpy(cost)).numpy()
    # reference with use_cnn_refiner=False applies Identity before softmax;
    # our head always runs both convs, so route the volume untouched through
    # them: channel 0 carries a center-delta kernel (spatial sum 1 → the
    # normalization is a no-op, and cost ≥ 0 passes relu), all other kernels
    # are zero (our EPS guard maps them to zero output)
    w1 = np.zeros((3, 3, 1, 16), np.float32)
    w1[1, 1, 0, 0] = 1.0
    w2 = np.zeros((3, 3, 16, 1), np.float32)
    w2[1, 1, 0, 0] = 1.0
    params = {"conv1": {"w": jnp.asarray(w1), "b": jnp.zeros((16,))},
              "conv2": {"w": jnp.asarray(w2), "b": jnp.zeros((1,))}}
    got = np.asarray(our_head.apply_tracker_head(
        params, jnp.asarray(cost), (video_h, video_w),
        patch_size=patch, stride=stride, argmax_radius=35.0))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("query_mode", ["strided", "first"])
def test_tapvid_metrics_match_reference(ref_modules, query_mode):
    _, _, _, ref_metrics = ref_modules
    rng = np.random.default_rng(3)
    b, n, t = 2, 24, 12
    gt_tracks = (rng.random((b, n, t, 2)) * 256).astype(np.float32)
    pred_tracks = gt_tracks + rng.normal(0, 4, (b, n, t, 2)).astype(np.float32)
    gt_occ = rng.random((b, n, t)) < 0.3
    pred_occ = rng.random((b, n, t)) < 0.3
    qframe = rng.integers(0, t, (b, n))
    # every track visible at its query frame (TAP-Vid invariant)
    for bi in range(b):
        gt_occ[bi, np.arange(n), qframe[bi]] = False
    query_points = np.stack(
        [qframe.astype(np.float32),
         rng.random((b, n)).astype(np.float32) * 256,
         rng.random((b, n)).astype(np.float32) * 256], axis=-1)

    ref = ref_metrics.compute_tapvid_metrics(
        query_points, gt_occ, gt_tracks, pred_occ, pred_tracks, query_mode)
    got = our_metrics.compute_tapvid_metrics(
        query_points, gt_occ, gt_tracks, pred_occ, pred_tracks, query_mode)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-6, err_msg=k)


@pytest.mark.parametrize("query_mode", ["strided", "first"])
def test_tapvid_metrics_trackwise_match_reference(ref_modules, query_mode):
    _, _, _, ref_metrics = ref_modules
    rng = np.random.default_rng(4)
    b, n, t = 1, 10, 8
    gt_tracks = (rng.random((b, n, t, 2)) * 256).astype(np.float32)
    pred_tracks = gt_tracks + rng.normal(0, 8, (b, n, t, 2)).astype(np.float32)
    gt_occ = rng.random((b, n, t)) < 0.4
    pred_occ = rng.random((b, n, t)) < 0.4
    qframe = rng.integers(0, t, (b, n))
    for bi in range(b):
        gt_occ[bi, np.arange(n), qframe[bi]] = False
    query_points = np.stack(
        [qframe.astype(np.float32), np.zeros((b, n), np.float32),
         np.zeros((b, n), np.float32)], axis=-1)

    ref = ref_metrics.compute_tapvid_metrics(
        query_points, gt_occ, gt_tracks, pred_occ, pred_tracks, query_mode,
        get_trackwise_metrics=True)
    got = our_metrics.compute_tapvid_metrics(
        query_points, gt_occ, gt_tracks, pred_occ, pred_tracks, query_mode,
        get_trackwise_metrics=True)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-6, err_msg=k)


def test_align_cnn_vit_features_matches_reference():
    """Our matmul-form CNN→ViT feature alignment vs the reference's
    grid_sample implementation (models/utils.py:7-45) — the half-texel grid
    math (-1 - 1/c_br + 2·x/c_br) is the subtlest constant in DeltaDINO."""
    from models import utils as ref_mutils  # reference import

    from dino_tracker_tpu.models import delta_dino as our_dd
    from dino_tracker_tpu.config import feature_grid_size

    rng = np.random.default_rng(5)
    for (h, w) in [(140, 238), (476, 854)]:
        vh, vw = feature_grid_size(h, w, patch_size=14, stride=7)
        ch, cw = -(-h // 8), -(-w // 8)
        cnn = rng.standard_normal((2, 6, ch, cw)).astype(np.float32)
        vit_shape = np.zeros((2, 6, vh, vw), np.float32)

        ref = ref_mutils.align_cnn_vit_features(
            torch.from_numpy(vit_shape), torch.from_numpy(cnn),
            vit_patch_size=14, vit_stride=7, cnn_stride=8).numpy()
        ours = np.asarray(our_dd.align_cnn_vit_features(
            (vh, vw), jnp.asarray(cnn), vit_patch_size=14, vit_stride=7,
            cnn_stride=8))
        # reference computes the sample grid in f32, ours in f64 — texel
        # weights can differ by ~1e-5 where grid coords sit near rounding
        # boundaries (observed max 3.9e-5 on 0.03% of elements)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-5)


def test_bilinear_interpolate_video_matches_reference():
    """Our trilinear feature-video sampler vs the reference's
    bilinear_interpolate_video (utils.py:75-101) — locks align_corners=True,
    border padding, the normalize flags, and the t>1 guard together.

    Reference utils.py imports torchvision + models.extractor at module
    level (unavailable/heavy here); both are inert for this function, so
    they are stubbed for the import only — no reference logic is altered."""
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    if "models.extractor" not in sys.modules:
        ex = types.ModuleType("models.extractor")
        ex.VitExtractor = object
        sys.modules["models.extractor"] = ex
    import utils as ref_utils  # reference import

    from dino_tracker_tpu.utils.sampling import sample_feature_video

    rng = np.random.default_rng(9)
    for t in [1, 6]:
        c, h, w = 5, 9, 13
        video = rng.standard_normal((t, c, h, w)).astype(np.float32)
        # normalized x/y in [-1,1] with out-of-bounds entries (border pad),
        # t raw frame indices incl. fractional + out-of-range
        pts = np.stack([
            rng.uniform(-1.4, 1.4, 48),
            rng.uniform(-1.4, 1.4, 48),
            rng.uniform(-0.9, t - 0.1, 48),
        ], axis=1).astype(np.float32)

        ref = ref_utils.bilinear_interpolate_video(
            torch.from_numpy(video.transpose(1, 0, 2, 3)[None]),
            torch.from_numpy(pts), h=h, w=w, t=t,
            normalize_h=False, normalize_w=False, normalize_t=True)
        ref = ref[0, :, 0, :, 0].numpy().T  # B×C
        ours = np.asarray(sample_feature_video(jnp.asarray(video),
                                               jnp.asarray(pts),
                                               normalize_t=True))
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)

        # pixel-coord variant with normalize flags on (x, y in pixels)
        pts_px = np.stack([
            rng.uniform(-2, w + 1, 48),
            rng.uniform(-2, h + 1, 48),
            rng.uniform(0, max(t - 1, 1), 48),
        ], axis=1).astype(np.float32)
        ref2 = ref_utils.bilinear_interpolate_video(
            torch.from_numpy(video.transpose(1, 0, 2, 3)[None]),
            torch.from_numpy(pts_px), h=h, w=w, t=t,
            normalize_h=True, normalize_w=True, normalize_t=True)
        ref2 = ref2[0, :, 0, :, 0].numpy().T
        ours2 = np.asarray(sample_feature_video(
            jnp.asarray(video), jnp.asarray(pts_px),
            normalize_t=True, normalize_h=True, normalize_w=True))
        np.testing.assert_allclose(ours2, ref2, atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_full_tracker_forward_matches_reference(ref_modules, tmp_path):
    """End-to-end forward oracle: the reference's own Tracker
    (models/tracker.py — trilinear query sampling -> DeltaDINO residual
    refinement -> cosine correlation -> TrackerHead) on CPU torch vs our
    functional tracker with the same weights, video, embeddings and queries.

    The reference's only non-importable dependency is the public
    ``antialiased_cnns.BlurPool`` (delta_dino.py:3,44); the shared-tracker
    helper registers a stub implementing that package's documented
    semantics — every other line executed is the reference's own code."""
    from dino_tracker_tpu.models import tracker as our_tracker
    from dino_tracker_tpu.models.tracker import TrackerInput

    rng = np.random.default_rng(11)
    t, h, w = 5, 70, 98
    ref, params, stats, cfg, video, dino = _build_shared_reference_tracker(
        tmp_path, rng, t=t, h=h, w=w)

    frames_set = np.arange(t, dtype=np.int64)
    b = 24
    qx = rng.random(b).astype(np.float32) * (w - 1)
    qy = rng.random(b).astype(np.float32) * (h - 1)
    qt = rng.integers(0, t, b)
    src_pts = np.stack([qx, qy, qt.astype(np.float32)], -1)
    src_idx = qt.astype(np.int64)
    tgt_idx = rng.integers(0, t, b).astype(np.int64)

    with torch.no_grad():
        refined_ref, _ = ref.get_refined_embeddings(torch.from_numpy(frames_set))
        inp = (torch.from_numpy(src_pts), torch.from_numpy(src_idx),
               torch.from_numpy(tgt_idx), torch.from_numpy(frames_set))
        coords_ref = ref.get_point_predictions(inp, refined_ref).numpy()

    our_inp = TrackerInput(jnp.asarray(src_pts), jnp.asarray(src_idx),
                           jnp.asarray(tgt_idx), jnp.asarray(frames_set))
    coords, aux = our_tracker.forward(params, stats, jnp.asarray(video),
                                      jnp.asarray(dino), our_inp, cfg,
                                      train=False)
    np.testing.assert_allclose(np.asarray(aux.frame_embeddings),
                               refined_ref.numpy(), atol=3e-3)
    np.testing.assert_allclose(np.asarray(coords), coords_ref, atol=2e-3)


@pytest.fixture(scope="module")
def ref_dino_tracker():
    """Import the reference's dino_tracker.py (the train-loop/loss module).
    Only inert-at-import deps are stubbed (torchvision transforms namespace,
    the hub-based VitExtractor); every executed line is reference code."""
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    if "models.extractor" not in sys.modules:
        ex = types.ModuleType("models.extractor")
        ex.VitExtractor = object
        sys.modules["models.extractor"] = ex
    if "antialiased_cnns" not in sys.modules:
        aa = types.ModuleType("antialiased_cnns")
        aa.BlurPool = torch.nn.Identity  # imported by models.tracker; unused here
        sys.modules["antialiased_cnns"] = aa
    import dino_tracker as ref_dt  # noqa: reference import
    return ref_dt


def test_bb_pairs_contrastive_loss_matches_reference(ref_dino_tracker):
    """Symmetric InfoNCE over buddy pairs vs all patches
    (reference dino_tracker.py:332-344) — the method touches no self state,
    so it runs unbound on shared random features."""
    from dino_tracker_tpu.training import losses as our_losses

    rng = np.random.default_rng(21)
    b, n, c = 12, 50, 16
    sbb = rng.standard_normal((b, c)).astype(np.float32)
    tbb = rng.standard_normal((b, c)).astype(np.float32)
    sf = rng.standard_normal((n, c)).astype(np.float32)
    tf = rng.standard_normal((n, c)).astype(np.float32)
    for temp in (0.5, 0.2):
        ref_st, ref_ts, _, _ = ref_dino_tracker.DINOTracker.get_bb_pairs_contrastive_loss(
            None, torch.from_numpy(sbb), torch.from_numpy(tbb),
            torch.from_numpy(sf), torch.from_numpy(tf), temp=temp)
        got_st, got_ts = our_losses.bb_pairs_contrastive_loss(
            jnp.asarray(sbb), jnp.asarray(tbb), jnp.asarray(sf),
            jnp.asarray(tf), temp=temp)
        np.testing.assert_allclose(np.asarray(got_st), ref_st.numpy(),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_ts), ref_ts.numpy(),
                                   atol=1e-5, rtol=1e-5)


def test_regularization_losses_match_reference(ref_dino_tracker):
    """norm-ratio and angle regularizers (reference dino_tracker.py:136-146)
    on a duck-typed model carrying frame/raw embeddings."""
    import types as _t

    from dino_tracker_tpu.training import losses as our_losses

    rng = np.random.default_rng(22)
    emb = rng.standard_normal((3, 8, 9, 13)).astype(np.float32)
    raw = (rng.standard_normal((3, 8, 9, 13)) * 2 + 0.5).astype(np.float32)
    model = _t.SimpleNamespace(frame_embeddings=torch.from_numpy(emb),
                               raw_embeddings=torch.from_numpy(raw))
    ref_norm = ref_dino_tracker.DINOTracker.get_emb_norm_regularization_loss(
        None, model).item()
    ref_angle = ref_dino_tracker.DINOTracker.get_emb_angle_regularization_loss(
        None, model).item()
    got_norm = float(our_losses.emb_norm_regularization(jnp.asarray(emb),
                                                        jnp.asarray(raw)))
    got_angle = float(our_losses.emb_angle_regularization(jnp.asarray(emb),
                                                          jnp.asarray(raw)))
    np.testing.assert_allclose(got_norm, ref_norm, atol=1e-6)
    np.testing.assert_allclose(got_angle, ref_angle, atol=1e-6)


def test_cycle_loss_composition_matches_reference(ref_dino_tracker):
    """gamma**dists weighting + Huber(delta=1/32) + the mean/2 assembly
    (reference dino_tracker.py:346-352, of_loss_fn :30) on a duck-typed
    model returning fixed cycle predictions."""
    import types as _t

    from dino_tracker_tpu.models.tracker import TrackerConfig
    from dino_tracker_tpu.training import cycle as our_cycle
    from dino_tracker_tpu.training.cycle import CycleData

    rng = np.random.default_rng(23)
    p = 17
    gamma = 0.85
    h, w = 140, 238
    st_preds = rng.uniform(-1, 1, (p, 2)).astype(np.float32)
    ts_preds = rng.uniform(-1, 1, (p, 2)).astype(np.float32)
    src_norm = rng.uniform(-1, 1, (p, 2)).astype(np.float32)
    tgt_norm = rng.uniform(-1, 1, (p, 2)).astype(np.float32)
    tcol = rng.integers(0, 5, (p, 1)).astype(np.float32)
    dists = (rng.random(p) * 6).astype(np.float32)

    preds = {
        "cycle_consistency_dists": torch.from_numpy(dists),
        "source_target_coords": torch.from_numpy(st_preds),
        "target_source_coords": torch.from_numpy(ts_preds),
        "source_coords": torch.from_numpy(np.concatenate([src_norm, tcol], 1)),
        "target_coords": torch.from_numpy(np.concatenate([tgt_norm, tcol], 1)),
    }
    fake_self = _t.SimpleNamespace(
        config={"cyc_gamma": gamma}, fg_masks=None,
        of_loss_fn=torch.nn.HuberLoss(delta=1 / 32, reduction="none"))
    fake_model = _t.SimpleNamespace(
        get_cycle_consistent_preds=lambda *_a, **_k: preds)
    ref = ref_dino_tracker.DINOTracker.get_cycle_consistency_loss(
        fake_self, fake_model, inputs=(None, None, None, None)).item()

    scale = np.asarray([w - 1, h - 1], np.float32)
    data = CycleData(
        source_points=jnp.asarray((src_norm + 1) / 2 * scale),
        target_points=jnp.asarray(
            np.concatenate([(tgt_norm + 1) / 2 * scale, tcol], 1)),
        source_frame_indices=jnp.zeros(p, jnp.int32),
        target_frame_indices=jnp.zeros(p, jnp.int32),
        dists=jnp.asarray(dists),
        valid=jnp.ones(p, bool))
    cfg = TrackerConfig(video_h=h, video_w=w)
    both = jnp.asarray(np.concatenate([st_preds, ts_preds], 0))
    got = float(our_cycle.cycle_loss_from_preds(both, data, cfg, gamma))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_per_video_metric_assembly_matches_reference(ref_modules, tmp_path):
    """The full per-video metric assembly — prediction-file loading, the
    query/GT/pred rescale conventions (incl. the reference's sequential
    query-point overwrite quirk, eval/metrics.py:205-207), strided
    compute_tapvid_metrics, and the BADJA seg-area/3px accuracies
    (:226-281) — against the reference's own compute_*_metrics_for_video."""
    _, _, _, ref_metrics = ref_modules
    rng = np.random.default_rng(33)
    n, t, h, w = 7, 6, 120, 160
    ph, pw = 60, 80  # prediction resolution differs from benchmark res

    traj_dir = tmp_path / "trajectories"
    occ_dir = tmp_path / "occlusions"
    traj_dir.mkdir(), occ_dir.mkdir()
    qframes = [0, 2]
    video_cfg = {"video_idx": 0, "h": h, "w": w,
                 "query_points": {}, "target_points": {}, "occluded": {}}
    for f in qframes:
        pts = rng.random((n, 2)).astype(np.float32) * [w - 1, h - 1]
        video_cfg["query_points"][f] = pts.tolist()
        video_cfg["target_points"][f] = (
            rng.random((n, t, 2)).astype(np.float32) * [w - 1, h - 1])
        occ = rng.random((n, t)) < 0.3
        occ[:, f] = False
        video_cfg["occluded"][f] = occ
        np.save(traj_dir / f"trajectories_{f}.npy",
                rng.random((n, t, 2)).astype(np.float32) * [pw - 1, ph - 1])
        np.save(occ_dir / f"occlusion_preds_{f}.npy", rng.random((n, t)) < 0.3)
    benchmark = {"videos": [video_cfg]}

    ref = ref_metrics.compute_tapvid_metrics_for_video(
        str(traj_dir), str(occ_dir), benchmark, 0, pred_video_sizes=[pw, ph])
    got = our_metrics.compute_tapvid_metrics_for_video(
        str(traj_dir), str(occ_dir), benchmark, 0, pred_video_sizes=[pw, ph])
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-6, err_msg=k)

    # BADJA: seg-mask-area threshold + 3px accuracy
    segs = (rng.random((t, h, w)) < 0.4).astype(np.uint8)
    video_cfg_b = dict(video_cfg)
    video_cfg_b["segmentations"] = segs
    benchmark_b = {"videos": [video_cfg_b]}
    ref_b = ref_metrics.compute_badja_metrics_for_video(
        str(traj_dir), benchmark_b, 0, pred_video_sizes=[pw, ph])
    got_b = our_metrics.compute_badja_metrics_for_video(
        str(traj_dir), benchmark_b, 0, pred_video_sizes=[pw, ph])
    assert set(got_b) == set(ref_b)
    for k in ref_b:
        np.testing.assert_allclose(got_b[k], ref_b[k], atol=1e-6, err_msg=k)


def _build_shared_reference_tracker(tmp_path, rng, t=5, h=70, w=98):
    """Reference Tracker on CPU + our params/stats/config with SHARED
    weights, video and embeddings (the wiring of
    test_full_tracker_forward_matches_reference, reusable)."""
    import math
    import types

    import torch.nn.functional as F

    if "antialiased_cnns" not in sys.modules:
        mod = types.ModuleType("antialiased_cnns")

        class BlurPool(torch.nn.Module):
            def __init__(self, channels, stride=2, filt_size=4):
                super().__init__()
                a = torch.tensor([1.0, 3.0, 3.0, 1.0])
                filt = a[:, None] * a[None, :]
                filt = filt / filt.sum()
                self.register_buffer("filt",
                                     filt[None, None].repeat(channels, 1, 1, 1))
                self.stride = stride
                self.pl = (filt_size - 1) // 2
                self.pr = int(math.ceil((filt_size - 1) / 2.0))
                self.channels = channels

            def forward(self, x):
                x = F.pad(x, (self.pl, self.pr, self.pl, self.pr),
                          mode="reflect")
                return F.conv2d(x, self.filt, stride=self.stride,
                                groups=self.channels)

        mod.BlurPool = BlurPool
        sys.modules["antialiased_cnns"] = mod
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    if "models.extractor" not in sys.modules:
        ex = types.ModuleType("models.extractor")
        ex.VitExtractor = object
        sys.modules["models.extractor"] = ex

    from models.tracker import Tracker as RefTracker

    from dino_tracker_tpu.models import tracker as our_tracker
    from dino_tracker_tpu.models.tracker import TrackerConfig

    cfg = TrackerConfig(video_h=h, video_w=w)
    hp, wp = cfg.feat_hw
    video = rng.random((t, 3, h, w)).astype(np.float32)
    dino = (rng.standard_normal((t, 1024, hp, wp)) * 0.5).astype(np.float32)
    embed_path = str(tmp_path / "dino_embed.pt")
    torch.save(torch.from_numpy(dino), embed_path)
    ref = RefTracker(video=torch.from_numpy(video), ckpt_path=str(tmp_path),
                     dino_embed_path=embed_path, device="cpu",
                     dino_patch_size=cfg.dino_patch_size, stride=cfg.stride)
    ref.eval()

    params, stats = our_tracker.init_tracker(jax.random.PRNGKey(3), cfg)
    last = params["delta_dino"]["layers"][-1]["conv"]
    params["delta_dino"]["layers"][-1]["conv"] = {
        "w": jnp.asarray(rng.standard_normal(last["w"].shape).astype(np.float32) * 0.02),
        "b": jnp.asarray(rng.standard_normal(last["b"].shape).astype(np.float32) * 0.02)}
    new_stats = []
    for s in stats["delta_dino"]["layers"]:
        new_stats.append({
            "mean": jnp.asarray(rng.standard_normal(s["mean"].shape).astype(np.float32) * 0.1),
            "var": jnp.asarray(rng.random(s["var"].shape).astype(np.float32) + 0.5)})
    stats = {"delta_dino": {"layers": new_stats}}

    with torch.no_grad():
        convs = [m for m in ref.delta_dino.layers
                 if isinstance(m, torch.nn.Conv2d)]
        bns = [m for m in ref.delta_dino.layers
               if isinstance(m, torch.nn.BatchNorm2d)]
        for i, layer in enumerate(params["delta_dino"]["layers"]):
            w_hwio = np.asarray(layer["conv"]["w"])
            convs[i].weight.copy_(torch.from_numpy(
                np.transpose(w_hwio, (3, 2, 0, 1)).copy()))
            convs[i].bias.copy_(torch.from_numpy(np.asarray(layer["conv"]["b"]).copy()))
            bns[i].weight.copy_(torch.from_numpy(np.asarray(layer["bn"]["scale"]).copy()))
            bns[i].bias.copy_(torch.from_numpy(np.asarray(layer["bn"]["bias"]).copy()))
            bns[i].running_mean.copy_(torch.from_numpy(
                np.asarray(stats["delta_dino"]["layers"][i]["mean"]).copy()))
            bns[i].running_var.copy_(torch.from_numpy(
                np.asarray(stats["delta_dino"]["layers"][i]["var"]).copy()))
        for ref_conv, ours_key in ((ref.tracker_head.cnn_refiner[0], "conv1"),
                                   (ref.tracker_head.cnn_refiner[2], "conv2")):
            hw_ = np.asarray(params["tracker_head"][ours_key]["w"])
            ref_conv.weight.copy_(torch.from_numpy(
                np.transpose(hw_, (3, 2, 0, 1)).copy()))
            ref_conv.bias.copy_(torch.from_numpy(
                np.asarray(params["tracker_head"][ours_key]["b"]).copy()))
    return ref, params, stats, cfg, video, dino


@pytest.mark.slow
def test_full_inference_matches_reference(ref_modules, tmp_path):
    """CAPSTONE oracle: the reference's entire ModelInference.infer()
    (models/model_inference.py — per-query trajectory loops, cos sims,
    visible-anchor re-tracking, masked-median occlusion) vs our batched
    multi-target inference, with shared weights/video/embeddings."""
    ref_dataset = ref_modules[0]
    rng = np.random.default_rng(29)
    t, h, w = 5, 70, 98
    ref, params, stats, cfg, video, dino = _build_shared_reference_tracker(
        tmp_path, rng, t=t, h=h, w=w)

    from models import model_inference as ref_mi

    range_normalizer = ref_dataset.RangeNormalizer(shapes=(w, h, t))
    rmi = ref_mi.ModelInference(
        model=ref, range_normalizer=range_normalizer,
        anchor_cosine_similarity_threshold=0.5,
        cosine_similarity_threshold=0.5)
    q = np.asarray([[20.0, 30.0, 0.0], [50.0, 40.0, 2.0], [70.0, 10.0, 4.0]],
                   np.float32)
    with torch.no_grad():
        ref_trajs, ref_occ = rmi.infer(torch.from_numpy(q))

    from dino_tracker_tpu.inference.infer import ModelInference as OurMI
    from dino_tracker_tpu.models import tracker as our_tracker

    refined = our_tracker.cache_refined_embeddings(
        params, stats, jnp.asarray(video), jnp.asarray(dino), cfg)
    np.testing.assert_allclose(np.asarray(refined),
                               ref.refined_features.detach().numpy(), atol=3e-3)
    mi = OurMI(params=params, refined_features=refined, cfg=cfg,
               anchor_cosine_similarity_threshold=0.5,
               cosine_similarity_threshold=0.5)
    got_trajs, got_occ = mi.infer(q)
    np.testing.assert_allclose(got_trajs, ref_trajs.numpy(), atol=0.1)
    np.testing.assert_array_equal(got_occ, ref_occ.numpy())

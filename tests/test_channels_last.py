"""Layout-equality oracles for the channels-last (NHWC) hot path.

The train step runs every embedding consumer on T×h×w×C tiles (C on the
TPU lane axis); the public artifact/API contract stays T×C×h×w. These tests
pin the two layouts to identical numerics: the refiner + alignment, the
frame view, trilinear sampling, the prediction paths, and one full loss
evaluation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_tracker_tpu.models import delta_dino as dd
from dino_tracker_tpu.models import tracker
from dino_tracker_tpu.models.tracker import TrackerConfig, TrackerInput
from dino_tracker_tpu.utils.sampling import (sample_feature_video,
                                             sample_feature_video_thwc)


@pytest.fixture(scope="module")
def setup():
    cfg = TrackerConfig(video_h=70, video_w=98, delta_channels=(3, 4, 4, 4, 16),
                        compute_dtype="float32")
    key = jax.random.PRNGKey(0)
    params, stats = tracker.init_tracker(key, cfg)
    # non-zero last conv so the residual actually differs from zero
    last = params["delta_dino"]["layers"][-1]["conv"]
    last["w"] = jax.random.normal(jax.random.PRNGKey(1), last["w"].shape) * 0.02
    t = 5
    video = jax.random.uniform(jax.random.PRNGKey(2), (t, 3, 70, 98))
    hp, wp = cfg.feat_hw
    dino = jax.random.normal(jax.random.PRNGKey(3), (t, 16, hp, wp))
    return cfg, params, stats, video, dino


def test_refined_embeddings_layouts_match(setup):
    cfg, params, stats, video, dino = setup
    fs = jnp.arange(4)
    ref_nchw, _, raw_nchw, _ = tracker.get_refined_embeddings(
        params, stats, video, dino, fs, cfg, train=True)
    dino_thwc = jnp.transpose(dino, (0, 2, 3, 1))
    ref_nhwc, _, raw_nhwc, _ = tracker.get_refined_embeddings(
        params, stats, video, dino_thwc, fs, cfg, train=True,
        channels_last=True)
    np.testing.assert_allclose(np.transpose(ref_nhwc, (0, 3, 1, 2)), ref_nchw,
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.transpose(raw_nhwc, (0, 3, 1, 2)), raw_nchw,
                               rtol=0, atol=0)


def test_frame_view_layouts_match(setup):
    cfg, params, stats, video, dino = setup
    emb = jax.random.normal(jax.random.PRNGKey(4), (4, 16, *cfg.feat_hw))
    v1 = tracker.make_frame_view(emb, jnp.float32)
    v2 = tracker.make_frame_view(jnp.transpose(emb, (0, 2, 3, 1)), jnp.float32,
                                 channels_last=True)
    np.testing.assert_allclose(v1.flat_cd, v2.flat_cd, atol=0)
    np.testing.assert_allclose(v1.norms, v2.norms, atol=0)


def test_trilinear_sampling_layouts_match(setup):
    cfg, *_ = setup
    t, h, w, c = 4, 9, 11, 16
    vol = jax.random.normal(jax.random.PRNGKey(5), (t, c, h, w))
    pts = jnp.stack([
        jax.random.uniform(jax.random.PRNGKey(6), (37,), minval=-1.2,
                           maxval=1.2),
        jax.random.uniform(jax.random.PRNGKey(7), (37,), minval=-1.2,
                           maxval=1.2),
        jax.random.uniform(jax.random.PRNGKey(8), (37,), minval=0.0,
                           maxval=t - 1.0)], axis=1)
    a = sample_feature_video(vol, pts, normalize_t=True)
    b = sample_feature_video_thwc(jnp.transpose(vol, (0, 2, 3, 1)), pts,
                                  normalize_t=True)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)

    # gradients w.r.t. the volume agree too (row scatter vs lane scatter)
    ga = jax.grad(lambda v: jnp.sum(
        sample_feature_video(v, pts) ** 2))(vol)
    gb = jax.grad(lambda v: jnp.sum(
        sample_feature_video_thwc(v, pts) ** 2))(
        jnp.transpose(vol, (0, 2, 3, 1)))
    np.testing.assert_allclose(ga, np.transpose(gb, (0, 3, 1, 2)), atol=1e-5)


def test_prediction_paths_layouts_match(setup):
    cfg, params, stats, video, dino = setup
    emb = jax.random.normal(jax.random.PRNGKey(9), (4, 16, *cfg.feat_hw))
    emb_cl = jnp.transpose(emb, (0, 2, 3, 1))
    b = 6
    pts = jnp.stack([
        jax.random.uniform(jax.random.PRNGKey(10), (b,), maxval=97.0),
        jax.random.uniform(jax.random.PRNGKey(11), (b,), maxval=69.0),
        jnp.zeros((b,))], axis=1)
    sf = jnp.asarray([0, 1, 2, 3, 0, 1])
    tf = jnp.asarray([3, 2, 1, 0, 2, 3])
    inp = TrackerInput(pts, sf, tf, jnp.arange(4))
    out1 = tracker.get_point_predictions(params, inp, emb, cfg)
    out2 = tracker.get_point_predictions(params, inp, emb_cl, cfg,
                                         channels_last=True)
    np.testing.assert_allclose(out1, out2, rtol=0, atol=1e-5)

    g = tracker.get_point_predictions_grouped(
        params, pts.reshape(2, 3, 3), sf[:2], tf[:2], emb, cfg)
    g2 = tracker.get_point_predictions_grouped(
        params, pts.reshape(2, 3, 3), sf[:2], tf[:2], emb_cl, cfg,
        channels_last=True)
    np.testing.assert_allclose(g, g2, rtol=0, atol=1e-5)

    m = tracker.get_point_predictions_multi_target(
        params, pts, sf, jnp.tile(tf[:, None], (1, 3)), emb, cfg)
    m2 = tracker.get_point_predictions_multi_target(
        params, pts, sf, jnp.tile(tf[:, None], (1, 3)), emb_cl, cfg,
        channels_last=True)
    np.testing.assert_allclose(m, m2, rtol=0, atol=1e-5)


def test_contrastive_losses_layouts_match(setup):
    from dino_tracker_tpu.structures import BBData
    from dino_tracker_tpu.training import contrastive

    cfg, params, stats, video, dino = setup
    t = video.shape[0]
    emb = jax.random.normal(jax.random.PRNGKey(12), (4, 16, *cfg.feat_hw))
    emb_cl = jnp.transpose(emb, (0, 2, 3, 1))
    fs = jnp.arange(4)
    fg = (jax.random.uniform(jax.random.PRNGKey(13), (t, 70, 98)) < 0.4
          ).astype(jnp.float32)
    cap = 16
    kb = jax.random.PRNGKey(14)
    bb = BBData(
        source_coords=jax.random.uniform(kb, (t, t, cap, 2)) * 90.0,
        target_coords=jax.random.uniform(kb, (t, t, cap, 2)) * 90.0,
        cos_sims=jax.random.uniform(kb, (t, t, cap)),
        r=jax.random.uniform(kb, (t, t, cap)),
        valid=jnp.ones((t, t, cap), bool))
    key = jax.random.PRNGKey(15)
    a = contrastive.dino_bb_contrastive_loss(
        key, emb, fs, bb, fg, cfg, 2, 8, 0.5, 0.1, 10.0, 27.0, -5.7)
    b = contrastive.dino_bb_contrastive_loss(
        key, emb_cl, fs, bb, fg, cfg, 2, 8, 0.5, 0.1, 10.0, 27.0, -5.7,
        channels_last=True)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

    a = contrastive.refined_bb_contrastive_loss(
        key, emb, fs, fg, cfg, 2, 8, 0.5, 0.1, 10.0)
    b = contrastive.refined_bb_contrastive_loss(
        key, emb_cl, fs, fg, cfg, 2, 8, 0.5, 0.1, 10.0, channels_last=True)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

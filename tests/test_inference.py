"""Inference pipeline tests: shapes, self-tracking sanity, occlusion-rule
parity vs a torch mirror of the reference."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from dino_tracker_tpu.models import tracker
from dino_tracker_tpu.models.tracker import TrackerConfig
from dino_tracker_tpu.inference.infer import ModelInference

RNG = np.random.default_rng(5)


def make_inference(t=5, h=70, w=98, c=16, seed=0):
    tcfg = TrackerConfig(video_h=h, video_w=w, delta_channels=(3, 4, 4, 4, c))
    hp, wp = tcfg.feat_hw
    params, stats = tracker.init_tracker(jax.random.PRNGKey(seed), tcfg)
    # distinctive per-position features, shared across frames (static scene)
    pos = RNG.standard_normal((c, hp, wp)).astype(np.float32) * 3
    refined = jnp.asarray(np.tile(pos[None], (t, 1, 1, 1)))
    return ModelInference(params=params, refined_features=refined, cfg=tcfg,
                          anchor_cosine_similarity_threshold=0.7,
                          cosine_similarity_threshold=0.6, chunk=64), tcfg


def test_infer_shapes_and_finite():
    mi, tcfg = make_inference()
    q = np.array([[20.0, 30.0, 0.0], [50.0, 40.0, 2.0]], dtype=np.float32)
    trajs, occ = mi.infer(q)
    t = mi.refined_features.shape[0]
    assert trajs.shape == (2, t, 2)
    assert occ.shape == (2, t)
    assert np.isfinite(trajs).all()


def test_prewarm_spec_mode_builds_real_program_shapes():
    """Spec-mode ModelInference (refined_features as a ShapeDtypeStruct)
    makes the same chunking decisions as a real same-shape instance and
    AOT-compiles its programs without any device arrays — the mechanism
    runtime.prewarm_inference uses to fill the persistent compile cache
    during training."""
    mi, tcfg = make_inference()
    t = mi.refined_features.shape[0]
    spec = jax.ShapeDtypeStruct(tuple(mi.refined_features.shape), jnp.float32)
    mi_spec = ModelInference(params=mi.params, refined_features=spec,
                             cfg=tcfg,
                             anchor_cosine_similarity_threshold=0.7,
                             cosine_similarity_threshold=0.6, chunk=64)
    assert mi_spec.chunk == mi.chunk  # same HBM-budget chunking
    built = mi_spec.prewarm(mi.params, query_counts=(2,), include_flat=True)
    assert f"multi_k{t}_c{mi_spec._multi_chunk(t)}" in built
    assert "cos_sims_n64" in built  # 2 queries → 32-pad → 64-pad
    assert f"flat_c{mi_spec.chunk}" in built
    # t=5 < every fixed bucket, so no bucket variants at this scale
    assert len(built) == 3


def test_static_scene_tracks_stay_near_query():
    """With per-position features constant over time, the correlation argmax
    is the query's own patch in every frame; predictions should stay within
    the soft-argmax radius of the query point."""
    mi, tcfg = make_inference()
    q = np.array([[49.0, 35.0, 0.0]], dtype=np.float32)  # on-grid point
    trajs = np.asarray(mi.compute_trajectories(jnp.asarray(q)))
    d = np.linalg.norm(trajs[0, :, :2] - q[0, :2], axis=-1)
    assert (d <= tcfg.argmax_radius + 7).all(), d

    cos = np.asarray(mi.compute_trajectory_cos_sims(
        jnp.asarray(trajs), jnp.asarray(q)))
    assert cos.shape == (1, trajs.shape[1])
    assert cos.max() <= 1.0 + 1e-5


def torch_occ_pred_for_qp(green, source, cos, anch_th, cos_th):
    """Reference model_inference.py:169-177."""
    green = torch.from_numpy(green)
    source = torch.from_numpy(source)
    cos = torch.from_numpy(cos)
    visible = cos >= anch_th
    dists = torch.norm(green - source[visible, :].unsqueeze(1), dim=-1)
    anchor_median_errors = torch.median(dists[:, visible], dim=0).values
    th = anchor_median_errors.max()
    med = torch.median(dists, dim=0).values
    return (med > th) | (cos < cos_th)


def test_padded_anchor_path_matches_full_grid():
    """Visible-only anchor gather (padded) must reproduce the full-T×T-grid
    occlusion decision and the gathered anchor predictions exactly."""
    mi, _ = make_inference()
    q = np.array([[20.0, 30.0, 0.0], [50.0, 40.0, 2.0], [70.0, 10.0, 4.0]],
                 dtype=np.float32)
    trajs = mi.compute_trajectories(jnp.asarray(q))
    cos = mi.compute_trajectory_cos_sims(trajs, jnp.asarray(q))

    g_full, idx_full, valid_full = mi.compute_anchor_trajectories(trajs)
    t = trajs.shape[1]
    assert g_full.shape[1] == t and bool(np.asarray(valid_full).all())
    occ_legacy = np.asarray(mi.compute_occlusion(trajs, cos, g_full))

    g, idx, valid = mi.compute_anchor_trajectories(trajs, cos)
    assert g.shape[1] <= t
    visible = np.asarray(cos) >= mi.anchor_cosine_similarity_threshold
    np.testing.assert_array_equal(np.asarray(valid).sum(1), visible.sum(1))
    occ_new = np.asarray(mi.compute_occlusion(trajs, cos, g, idx, valid))
    np.testing.assert_array_equal(occ_new, occ_legacy)

    gathered = np.take_along_axis(np.asarray(g_full),
                                  np.asarray(idx)[:, :, None, None], axis=1)
    np.testing.assert_allclose(np.asarray(g), gathered, atol=1e-5)


def test_occlusion_rule_parity():
    mi, _ = make_inference()
    n, t = 4, 9
    trajs = RNG.random((n, t, 2)).astype(np.float32) * 50
    cos = RNG.random((n, t)).astype(np.float32)
    cos[:, 0] = 1.0  # query frame always an anchor
    green_full = RNG.random((n, t, t, 2)).astype(np.float32) * 50

    ours = np.asarray(mi.compute_occlusion(
        jnp.asarray(np.concatenate([trajs, np.zeros((n, t, 1), np.float32)], -1)),
        jnp.asarray(cos), jnp.asarray(green_full)))

    for q in range(n):
        visible = cos[q] >= 0.7
        # reference green only holds rows for visible anchors
        green_q = green_full[q][visible]
        ref = torch_occ_pred_for_qp(green_q, trajs[q], cos[q], 0.7, 0.6)
        np.testing.assert_array_equal(ours[q], ref.numpy(), err_msg=f"qp {q}")


def test_multi_target_matches_flat_oracle():
    """The multi-target kernel (one correlation pass per source, K targets)
    must reproduce the flat one-pair-per-row path bit-for-bit-ish on both
    inference batch shapes: trajectories (K=T) and anchor re-tracking (K=A)."""
    mi, _ = make_inference()
    t = mi.refined_features.shape[0]
    q = np.array([[20.0, 30.0, 0.0], [50.0, 40.0, 2.0], [70.0, 10.0, 4.0]],
                 dtype=np.float32)
    n = q.shape[0]

    # trajectories: flat oracle repeats each query T times
    src = jnp.repeat(jnp.asarray(q), t, axis=0)
    flat = mi._predict_chunked(src, src[:, 2].astype(jnp.int32),
                               jnp.tile(jnp.arange(t, dtype=jnp.int32), n))
    trajs = mi.compute_trajectories(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(trajs[..., :2]),
                               np.asarray(flat).reshape(n, t, 2), atol=1e-4)

    # anchors: a ragged-ish padded anchor grid with duplicate padding slots
    anchor_idx = np.array([[0, 2, 4, 0], [1, 3, 1, 1], [2, 2, 2, 2]],
                          np.int32)
    a = anchor_idx.shape[1]
    src = jnp.asarray(np.asarray(trajs).reshape(-1, 3))
    tf = jnp.asarray(np.repeat(anchor_idx, t, axis=0))
    multi = mi._predict_multi_chunked(src, src[:, 2].astype(jnp.int32), tf)
    flat = mi._predict_chunked(
        jnp.repeat(src, a, axis=0), jnp.repeat(src[:, 2].astype(jnp.int32), a),
        jnp.asarray(np.repeat(anchor_idx, t, axis=0).reshape(-1)))
    np.testing.assert_allclose(np.asarray(multi).reshape(-1, 2),
                               np.asarray(flat), atol=1e-4)


def test_cache_refined_embeddings_mesh_matches_single_device():
    """The sharded feature-cache build (frame axis over 8 CPU devices) must
    equal the unsharded one, including the non-multiple-of-8 tail chunk."""
    from dino_tracker_tpu.parallel.mesh import make_mesh

    tcfg = TrackerConfig(video_h=70, video_w=98, delta_channels=(3, 4, 4, 4, 8))
    hp, wp = tcfg.feat_hw
    params, stats = tracker.init_tracker(jax.random.PRNGKey(1), tcfg)
    t = 11  # not a multiple of the mesh size
    video = jnp.asarray(RNG.random((t, 3, 70, 98), np.float32))
    dino = jnp.asarray(RNG.standard_normal((t, 8, hp, wp)).astype(np.float32))
    a = tracker.cache_refined_embeddings(params, stats, video, dino, tcfg,
                                         frames_chunk=4)
    b = tracker.cache_refined_embeddings(params, stats, video, dino, tcfg,
                                         frames_chunk=8, mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_inference_mesh_matches_single_device():
    """Flat prediction batch sharded over the 8-device CPU mesh must give
    identical trajectories and occlusions."""
    from dino_tracker_tpu.parallel.mesh import make_mesh

    mi, tcfg = make_inference()
    mi_sharded = ModelInference(
        params=mi.params, refined_features=mi.refined_features, cfg=tcfg,
        anchor_cosine_similarity_threshold=0.7,
        cosine_similarity_threshold=0.6, chunk=64, mesh=make_mesh(8))
    q = np.array([[20.0, 30.0, 0.0], [50.0, 40.0, 2.0]], dtype=np.float32)
    t1, o1 = mi.infer(q)
    t2, o2 = mi_sharded.infer(q)
    np.testing.assert_allclose(t1, t2, atol=1e-4)
    np.testing.assert_array_equal(o1, o2)

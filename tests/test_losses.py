"""Loss-math parity tests vs torch mirrors of the reference formulas."""

import pytest
import numpy as np
import torch
import jax
import jax.numpy as jnp

from dino_tracker_tpu.training import losses

RNG = np.random.default_rng(37)


def test_huber_matches_torch():
    pred = RNG.standard_normal((64, 2)).astype(np.float32) * 0.1
    tgt = RNG.standard_normal((64, 2)).astype(np.float32) * 0.1
    ours = losses.huber(jnp.asarray(pred), jnp.asarray(tgt), delta=1 / 32)
    ref = torch.nn.HuberLoss(delta=1 / 32, reduction="none")(
        torch.from_numpy(pred), torch.from_numpy(tgt))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def torch_bb_contrastive(source_bb_f, target_bb_f, source_f, target_f, temp):
    """Reference dino_tracker.py:332-344 exactly."""
    source_bb_f = torch.from_numpy(source_bb_f)
    target_bb_f = torch.from_numpy(target_bb_f)
    source_f = torch.from_numpy(source_f)
    target_f = torch.from_numpy(target_f)
    bb_corrs = torch.einsum("bc,bc->b", source_bb_f, target_bb_f)
    st = torch.einsum("bc,nc->bn", source_bb_f, target_f)
    ts = torch.einsum("bc,nc->bn", target_bb_f, source_f)
    st = st / torch.clamp(source_bb_f.norm(dim=1)[:, None]
                          * target_f.norm(dim=1)[None], min=1e-8)
    ts = ts / torch.clamp(target_bb_f.norm(dim=1)[:, None]
                          * source_f.norm(dim=1)[None], min=1e-8)
    bb_corrs = bb_corrs / torch.clamp(
        source_bb_f.norm(dim=1) * target_bb_f.norm(dim=1), min=1e-8)
    loss_st = -torch.log(torch.exp(bb_corrs / temp)
                         / torch.exp(st / temp).sum(dim=1))
    loss_ts = -torch.log(torch.exp(bb_corrs / temp)
                         / torch.exp(ts / temp).sum(dim=1))
    return loss_st, loss_ts


def test_bb_pairs_contrastive_matches_reference():
    b, n, c = 12, 40, 16
    sbf = RNG.standard_normal((b, c)).astype(np.float32)
    tbf = RNG.standard_normal((b, c)).astype(np.float32)
    sf = RNG.standard_normal((n, c)).astype(np.float32)
    tf = RNG.standard_normal((n, c)).astype(np.float32)
    ours_st, ours_ts = losses.bb_pairs_contrastive_loss(
        jnp.asarray(sbf), jnp.asarray(tbf), jnp.asarray(sf), jnp.asarray(tf),
        temp=0.1)
    ref_st, ref_ts = torch_bb_contrastive(sbf, tbf, sf, tf, 0.1)
    np.testing.assert_allclose(np.asarray(ours_st), ref_st.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours_ts), ref_ts.numpy(), atol=2e-4)


def test_regularizers_match_reference():
    b, c, h, w = 3, 8, 5, 6
    fs = RNG.standard_normal((b, c, h, w)).astype(np.float32)
    ft = fs + RNG.standard_normal((b, c, h, w)).astype(np.float32) * 0.1
    ours_norm = float(losses.emb_norm_regularization(jnp.asarray(fs),
                                                     jnp.asarray(ft)))
    ours_ang = float(losses.emb_angle_regularization(jnp.asarray(fs),
                                                     jnp.asarray(ft)))
    tfs, tft = torch.from_numpy(fs), torch.from_numpy(ft)
    ref_norm = (tfs.norm(dim=1) / tft.norm(dim=1) - 1).abs().mean()
    cos = torch.einsum("bchw,bchw->bhw", tfs, tft) / (
        tfs.norm(dim=1) * tft.norm(dim=1))
    ref_ang = (cos - 1).abs().mean()
    assert abs(ours_norm - float(ref_norm)) < 1e-5
    assert abs(ours_ang - float(ref_ang)) < 1e-5


def test_fg_lookup_matches_reference_grid_sample():
    """filter_bb_foreground_pairs' quirky normalization (models/utils.py:53-58):
    /size (not size-1) and align_corners=False."""
    h, w = 24, 30
    mask = (RNG.random((h, w)) < 0.5).astype(np.float32)
    pts = np.stack([RNG.random(50) * (w - 1), RNG.random(50) * (h - 1)],
                   -1).astype(np.float32)
    ours = losses.sample_fg_mask_at_points(jnp.asarray(mask), jnp.asarray(pts),
                                           w, h)
    grid = 2 * (torch.from_numpy(pts)[None, None] /
                torch.tensor([w, h], dtype=torch.float32)) - 1
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(mask)[None, None], grid).squeeze() > 0
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


@pytest.mark.slow
def test_masked_gumbel_topk_uniformity_and_validity():
    n, k = 50, 8
    mask = np.zeros(n, bool)
    mask[5:25] = True
    counts = np.zeros(n)
    for seed in range(300):
        idx, valid = losses.masked_gumbel_topk(jax.random.PRNGKey(seed),
                                               jnp.asarray(mask), k)
        idx, valid = np.asarray(idx), np.asarray(valid)
        assert valid.all()  # population (20) > k
        assert mask[idx].all()
        assert len(set(idx.tolist())) == k  # no replacement
        counts[idx] += 1
    picked = counts[5:25]
    # uniform: each of the 20 eligible appears ~300·8/20 = 120 times
    assert picked.min() > 70 and picked.max() < 180

    # population smaller than k -> validity marks the shortfall
    mask2 = np.zeros(n, bool)
    mask2[:3] = True
    idx, valid = losses.masked_gumbel_topk(jax.random.PRNGKey(0),
                                           jnp.asarray(mask2), k)
    assert np.asarray(valid).sum() == 3
    assert mask2[np.asarray(idx)[np.asarray(valid)]].all()

    # candidate ARRAY smaller than k (tiny-scale BB banks): static shape
    # stays k, surplus slots invalid, no top_k k<=n error
    mask3 = np.asarray([True, False, True])
    idx, valid = losses.masked_gumbel_topk(jax.random.PRNGKey(1),
                                           jnp.asarray(mask3), k)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert idx.shape == (k,) and valid.shape == (k,)
    assert valid.sum() == 2
    assert mask3[idx[valid]].all()


def test_mutual_nn_brute_force():
    n, m, c = 30, 25, 8
    a = RNG.standard_normal((n, c)).astype(np.float32)
    b = RNG.standard_normal((m, c)).astype(np.float32)
    aff = losses.cosine_affinity(jnp.asarray(a), jnp.asarray(b))
    is_bb, tgt = losses.mutual_nn(aff)
    aff_np = np.asarray(aff)
    for i in range(n):
        j = aff_np[i].argmax()
        expected = aff_np[:, j].argmax() == i
        assert bool(is_bb[i]) == expected
        if expected:
            assert int(tgt[i]) == j


@pytest.mark.slow
def test_cycle_loss_merged_call_equals_split():
    """cycle_consistency_loss runs st+ts as ONE merged prediction batch;
    every op in the prediction path is per-point, so it must equal the
    two-call formulation exactly (and a precomputed FrameView must be a
    pure no-op)."""
    from dino_tracker_tpu.models import tracker
    from dino_tracker_tpu.models.tracker import TrackerConfig, TrackerInput
    from dino_tracker_tpu.training import cycle

    cfg = TrackerConfig(video_h=70, video_w=112,
                        delta_channels=(3, 4, 4, 4, 16))
    key = jax.random.PRNGKey(3)
    params, _ = tracker.init_tracker(key, cfg)
    s = 4
    fh, fw = cfg.feat_hw
    emb = jnp.asarray(RNG.standard_normal((s, 16, fh, fw)).astype(np.float32))
    frames_set_t = jnp.asarray([0, 2, 5, 7], jnp.int32)
    p = 24
    sp = jnp.asarray(np.concatenate(
        [RNG.random((p, 2)).astype(np.float32) * [111, 69],
         RNG.integers(0, 8, (p, 1)).astype(np.float32)], axis=1))
    tp = jnp.asarray(np.concatenate(
        [RNG.random((p, 2)).astype(np.float32) * [111, 69],
         RNG.integers(0, 8, (p, 1)).astype(np.float32)], axis=1))
    si = jnp.asarray(RNG.integers(0, s, (p,)), jnp.int32)
    ti = jnp.asarray(RNG.integers(0, s, (p,)), jnp.int32)
    data = cycle.CycleData(sp, tp, si, ti,
                           jnp.asarray(RNG.random((p,)), jnp.float32),
                           jnp.asarray(RNG.random((p,)) > 0.3))

    merged = cycle.cycle_consistency_loss(params, emb, frames_set_t, data,
                                          cfg, gamma=0.8)
    view = tracker.make_frame_view(emb, jnp.float32)
    merged_v = cycle.cycle_consistency_loss(params, emb, frames_set_t, data,
                                            cfg, gamma=0.8, view=view)

    # split formulation (the pre-merge code path)
    st = tracker.get_point_predictions(
        params, TrackerInput(data.source_points, data.source_frame_indices,
                             data.target_frame_indices, frames_set_t),
        emb, cfg)
    ts = tracker.get_point_predictions(
        params, TrackerInput(data.target_points, data.target_frame_indices,
                             data.source_frame_indices, frames_set_t),
        emb, cfg)
    scale = jnp.asarray([cfg.video_w - 1, cfg.video_h - 1], jnp.float32)
    tgt_norm = 2.0 * data.target_points[:, :2] / scale - 1.0
    src_norm = 2.0 * data.source_points[:, :2] / scale - 1.0
    weight = (0.8 ** data.dists) * data.valid
    n_valid = jnp.maximum(jnp.sum(data.valid), 1)
    l_st = jnp.sum(weight[:, None]
                   * losses.huber(st, tgt_norm, 1 / 32)) / (2 * n_valid)
    l_ts = jnp.sum(weight[:, None]
                   * losses.huber(ts, src_norm, 1 / 32)) / (2 * n_valid)
    split = (l_st + l_ts) / 2.0

    np.testing.assert_allclose(np.asarray(merged), np.asarray(split),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(merged), np.asarray(merged_v))


@pytest.mark.slow
def test_contrastive_vmap_pairs_match_per_pair_loop():
    """The pair axis of both contrastive losses is vmapped (was lax.map);
    per-pair math must match a hand python loop over the same split keys."""
    from dino_tracker_tpu.models import tracker
    from dino_tracker_tpu.models.tracker import TrackerConfig
    from dino_tracker_tpu.structures import BBData
    from dino_tracker_tpu.training import contrastive

    cfg = TrackerConfig(video_h=70, video_w=112,
                        delta_channels=(3, 4, 4, 4, 16))
    s = 4
    fh, fw = cfg.feat_hw
    emb_np = RNG.standard_normal((s, 16, fh, fw)).astype(np.float32)
    emb = jnp.asarray(emb_np)
    frames_set_t = jnp.asarray([0, 2, 5, 7], jnp.int32)
    fg = jnp.asarray((RNG.random((8, 70, 112)) > 0.5).astype(np.float32))
    t_all, cap = 8, 16
    bb = BBData(jnp.asarray(RNG.random((t_all, t_all, cap, 2)) * 100,
                            jnp.float32),
                jnp.asarray(RNG.random((t_all, t_all, cap, 2)) * 100,
                            jnp.float32),
                jnp.asarray(RNG.random((t_all, t_all, cap)), jnp.float32),
                jnp.ones((t_all, t_all, cap), jnp.float32),
                jnp.asarray(RNG.random((t_all, t_all, cap)) > 0.4))
    key = jax.random.PRNGKey(11)

    total = contrastive.dino_bb_contrastive_loss(
        key, emb, frames_set_t, bb, fg, cfg, n_pairs=3, points_per_pair=8,
        fg_points_ratio=0.5, temp=0.1, cl_div=2.0, sig_a=27.0, sig_b=-5.7)
    # n_pairs=1 three times with the exact per-pair keys the vmapped version
    # uses must sum to the same total (the selector draws split identically)
    k_src, k_tgt, k_sel = jax.random.split(key, 3)
    set_size = 4
    src_sel = jax.random.randint(k_src, (3,), 0, set_size)
    tgt_sel = (src_sel + jax.random.randint(k_tgt, (3,), 1, set_size)) % set_size
    pair_keys = jax.random.split(k_sel, 3)
    acc = 0.0
    for i in range(3):
        # rebuild a single-pair call by monkey-free construction: use the
        # public API with n_pairs=1 but overriding the selectors via the
        # same key structure is not possible — instead recompute the pair
        # loss body through the f32 view identity
        view = tracker.make_frame_view(emb, jnp.float32)
        sf, tf = frames_set_t[src_sel[i]], frames_set_t[tgt_sel[i]]
        kf, kb = jax.random.split(pair_keys[i])
        valid = bb.valid[sf, tf]
        fg_raw = losses.sample_fg_mask_at_points(
            fg.take(sf, axis=0), bb.source_coords[sf, tf], 112, 70)
        idx_fg, v_fg = losses.masked_gumbel_topk(kf, valid & fg_raw, 4)
        idx_bg, v_bg = losses.masked_gumbel_topk(kb, valid & ~fg_raw, 4)
        sel = jnp.concatenate([idx_fg, idx_bg])
        sel_valid = jnp.concatenate([v_fg, v_bg])
        src_f = contrastive._sample_embeddings_at(
            emb, bb.source_coords[sf, tf][sel],
            jnp.full((8,), src_sel[i]), cfg)
        tgt_f = contrastive._sample_embeddings_at(
            emb, bb.target_coords[sf, tf][sel],
            jnp.full((8,), tgt_sel[i]), cfg)
        cl1, cl2 = losses.bb_pairs_contrastive_loss_nc(
            src_f, tgt_f, view.flat_cd[src_sel[i]], view.flat_cd[tgt_sel[i]],
            view.norms[src_sel[i]], view.norms[tgt_sel[i]], 0.1)
        ws = jax.nn.sigmoid(27.0 * (1.0 - bb.r[sf, tf][sel]) - 5.7)
        cos_ws = jnp.clip(2.0 * bb.cos_sims[sf, tf][sel] ** 3, min=0.0)
        acc += float(jnp.sum((cl1 + cl2) * ws * cos_ws * sel_valid))
    np.testing.assert_allclose(float(total), acc / 2.0 / 2.0, rtol=2e-5)


def test_grouped_predictions_match_flat_path():
    """get_point_predictions_grouped (per-block single-target correlation)
    must match the flat all-frames+one-hot-select path — same operands,
    just no wasted contractions — and the grouped cycle loss must equal
    the flat cycle loss."""
    from dino_tracker_tpu.models import tracker
    from dino_tracker_tpu.models.tracker import TrackerConfig, TrackerInput
    from dino_tracker_tpu.training import cycle

    cfg = TrackerConfig(video_h=70, video_w=112,
                        delta_channels=(3, 4, 4, 4, 16))
    key = jax.random.PRNGKey(7)
    params, _ = tracker.init_tracker(key, cfg)
    s = 4
    fh, fw = cfg.feat_hw
    emb = jnp.asarray(RNG.standard_normal((s, 16, fh, fw)).astype(np.float32))
    frames_set_t = jnp.asarray([0, 2, 5, 7], jnp.int32)

    g, pp = 3, 8
    pts = jnp.asarray(np.concatenate(
        [RNG.random((g, pp, 2)).astype(np.float32) * [111, 69],
         RNG.integers(0, 8, (g, pp, 1)).astype(np.float32)], axis=2))
    src_g = jnp.asarray(RNG.integers(0, s, (g,)), jnp.int32)
    tgt_g = jnp.asarray(RNG.integers(0, s, (g,)), jnp.int32)

    grouped = tracker.get_point_predictions_grouped(
        params, pts, src_g, tgt_g, emb, cfg)
    flat = tracker.get_point_predictions(
        params, TrackerInput(pts.reshape(g * pp, 3),
                             jnp.repeat(src_g, pp), jnp.repeat(tgt_g, pp),
                             frames_set_t), emb, cfg)
    np.testing.assert_allclose(np.asarray(grouped).reshape(g * pp, 2),
                               np.asarray(flat), atol=1e-5, rtol=1e-5)

    # grouped cycle loss == flat cycle loss on block-structured CycleData
    p = g * pp
    data = cycle.CycleData(
        pts.reshape(p, 3),
        jnp.asarray(np.concatenate(
            [RNG.random((p, 2)).astype(np.float32) * [111, 69],
             RNG.integers(0, 8, (p, 1)).astype(np.float32)], axis=1)),
        jnp.repeat(src_g, pp), jnp.repeat(tgt_g, pp),
        jnp.asarray(RNG.random((p,)), jnp.float32),
        jnp.asarray(RNG.random((p,)) > 0.3))
    l_flat = cycle.cycle_consistency_loss(params, emb, frames_set_t, data,
                                          cfg, gamma=0.8)
    l_grp = cycle.cycle_consistency_loss(params, emb, frames_set_t, data,
                                         cfg, gamma=0.8, group_size=pp)
    np.testing.assert_allclose(np.asarray(l_grp), np.asarray(l_flat),
                               rtol=1e-5)

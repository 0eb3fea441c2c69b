"""Best-buddy mining, NMS ambiguity, fg-mask PCA, fg/bg split tests."""

import numpy as np
import jax.numpy as jnp

from dino_tracker_tpu.ops.nms import nms_top2_peaks, same_size_box_iou
from dino_tracker_tpu.preprocessing import best_buddies as bb_lib
from dino_tracker_tpu.preprocessing.fg_mask import compute_fg_masks
from dino_tracker_tpu.preprocessing.split_fg_bg import split_fg_bg
from dino_tracker_tpu.utils.coords import bb_meshgrid

RNG = np.random.default_rng(19)


# ---------------------------------------------------------------------------
# NMS top-2
# ---------------------------------------------------------------------------

def greedy_nms_top2_reference(scores, coords, topk, box_size, iou_thresh):
    """Full greedy NMS (the reference's batched_nms semantics for equal-size
    boxes), returning the first two surviving peak scores."""
    order = np.argsort(-scores)[:topk]
    kept = []
    for i in order:
        ok = True
        for j in kept:
            d = np.abs(coords[i] - coords[j])
            side = 2 * box_size
            inter = max(0.0, side - d[0]) * max(0.0, side - d[1])
            iou = inter / (2 * side * side - inter)
            if iou > iou_thresh:
                ok = False
                break
        if ok:
            kept.append(i)
        if len(kept) == 2:
            break
    p1 = scores[kept[0]]
    p2 = scores[kept[1]] if len(kept) > 1 else 0.0
    return p1, p2


def test_nms_top2_matches_full_greedy():
    n = 300
    coords = RNG.random((n, 2)).astype(np.float32) * 400
    for trial in range(5):
        scores = RNG.random((1, n)).astype(np.float32)
        peaks, r = nms_top2_peaks(jnp.asarray(scores), jnp.asarray(coords),
                                  topk=100, box_size=30.0, iou_thresh=0.2)
        p1, p2 = greedy_nms_top2_reference(scores[0], coords, 100, 30.0, 0.2)
        np.testing.assert_allclose(np.asarray(peaks)[0], [p1, p2], atol=1e-6)
        np.testing.assert_allclose(np.asarray(r)[0], p2 / p1, atol=1e-6)


def test_box_iou():
    a = np.array([[0.0, 0.0]])
    b = np.array([[0.0, 0.0]])
    assert float(same_size_box_iou(jnp.asarray(a), jnp.asarray(b), 30.0)[0]) == 1.0
    b = np.array([[120.0, 0.0]])  # disjoint
    assert float(same_size_box_iou(jnp.asarray(a), jnp.asarray(b), 30.0)[0]) == 0.0


# ---------------------------------------------------------------------------
# mutual NN
# ---------------------------------------------------------------------------

def test_extract_best_buddies_identity_features():
    """Distinct per-position features identical across frames: every patch is
    its own best buddy with cos 1."""
    h, w, stride = 42, 56, 7
    grid = np.asarray(bb_meshgrid(h, w, stride))
    n = grid.shape[0]
    c = 16
    pos_feat = RNG.standard_normal((n, c)).astype(np.float32) * 2
    feats = np.tile(pos_feat.T.reshape(1, c, 5, 7), (3, 1, 1, 1))
    bb = bb_lib.extract_best_buddies(jnp.asarray(feats), h, w, stride, cap=n)
    v = np.asarray(bb.valid)
    assert v[0, 1].all()
    np.testing.assert_allclose(np.asarray(bb.cos_sims)[0, 1], 1.0, atol=1e-5)
    # source == target coords (identity matching), both directions mirrored
    np.testing.assert_allclose(np.asarray(bb.source_coords)[0, 1],
                               np.asarray(bb.target_coords)[0, 1])
    np.testing.assert_allclose(np.asarray(bb.source_coords)[1, 0],
                               np.asarray(bb.target_coords)[0, 1])
    # diagonal pairs unset
    assert not v[0, 0].any()


def test_extract_best_buddies_cap_exceeds_tokens():
    """cap larger than the token count pads with invalid entries instead of
    crashing (real failure: 140×238 video has 627 tokens < cap 1024)."""
    h, w, stride = 42, 56, 7
    grid = np.asarray(bb_meshgrid(h, w, stride))
    n = grid.shape[0]  # 35
    c = 16
    pos_feat = RNG.standard_normal((n, c)).astype(np.float32) * 2
    feats = np.tile(pos_feat.T.reshape(1, c, 5, 7), (2, 1, 1, 1))
    bb = bb_lib.extract_best_buddies(jnp.asarray(feats), h, w, stride,
                                     cap=n + 61)
    v = np.asarray(bb.valid)
    assert v.shape[-1] == n + 61
    assert v[0, 1, :n].all() and not v[0, 1, n:].any()
    np.testing.assert_allclose(np.asarray(bb.cos_sims)[0, 1, :n], 1.0,
                               atol=1e-5)


def test_extract_best_buddies_mutuality_random():
    """Random features: our mutual-NN set equals the brute-force one."""
    h, w, stride, c = 42, 56, 7, 8
    t = 2
    feats = RNG.standard_normal((t, c, 5, 7)).astype(np.float32)
    n = 35
    bb = bb_lib.extract_best_buddies(jnp.asarray(feats), h, w, stride, cap=n)

    a = feats[0].reshape(c, -1).T
    b = feats[1].reshape(c, -1).T
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    aff = an @ bn.T
    src_max = aff.argmax(1)
    tgt_max = aff.argmax(0)
    mutual = np.arange(n) == tgt_max[src_max]

    grid = np.asarray(bb_meshgrid(h, w, stride))
    expect_src = set(map(tuple, grid[mutual]))
    got_valid = np.asarray(bb.valid)[0, 1]
    got_src = set(map(tuple, np.asarray(bb.source_coords)[0, 1][got_valid]))
    assert got_src == expect_src


# ---------------------------------------------------------------------------
# OF filter
# ---------------------------------------------------------------------------

def test_of_filter_keeps_only_flow_gaps():
    h, w, stride = 42, 56, 7
    t = 3
    grid = np.asarray(bb_meshgrid(h, w, stride))
    n = grid.shape[0]
    c = 8
    pos_feat = RNG.standard_normal((n, c)).astype(np.float32) * 2
    feats = np.tile(pos_feat.T.reshape(1, c, 5, 7), (t, 1, 1, 1))
    bb = bb_lib.extract_best_buddies(jnp.asarray(feats), h, w, stride, cap=n)

    # one trajectory per grid point, valid at both frames -> everything
    # flow-covered -> all buddies dropped
    trajs = np.tile(grid[:, None, :], (1, t, 1)).astype(np.float32)
    filtered = bb_lib.of_filter_best_buddies(bb, trajs, h, w, stride)
    assert not np.asarray(filtered.valid)[0, 1].any()

    # invalidate trajectories at frames 0 and 1 (flow gap between them,
    # still valid at frame 2) -> (0,1) buddies survive, (0,2) stay dropped
    trajs2 = trajs.copy()
    trajs2[:, 0] = np.nan
    trajs2[:, 1] = np.nan
    filtered2 = bb_lib.of_filter_best_buddies(bb, trajs2, h, w, stride)
    assert np.asarray(filtered2.valid)[0, 1].sum() == n
    assert not np.asarray(filtered2.valid)[0, 2].any()


# ---------------------------------------------------------------------------
# ambiguity
# ---------------------------------------------------------------------------

def test_ambiguity_low_for_unique_match():
    """Unique sharp match -> tiny r; duplicated features far apart -> r ≈ 1."""
    h, w, stride = 42, 56, 7
    grid = np.asarray(bb_meshgrid(h, w, stride))
    n, c = grid.shape[0], 16
    uniq = np.eye(n, c < n and c or n)[:, :c].astype(np.float32)
    uniq = RNG.standard_normal((n, c)).astype(np.float32) * 3
    feats = np.tile(uniq.T.reshape(1, c, 5, 7), (2, 1, 1, 1))
    bb = bb_lib.extract_best_buddies(jnp.asarray(feats), h, w, stride, cap=n)
    bb_amb = bb_lib.compute_bb_ambiguity(bb, jnp.asarray(feats), h, w, stride,
                                         box_size=5.0, iou_thresh=0.2)
    r = np.asarray(bb_amb.r)[0, 1][np.asarray(bb_amb.valid)[0, 1]]
    assert (r < 0.9).mean() > 0.8  # mostly unambiguous

    # now duplicate one feature at two distant positions
    dup = uniq.copy()
    dup[0] = dup[n - 1]  # same feature at grid[0] and grid[-1]
    feats2 = np.tile(dup.T.reshape(1, c, 5, 7), (2, 1, 1, 1))
    bb2 = bb_lib.extract_best_buddies(jnp.asarray(feats2), h, w, stride, cap=n)
    bb2 = bb_lib.compute_bb_ambiguity(bb2, jnp.asarray(feats2), h, w, stride,
                                      box_size=5.0, iou_thresh=0.2)
    # the duplicated feature's buddy (wherever it matched) is fully ambiguous
    valid = np.asarray(bb2.valid)[0, 1]
    srcs = np.asarray(bb2.source_coords)[0, 1]
    rs = np.asarray(bb2.r)[0, 1]
    gridl = grid.tolist()
    amb_points = {tuple(gridl[0]), tuple(gridl[-1])}
    hit = [rs[i] for i in range(len(valid))
           if valid[i] and tuple(srcs[i].tolist()) in amb_points]
    assert hit and max(hit) > 0.99


# ---------------------------------------------------------------------------
# fg mask + split
# ---------------------------------------------------------------------------

def test_fg_mask_separates_two_clusters():
    t, hp, wp, c = 3, 6, 8, 12
    a = RNG.standard_normal(c).astype(np.float32)
    b = -a  # two opposite clusters
    feats = np.tile(a, (t, hp, wp, 1))
    feats[:, 2:4, 3:6] = b  # interior block = "foreground"
    feats += RNG.standard_normal(feats.shape).astype(np.float32) * 0.05
    feats = np.transpose(feats, (0, 3, 1, 2))
    masks = compute_fg_masks(jnp.asarray(feats), out_hw=(12, 16),
                             fg_mask_threshold=0.5)
    assert masks.shape == (t, 12, 16)
    # interior block is fg, border is bg
    assert masks[:, 5:7, 7:11].mean() > 0.9
    assert masks[:, 0, :].mean() < 0.1


def test_split_fg_bg():
    t, h, w = 4, 20, 30
    masks = np.zeros((t, h, w), np.float32)
    masks[:, :, 15:] = 1.0  # right half fg
    trajs = np.full((6, t, 2), np.nan, np.float32)
    # traj 0 starts frame 0 on the left (bg)
    trajs[0, 0] = [3, 5]; trajs[0, 1] = [4, 5]
    # traj 1 starts frame 2 on the right (fg)
    trajs[1, 2] = [20, 10]; trajs[1, 3] = [21, 10]
    # traj 2 starts frame 1 left
    trajs[2, 1] = [1, 1]; trajs[2, 2] = [2, 1]
    # traj 3 starts frame 0 right
    trajs[3, 0] = [29, 19]; trajs[3, 1] = [28, 19]
    trajs[4, 0] = [16, 0]; trajs[4, 1] = [16, 1]  # fg boundary
    trajs[5, 0] = [14, 0]; trajs[5, 1] = [14, 1]  # bg boundary
    fg, bg = split_fg_bg(trajs, masks)
    assert fg.shape[0] == 3 and bg.shape[0] == 3
    np.testing.assert_allclose(fg[0, 2], [20, 10])


def test_fused_of_filter_before_cap():
    """With a tiny cap, a high-cosine flow-covered buddy must NOT evict the
    low-cosine flow-gap buddy the filter is meant to keep."""
    h, w, stride = 42, 56, 7
    t = 2
    grid = np.asarray(bb_meshgrid(h, w, stride))
    n, c = grid.shape[0], 8
    # identity features (every token its own buddy, cos 1) with one token
    # slightly perturbed so its cosine is lower
    pos = RNG.standard_normal((n, c)).astype(np.float32) * 3
    feats = np.stack([pos, pos.copy()])
    feats[1, 5] += RNG.standard_normal(c).astype(np.float32) * 0.4  # lower cos
    feats = feats.transpose(0, 2, 1).reshape(t, c, 5, 7)

    # trajectories covering EVERY grid point, valid at both frames — except
    # at token 5: one trajectory dies after frame 0 and a separate one starts
    # at frame 1 (the reference's flow-gap condition needs a dying trajectory
    # on the source side and a late starter on the target side)
    trajs = np.tile(grid[:, None, :], (1, t, 1)).astype(np.float32)
    trajs[5, 1] = np.nan                       # dies after frame 0
    late = np.full((1, t, 2), np.nan, np.float32)
    late[0, 1] = grid[5]                       # starts at frame 1
    trajs = np.concatenate([trajs, late], axis=0)

    bb = bb_lib.extract_best_buddies(jnp.asarray(feats), h, w, stride, cap=2,
                                     unfiltered_trajectories=trajs)
    v = np.asarray(bb.valid)[0, 1]
    srcs = np.asarray(bb.source_coords)[0, 1]
    # only the flow-gap token survives, despite 34 higher-cosine buddies
    assert v.sum() == 1
    np.testing.assert_allclose(srcs[v][0], grid[5])

    # sanity: without the filter the cap keeps the 2 strongest instead
    bb2 = bb_lib.extract_best_buddies(jnp.asarray(feats), h, w, stride, cap=2)
    assert np.asarray(bb2.valid)[0, 1].sum() == 2


# ---------------------------------------------------------------------------
# pair-batched sweep / mesh sharding
# ---------------------------------------------------------------------------

def test_extract_best_buddies_mesh_matches_single_device():
    """The pair-batched sweep sharded over the 8-device CPU mesh must equal
    the unsharded sweep (including the fused OF filter)."""
    from dino_tracker_tpu.parallel.mesh import make_mesh

    h, w, stride, c, t = 42, 56, 7, 8, 5
    feats = RNG.standard_normal((t, c, 5, 7)).astype(np.float32)
    trajs = RNG.random((40, t, 2)).astype(np.float32) * [w - 1, h - 1]
    trajs[RNG.random((40, t)) < 0.5] = np.nan
    kw = dict(cap=16, unfiltered_trajectories=trajs)
    base = bb_lib.extract_best_buddies(jnp.asarray(feats), h, w, stride,
                                       pair_batch=3, **kw)
    sharded = bb_lib.extract_best_buddies(jnp.asarray(feats), h, w, stride,
                                          mesh=make_mesh(8), **kw)
    for name in ("source_coords", "target_coords", "cos_sims", "valid"):
        np.testing.assert_allclose(np.asarray(getattr(base, name)),
                                   np.asarray(getattr(sharded, name)),
                                   atol=1e-5, err_msg=name)


def test_bb_ambiguity_mesh_matches_single_device():
    from dino_tracker_tpu.parallel.mesh import make_mesh

    h, w, stride, c, t = 42, 56, 7, 8, 4
    feats = RNG.standard_normal((t, c, 5, 7)).astype(np.float32)
    bb = bb_lib.extract_best_buddies(jnp.asarray(feats), h, w, stride, cap=8)
    base = bb_lib.compute_bb_ambiguity(bb, jnp.asarray(feats), h, w, stride,
                                       topk=8, pair_batch=2)
    sharded = bb_lib.compute_bb_ambiguity(bb, jnp.asarray(feats), h, w,
                                          stride, topk=8, mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(base.r), np.asarray(sharded.r),
                               atol=1e-5)


def test_extract_best_buddies_adaptive_cap():
    """cap=None (the default): the sweep runs uncapped, then trims the buddy
    axis to the largest observed per-pair count (multiple of 128, floor 128)
    — nothing is ever truncated, matching the reference's ragged keep-all
    lists (extract_dino_best_buddies.py:26-44)."""
    h, w, stride = 42, 56, 7
    grid = np.asarray(bb_meshgrid(h, w, stride))
    n = grid.shape[0]  # 35
    c = 16
    feats = RNG.standard_normal((3, c, 5, 7)).astype(np.float32)
    telemetry: dict = {}
    bb = bb_lib.extract_best_buddies(jnp.asarray(feats), h, w, stride,
                                     telemetry=telemetry)
    assert telemetry["adaptive"] is True
    assert telemetry["truncated_pairs"] == 0
    # trimmed capacity: >= max observed count, lane-rounded, never above n
    assert telemetry["cap"] == min(n, max(128, -(-telemetry["max_count"]
                                                 // 128) * 128))
    assert bb.valid.shape[-1] == telemetry["cap"]
    # equals the explicit uncapped run on the shared prefix
    ref = bb_lib.extract_best_buddies(jnp.asarray(feats), h, w, stride, cap=n)
    k = bb.valid.shape[-1]
    np.testing.assert_array_equal(np.asarray(bb.valid),
                                  np.asarray(ref.valid)[:, :, :k])
    np.testing.assert_allclose(np.asarray(bb.source_coords),
                               np.asarray(ref.source_coords)[:, :, :k])
    np.testing.assert_allclose(np.asarray(bb.cos_sims),
                               np.asarray(ref.cos_sims)[:, :, :k])
    # everything past the trim point in the uncapped run was invalid padding
    assert not np.asarray(ref.valid)[:, :, k:].any()


def test_pair_ambiguity_cap_chunking_exact():
    """The cap-axis streaming path (cap > cap_chunk) is bitwise-identical to
    the single-slab path — nms_top2_peaks is row-independent, so chunking
    the buddy axis must not change peaks or r (incl. the padded tail)."""
    n, c, cap = 60, 16, 23
    grid = np.asarray(bb_meshgrid(70, 70, 7), np.float32)[:n]
    sf = RNG.standard_normal((cap, c)).astype(np.float32)
    tf = RNG.standard_normal((n, c)).astype(np.float32)
    p_ref, r_ref = bb_lib._pair_ambiguity(
        jnp.asarray(sf), jnp.asarray(tf), jnp.asarray(grid),
        topk=10, box_size=30.0, iou_thresh=0.2, cap_chunk=cap)
    p_chk, r_chk = bb_lib._pair_ambiguity(
        jnp.asarray(sf), jnp.asarray(tf), jnp.asarray(grid),
        topk=10, box_size=30.0, iou_thresh=0.2, cap_chunk=8)
    np.testing.assert_array_equal(np.asarray(p_ref), np.asarray(p_chk))
    np.testing.assert_array_equal(np.asarray(r_ref), np.asarray(r_chk))

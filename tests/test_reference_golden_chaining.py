"""Golden tests: preprocessing + inference pipelines vs the reference's OWN code.

Each test runs a reference module verbatim on CPU torch — trajectory
chaining (extract_trajectories.py, with its RAFT swapped for a fake serving
canned flows), best-buddy extraction (extract_dino_best_buddies.py), the
OF-gap filter (of_filter_dino_best_buddies.py), NMS ambiguity
(compute_dino_bb_nms.py, with a literal greedy stand-in for the absent
torchvision batched_nms), and the occlusion rule (model_inference.py) — and
asserts our JAX implementations reproduce the exact outputs.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE),
    reason="reference checkout not present on this machine")
if REFERENCE not in sys.path:
    sys.path.append(REFERENCE)

T, H, W = 5, 48, 64  # divisible by 8: InputPadder is a no-op
VAL_STEP = 20        # frame k has constant pixel value (k+1)*VAL_STEP


def _stub_torchvision():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms


def _canned_flows():
    """Smooth deterministic flow fields for every ordered frame pair."""
    rng = np.random.default_rng(31)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    flows = {}
    for i in range(T):
        for j in range(T):
            if i == j:
                continue
            a, b, c, d = rng.uniform(-2.5, 2.5, 4)
            p, q = rng.uniform(0, 2 * np.pi, 2)
            fx = a * np.sin(2 * np.pi * ys / H + p) + b
            fy = c * np.cos(2 * np.pi * xs / W + q) + d
            flows[(i, j)] = np.stack([fx, fy]).astype(np.float32)  # 2×h×w
    return flows


FLOWS = _canned_flows()


class FakeRaft:
    """Stands in for torchvision's raft_large: identifies the (source,
    target) frame pair from the constant-valued inputs and returns the
    canned flow. Every other line executed is the reference's."""

    def to(self, device):
        return self

    def eval(self):
        return self

    @staticmethod
    def _ident(x):
        return int(round(float(x.max()) * 255.0 / VAL_STEP)) - 1

    def __call__(self, from_batch, to_batch, num_flow_updates=24):
        out = []
        for a, b in zip(from_batch, to_batch):
            out.append(torch.from_numpy(FLOWS[(self._ident(a), self._ident(b))]))
        return [torch.stack(out)]


@pytest.fixture()
def ref_chaining(monkeypatch, tmp_path):
    _stub_torchvision()
    # extract_trajectories.py imports raft_large from
    # torchvision.models.optical_flow at module level
    if "torchvision.models" not in sys.modules:
        tvm = types.ModuleType("torchvision.models")
        tvm.optical_flow = types.ModuleType("torchvision.models.optical_flow")
        tvm.optical_flow.raft_large = lambda **kw: FakeRaft()
        tvm.optical_flow.Raft_Large_Weights = types.SimpleNamespace(
            DEFAULT=types.SimpleNamespace(transforms=lambda: (lambda a, b: (a, b))))
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.models.optical_flow"] = tvm.optical_flow

    from preprocessing import extract_trajectories as ref_et  # reference

    monkeypatch.setattr(ref_et, "raft_large", lambda **kw: FakeRaft())
    monkeypatch.setattr(
        ref_et, "Raft_Large_Weights", types.SimpleNamespace(
            DEFAULT=types.SimpleNamespace(transforms=lambda: (lambda a, b: (a, b)))))
    monkeypatch.setattr(ref_et, "device", "cpu")
    # the one hard-coded .cuda() (extract_trajectories.py:265)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)

    from PIL import Image
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for k in range(T):
        arr = np.full((H, W, 3), (k + 1) * VAL_STEP, np.uint8)
        Image.fromarray(arr).save(frames_dir / f"{k:05d}.png")
    return ref_et, str(frames_dir), tmp_path


def _canon(rows):
    """Sort trajectory rows canonically for order-independent comparison."""
    flat = np.nan_to_num(rows, nan=-1e9).reshape(rows.shape[0], -1)
    order = np.lexsort(flat.T[::-1])
    return rows[order]


@pytest.mark.parametrize("use_direct", [False, True])
def test_chaining_matches_reference(ref_chaining, use_direct):
    ref_et, frames_dir, tmp_path = ref_chaining
    threshold, dthreshold, min_len = 1.5, 3.0, 2

    out_path = str(tmp_path / f"traj_{use_direct}.pt")
    args = types.SimpleNamespace(
        frames_path=frames_dir, output_path=out_path, infer_res_size=None,
        threshold=threshold, min_trajectory_length=min_len,
        filter_using_direct_flow=use_direct,
        direct_flow_threshold=dthreshold)
    ref_et.save_trajectories(args)
    ref = torch.load(out_path).numpy()  # N×T×2 with NaNs

    from dino_tracker_tpu.preprocessing import trajectories as our_traj

    flows_fwd = np.stack([FLOWS[(i, i + 1)] for i in range(T - 1)])
    flows_bwd = np.stack([FLOWS[(i + 1, i)] for i in range(T - 1)])

    direct_fn = None
    if use_direct:
        def direct_fn(start):
            # the reference's own direct-flow computation (with the same
            # fake RAFT) supplies both sides, isolating the chaining logic
            df, dm = ref_et.compute_direct_flows_for_start_frame(
                FakeRaft(), lambda a, b: (a, b), frames_dir, device="cpu",
                threshold=threshold, starting_frame=start)
            return df.numpy(), dm.numpy()

    got = our_traj.extract_trajectories(
        flows_fwd, flows_bwd, threshold=threshold,
        min_trajectory_length=min_len, direct_flow_fn=direct_fn,
        direct_flow_threshold=dthreshold)

    assert got.shape == ref.shape, (got.shape, ref.shape)
    a, b = _canon(np.asarray(got)), _canon(ref)
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), atol=2e-3)


@pytest.mark.parametrize("seed", [0, 4])
def test_best_buddies_match_reference(monkeypatch, tmp_path, seed):
    """The reference's own mutual-NN extraction (ordered double loop over
    frame pairs, extract_dino_best_buddies.py:13-54) vs our unordered
    mirror sweep, per-pair as coordinate/cos-sim sets."""
    _stub_torchvision()
    from preprocessing_dino_bb import extract_dino_best_buddies as ref_bb

    monkeypatch.setattr(ref_bb, "device", "cpu")

    rng = np.random.default_rng(seed)
    t, c, h, w, stride = 4, 12, 70, 98, 7
    hp = 1 + (h - 14) // stride
    wp = 1 + (w - 14) // stride
    feats = rng.standard_normal((t, c, hp, wp)).astype(np.float32)
    emb_path = str(tmp_path / "feats.pt")
    torch.save(torch.from_numpy(feats), emb_path)
    out_path = str(tmp_path / "bb.pt")
    ref_bb.run(types.SimpleNamespace(dino_emb_path=emb_path, h=h, w=w,
                                     stride=stride, out_path=out_path))
    ref = torch.load(out_path)

    import jax.numpy as jnp

    from dino_tracker_tpu.preprocessing.best_buddies import extract_best_buddies

    bb = extract_best_buddies(jnp.asarray(feats), h, w, stride=stride,
                              cap=hp * wp)  # cap >= n: nothing truncates
    sc = np.asarray(bb.source_coords)
    tc = np.asarray(bb.target_coords)
    cs = np.asarray(bb.cos_sims)
    valid = np.asarray(bb.valid)

    def rows(src, tgt, cos):
        r = np.concatenate([src, tgt, cos[:, None]], axis=1)
        return r[np.lexsort(r.T[::-1])]

    for s in range(t):
        for d in range(t):
            if s == d:
                continue
            entry = ref[f"{s}_{d}"]
            ref_rows = rows(entry["source_coords"].numpy(),
                            entry["target_coords"].numpy(),
                            entry["cos_sims"].numpy())
            m = valid[s, d]
            got_rows = rows(sc[s, d][m], tc[s, d][m], cs[s, d][m])
            assert got_rows.shape == ref_rows.shape, (s, d, got_rows.shape,
                                                      ref_rows.shape)
            np.testing.assert_allclose(got_rows, ref_rows, atol=1e-4,
                                       err_msg=f"pair {s}->{d}")


def test_of_filter_matches_reference(monkeypatch, tmp_path):
    """The reference's own OF-gap filter (of_filter_dino_best_buddies.py:
    nearest-trajectory lookup per buddy endpoint, keep only pairs whose
    trajectories are invalid across the pair) vs our batched filter, on a
    shared mutual-NN extraction and NaN-holed trajectories."""
    _stub_torchvision()
    from preprocessing_dino_bb import extract_dino_best_buddies as ref_bb
    from preprocessing_dino_bb import of_filter_dino_best_buddies as ref_of

    monkeypatch.setattr(ref_bb, "device", "cpu")
    monkeypatch.setattr(ref_of, "device", "cpu")

    rng = np.random.default_rng(6)
    t, c, h, w, stride = 4, 10, 70, 98, 7
    hp = 1 + (h - 14) // stride
    wp = 1 + (w - 14) // stride
    feats = rng.standard_normal((t, c, hp, wp)).astype(np.float32)
    emb_path = str(tmp_path / "feats.pt")
    torch.save(torch.from_numpy(feats), emb_path)
    bb_path = str(tmp_path / "bb.pt")
    ref_bb.run(types.SimpleNamespace(dino_emb_path=emb_path, h=h, w=w,
                                     stride=stride, out_path=bb_path))

    n_traj = 60
    traj = rng.random((n_traj, t, 2)).astype(np.float32) * [w - 1, h - 1]
    holes = rng.random((n_traj, t)) < 0.5
    traj[holes] = np.nan
    traj_path = str(tmp_path / "traj.pt")
    torch.save(torch.from_numpy(traj), traj_path)

    out_path = str(tmp_path / "bb_filtered.pt")
    ref_of.run(types.SimpleNamespace(dino_bb_path=bb_path, traj_path=traj_path,
                                     out_path=out_path, dino_bb_stride=stride,
                                     h=h, w=w))
    ref = torch.load(out_path)

    import jax.numpy as jnp

    from dino_tracker_tpu.preprocessing.best_buddies import (
        extract_best_buddies, of_filter_best_buddies)

    bb = extract_best_buddies(jnp.asarray(feats), h, w, stride=stride,
                              cap=hp * wp)
    filt = of_filter_best_buddies(bb, traj, h, w, stride=stride)
    sc = np.asarray(filt.source_coords)
    tc = np.asarray(filt.target_coords)
    cs = np.asarray(filt.cos_sims)
    valid = np.asarray(filt.valid)

    def rows(src, tgt, cos):
        r = np.concatenate([src, tgt, cos[:, None]], axis=1)
        return r[np.lexsort(r.T[::-1])]

    checked_nonempty = 0
    for s in range(t):
        for d in range(t):
            if s == d:
                continue
            entry = ref[f"{s}_{d}"]
            m = valid[s, d]
            if entry["source_coords"] is None:
                assert not m.any(), (s, d)
                continue
            checked_nonempty += 1
            ref_rows = rows(entry["source_coords"].numpy(),
                            entry["target_coords"].numpy(),
                            entry["cos_sims"].numpy())
            got_rows = rows(sc[s, d][m], tc[s, d][m], cs[s, d][m])
            assert got_rows.shape == ref_rows.shape, (s, d, got_rows.shape,
                                                      ref_rows.shape)
            np.testing.assert_allclose(got_rows, ref_rows, atol=1e-4,
                                       err_msg=f"pair {s}->{d}")
    assert checked_nonempty > 0  # the filter must not degenerate to empty


@pytest.mark.slow
def test_bb_nms_ambiguity_matches_reference(monkeypatch, tmp_path):
    """Top-2-peak NMS ambiguity r (compute_dino_bb_nms.py:12-77) and its
    cross-direction max symmetrization vs our closed-form top-2 greedy NMS.
    The reference's lines run verbatim except ``torchvision.ops.batched_nms``
    (package absent here), replaced by a literal greedy NMS with torchvision's
    documented semantics (per-category, score-descending, suppress IoU>thr)."""
    _stub_torchvision()

    def greedy_batched_nms(boxes, scores, idxs, iou_threshold):
        order = torch.argsort(scores, descending=True, stable=True)
        keep = []
        kept_boxes = {int(c): [] for c in idxs.unique()}

        def iou(a, b):
            ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
            iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
            inter = ix * iy
            area_a = (a[2] - a[0]) * (a[3] - a[1])
            area_b = (b[2] - b[0]) * (b[3] - b[1])
            return inter / (area_a + area_b - inter)

        for i in order.tolist():
            cat = int(idxs[i])
            box = boxes[i].tolist()
            if all(iou(box, kb) <= iou_threshold for kb in kept_boxes[cat]):
                keep.append(i)
                kept_boxes[cat].append(box)
        return torch.tensor(keep, dtype=torch.long)

    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.batched_nms = greedy_batched_nms
    sys.modules["torchvision.ops"] = tv_ops
    sys.modules["torchvision"].ops = tv_ops

    from preprocessing_dino_bb import compute_dino_bb_nms as ref_nms
    from preprocessing_dino_bb import extract_dino_best_buddies as ref_bb
    from preprocessing_dino_bb.dino_bb_utils import create_meshgrid

    monkeypatch.setattr(ref_nms, "device", "cpu")
    monkeypatch.setattr(ref_nms, "batched_nms", greedy_batched_nms)
    monkeypatch.setattr(ref_bb, "device", "cpu")

    rng = np.random.default_rng(8)
    # the reference hardcodes topk=400 inside get_bb_sim_indices: the grid
    # must carry >=400 candidates
    t, c, h, w, stride = 3, 10, 154, 210, 7
    hp = 1 + (h - 14) // stride
    wp = 1 + (w - 14) // stride
    feats = rng.standard_normal((t, c, hp, wp)).astype(np.float32)
    emb_path = str(tmp_path / "feats.pt")
    torch.save(torch.from_numpy(feats), emb_path)
    bb_path = str(tmp_path / "bb.pt")
    ref_bb.run(types.SimpleNamespace(dino_emb_path=emb_path, h=h, w=w,
                                     stride=stride, out_path=bb_path))
    ref_dict = torch.load(bb_path)

    coords = create_meshgrid(h=h, w=w, step=stride)
    box_size, iou_thresh, topk = 10.0, 0.2, 400  # small boxes: several peaks
    dino_emb = torch.from_numpy(feats)
    ref_r = {}
    for s in range(t):
        for d in range(s + 1, t):
            bb_f = ref_nms.compute_bb_nms(ref_dict[f"{s}_{d}"], s, d, dino_emb,
                                          coords, stride, box_size, iou_thresh)
            bb_b = ref_nms.compute_bb_nms(ref_dict[f"{d}_{s}"], d, s, dino_emb,
                                          coords, stride, box_size, iou_thresh)
            bb_f, bb_b = ref_nms.compute_max_r(bb_f, bb_b)
            ref_r[(s, d)] = bb_f["r"].numpy()
            ref_r[(d, s)] = bb_b["r"].numpy()

    import jax.numpy as jnp

    from dino_tracker_tpu.preprocessing.best_buddies import (
        compute_bb_ambiguity, extract_best_buddies)

    bb = extract_best_buddies(jnp.asarray(feats), h, w, stride=stride,
                              cap=hp * wp)
    out = compute_bb_ambiguity(bb, jnp.asarray(feats), h, w, stride=stride,
                               box_size=box_size, iou_thresh=iou_thresh,
                               topk=topk)
    r_all = np.asarray(out.r)
    sc = np.asarray(bb.source_coords)
    valid = np.asarray(bb.valid)

    for s in range(t):
        for d in range(t):
            if s == d:
                continue
            m = valid[s, d]
            # align rows: the reference keeps its extraction order; ours is
            # the mirror sweep's — match by source coordinate
            ref_src = ref_dict[f"{s}_{d}"]["source_coords"].numpy()
            got_src = sc[s, d][m]
            order = np.lexsort(got_src.T[::-1])
            ref_order = np.lexsort(ref_src.T[::-1])
            np.testing.assert_allclose(got_src[order], ref_src[ref_order],
                                       atol=1e-4)
            np.testing.assert_allclose(r_all[s, d][m][order],
                                       ref_r[(s, d)][ref_order], atol=1e-4,
                                       err_msg=f"pair {s}->{d}")


def test_occlusion_rule_matches_reference_code(monkeypatch, tmp_path):
    """compute_occ_pred_for_qp (model_inference.py:169-177) as a direct
    oracle for our masked-median occlusion — replaces trust in the
    hand-written torch mirror in tests/test_inference.py."""
    _stub_torchvision()
    if "antialiased_cnns" not in sys.modules:
        aa = types.ModuleType("antialiased_cnns")
        aa.BlurPool = torch.nn.Identity
        sys.modules["antialiased_cnns"] = aa
    if "models.extractor" not in sys.modules:
        ex = types.ModuleType("models.extractor")
        ex.VitExtractor = object
        sys.modules["models.extractor"] = ex

    from models import model_inference as ref_mi

    import jax
    import jax.numpy as jnp

    from dino_tracker_tpu.inference.infer import ModelInference as OurMI
    from dino_tracker_tpu.models import tracker as our_tracker
    from dino_tracker_tpu.models.tracker import TrackerConfig

    rng = np.random.default_rng(17)
    n, t = 6, 9
    anch_th, cos_th = 0.7, 0.6
    trajs = (rng.random((n, t, 2)) * 80).astype(np.float32)
    cos = rng.random((n, t)).astype(np.float32)
    cos[:, 0] = 1.0  # at least one anchor per query
    green = (rng.random((n, t, t, 2)) * 80).astype(np.float32)

    ref_rows = []
    for q in range(n):
        vis = cos[q] >= anch_th
        # reference green only holds rows for visible anchors (T_vis × T × 2)
        ref_rows.append(ref_mi.ModelInference.compute_occ_pred_for_qp(
            None, torch.from_numpy(green[q][vis]),
            torch.from_numpy(trajs[q]), torch.from_numpy(cos[q]),
            anch_th, cos_th).numpy())
    ref = np.stack(ref_rows)

    tcfg = TrackerConfig(video_h=70, video_w=98, delta_channels=(3, 4, 4, 4, 8))
    params, _ = our_tracker.init_tracker(jax.random.PRNGKey(0), tcfg)
    hp, wp = tcfg.feat_hw
    mi = OurMI(params=params,
               refined_features=jnp.zeros((t, 8, hp, wp), jnp.float32),
               cfg=tcfg, anchor_cosine_similarity_threshold=anch_th,
               cosine_similarity_threshold=cos_th)
    trajs3 = np.concatenate(
        [trajs, np.broadcast_to(np.arange(t, dtype=np.float32),
                                (n, t))[..., None]], axis=-1)
    got = np.asarray(mi.compute_occlusion(
        jnp.asarray(trajs3), jnp.asarray(cos), jnp.asarray(green)))
    np.testing.assert_array_equal(got, ref)

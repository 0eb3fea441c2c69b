"""Golden parity of the contrastive/cycle losses vs the REFERENCE'S OWN code.

The hardest loss math (reference dino_tracker.py:159-353 — the dino-BB
ambiguity-sigmoid weighting, the refined-BB in-step mining + cos³ weighting,
the γ^dist cycle weighting) was previously tested only against builder-written
torch mirrors, which can encode the same misreading twice. Here we import the
reference's actual ``DINOTracker`` methods and run them on CPU torch.

Technique (same device-rebind pattern as tests/test_reference_golden.py):
  * ``DINOTracker``/``Tracker`` are built via ``__new__`` + attribute
    injection (their ctors demand dataset paths / checkpoints);
  * the two CUDA-only knots are rebound, not edited: ``Tensor.cuda`` becomes
    identity, and ``get_vit_feature_coords_from_mask``'s ``device='cuda'``
    default becomes 'cpu' (models/utils.py:87);
  * missing GPU-only deps (antialiased_cnns, torchvision) are stubbed in
    sys.modules — the loss paths never touch them;
  * torch's frame-pair randint draws are replicated outside the call (same
    seed, same op order — dino_tracker.py:160-164 / 250-251) and injected
    into our losses via ``pair_sel``;
  * subset sizes are set to FULL TAKE (points_per_pair ≥ every candidate),
    so the reference's randperm order only permutes commutative sums and the
    loss value is deterministic given the frame draws.
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

import jax
import jax.numpy as jnp

from dino_tracker_tpu.models.tracker import TrackerConfig
from dino_tracker_tpu.structures import BBData
from dino_tracker_tpu.training import contrastive as our_cl
from dino_tracker_tpu.training import cycle as our_cycle

# test-scale geometry: feat grid (70-14)//7+1 = 9 × (98-14)//7+1 = 13 → n=117
T, C, H, W = 3, 16, 70, 98
HP, WP = 9, 13
N_FEAT = HP * WP
BB_CAP = 32
CFG = TrackerConfig(video_h=H, video_w=W, dino_patch_size=14, stride=7,
                    compute_dtype="float32")


@pytest.fixture(scope="module")
def ref_tracker_cls():
    """Import the reference dino_tracker module with GPU-only deps stubbed."""
    if "antialiased_cnns" not in sys.modules:
        stub = types.ModuleType("antialiased_cnns")

        class BlurPool(torch.nn.Module):  # noqa: unused in loss paths
            def __init__(self, *a, **k):
                super().__init__()

        stub.BlurPool = BlurPool
        sys.modules["antialiased_cnns"] = stub
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    import dino_tracker as ref_dt  # noqa: reference import
    from models import utils as ref_utils
    from models.tracker import Tracker as RefTracker

    # device rebinds (no logic edits): .cuda() → identity on the CPU build;
    # the feature-grid helper's device='cuda' default → 'cpu'
    torch.Tensor.cuda = lambda self, *a, **k: self
    ref_utils.get_vit_feature_coords_from_mask.__defaults__ = (7, 14, "cpu")
    return ref_dt, RefTracker


def _make_ref_model(RefTracker, video_t, emb_t):
    """Reference Tracker via __new__ — only the attrs the losses touch."""
    m = RefTracker.__new__(RefTracker)
    # nn.Module internals needed for attribute assignment on an nn.Module
    torch.nn.Module.__init__(m)
    m.video = video_t
    m.device = "cpu"
    m.dino_patch_size = 14
    m.stride = 7
    m.frame_embeddings = emb_t
    return m


def _make_ref_dino_tracker(ref_dt, config, fg_masks_t, bb_pairs=None):
    t = ref_dt.DINOTracker.__new__(ref_dt.DINOTracker)
    t.config = config
    t.fg_masks = fg_masks_t
    t.of_loss_fn = torch.nn.HuberLoss(delta=1 / 32, reduction="none")
    if bb_pairs is not None:
        t.dino_bb_pairs = bb_pairs
    return t


def _shared_inputs(seed=0):
    rng = np.random.default_rng(seed)
    video = rng.random((T, 3, H, W), np.float32)
    emb = rng.standard_normal((T, C, HP, WP)).astype(np.float32)
    fg = (rng.random((T, H, W)) > 0.5).astype(np.float32)
    return video, emb, fg


def _random_bb(seed=1):
    """Random padded BBData + the reference's ragged dict of the same pairs."""
    rng = np.random.default_rng(seed)
    sc = np.zeros((T, T, BB_CAP, 2), np.float32)
    tc = np.zeros((T, T, BB_CAP, 2), np.float32)
    cos = np.zeros((T, T, BB_CAP), np.float32)
    r = np.zeros((T, T, BB_CAP), np.float32)
    valid = np.zeros((T, T, BB_CAP), bool)
    ref_dict = {}
    for s in range(T):
        for t in range(T):
            if s == t:
                continue
            n = int(rng.integers(5, 21))
            scoords = (rng.random((n, 2)) * [W - 1, H - 1]).astype(np.float32)
            tcoords = (rng.random((n, 2)) * [W - 1, H - 1]).astype(np.float32)
            csims = (0.3 + 0.7 * rng.random(n)).astype(np.float32)
            amb = rng.random(n).astype(np.float32)
            sc[s, t, :n] = scoords
            tc[s, t, :n] = tcoords
            cos[s, t, :n] = csims
            r[s, t, :n] = amb
            valid[s, t, :n] = True
            ref_dict[f"{s}_{t}"] = {
                "source_coords": torch.from_numpy(scoords),
                "target_coords": torch.from_numpy(tcoords),
                "cos_sims": torch.from_numpy(csims),
                "r": torch.from_numpy(amb),
            }
    bb = BBData(source_coords=jnp.asarray(sc), target_coords=jnp.asarray(tc),
                cos_sims=jnp.asarray(cos), r=jnp.asarray(r),
                valid=jnp.asarray(valid))
    return bb, ref_dict


def test_dino_bb_contrastive_loss_matches_reference(ref_tracker_cls):
    """Reference dino_tracker.py:159-243 as the oracle: ambiguity sigmoid
    σ(a(1−r)+b), 2·cos³ weighting, /cl_div, direction averaging."""
    ref_dt, RefTracker = ref_tracker_cls
    video, emb, fg = _shared_inputs()
    bb, ref_dict = _random_bb()

    n_pairs = 4
    config = {"cl_n_frames": n_pairs, "cl_points_per_pair": 2 * BB_CAP,
              "cl_fg_points_ratio": 0.5, "cl_temp": 0.1,
              "cl_div_dino_bb": 700.0, "bb_amb_sig_a": 27.0,
              "bb_amb_sig_b": -5.7}

    model = _make_ref_model(RefTracker, torch.from_numpy(video),
                            torch.from_numpy(emb))
    tr = _make_ref_dino_tracker(ref_dt, config, torch.from_numpy(fg),
                                bb_pairs=ref_dict)
    frames_set = torch.arange(T)

    # replicate the seeded frame-pair draws (dino_tracker.py:160-164), then
    # re-seed and run the reference for real
    seed = 123
    torch.manual_seed(seed)
    src = torch.randint(T, (n_pairs,))
    tgt = torch.randint(T, (n_pairs,))
    while (src == tgt).any():
        tgt = torch.randint(T, (n_pairs,))
    torch.manual_seed(seed)
    ref_loss = float(tr.get_dino_bb_contrastive_loss(model, frames_set))

    got = float(our_cl.dino_bb_contrastive_loss(
        jax.random.PRNGKey(0), jnp.asarray(emb), jnp.arange(T), bb,
        jnp.asarray(fg), CFG, n_pairs=n_pairs,
        points_per_pair=2 * BB_CAP, fg_points_ratio=0.5, temp=0.1,
        cl_div=700.0, sig_a=27.0, sig_b=-5.7,
        pair_sel=(src.numpy(), tgt.numpy())))
    np.testing.assert_allclose(got, ref_loss, rtol=2e-4)


def test_refined_bb_contrastive_loss_matches_reference(ref_tracker_cls):
    """Reference dino_tracker.py:245-330 as the oracle: in-step mutual-NN
    mining on the (no-grad) affinity, fg/bg balancing, 2·aff³ weighting."""
    ref_dt, RefTracker = ref_tracker_cls
    video, emb, fg = _shared_inputs(seed=7)

    n_pairs = 4
    model = _make_ref_model(RefTracker, torch.from_numpy(video),
                            torch.from_numpy(emb))
    tr = _make_ref_dino_tracker(ref_dt, {"dino_patch_size": 14},
                                torch.from_numpy(fg))
    frames_set = torch.arange(T)

    seed = 321
    torch.manual_seed(seed)
    src = torch.randint(T, (n_pairs,))
    tgt = torch.randint(T, (n_pairs,))
    torch.manual_seed(seed)
    ref_loss = float(tr.get_refined_bb_contrastive_loss(
        model, frames_set, torch.from_numpy(emb), batch_size=n_pairs,
        points_per_pair=2 * N_FEAT, fg_points_ratio=0.5, temp=0.1,
        cl_div=900.0))

    got = float(our_cl.refined_bb_contrastive_loss(
        jax.random.PRNGKey(0), jnp.asarray(emb), jnp.arange(T),
        jnp.asarray(fg), CFG, n_pairs=n_pairs, points_per_pair=2 * N_FEAT,
        fg_points_ratio=0.5, temp=0.1, cl_div=900.0,
        pair_sel=(src.numpy(), tgt.numpy())))
    np.testing.assert_allclose(got, ref_loss, rtol=2e-4)


def test_cycle_consistency_loss_matches_reference(ref_tracker_cls):
    """Reference dino_tracker.py:346-353 as the oracle for the loss formula:
    γ^dist weighting × Huber(δ=1/32) on normalized coords, direction mean.
    The prediction path feeding it has its own goldens (tracker head /
    soft-argmax / RangeNormalizer); here get_cycle_consistent_preds is
    stubbed with fixed tensors so the formula alone is compared."""
    ref_dt, _ = ref_tracker_cls
    from data.dataset import RangeNormalizer as RefRangeNormalizer

    rng = np.random.default_rng(11)
    p = 40
    src_pix = (rng.random((p, 3)) * [W - 1, H - 1, T - 1]).astype(np.float32)
    tgt_pix = (rng.random((p, 3)) * [W - 1, H - 1, T - 1]).astype(np.float32)
    st_pred = (rng.random((p, 2)) * 2 - 1).astype(np.float32)
    ts_pred = (rng.random((p, 2)) * 2 - 1).astype(np.float32)
    dists = (rng.random(p) * 8).astype(np.float32)

    RefRangeNormalizer.__init__.__defaults__ = ("cpu",)
    ref_norm = RefRangeNormalizer(shapes=(float(W), float(H), float(T)))
    src_norm = ref_norm(torch.from_numpy(src_pix), dst=(-1, 1))
    tgt_norm = ref_norm(torch.from_numpy(tgt_pix), dst=(-1, 1))

    preds = {
        "source_coords": src_norm,
        "target_coords": tgt_norm,
        "source_target_coords": torch.from_numpy(st_pred),
        "target_source_coords": torch.from_numpy(ts_pred),
        "cycle_consistency_dists": torch.from_numpy(dists),
    }

    class _StubModel:
        def get_cycle_consistent_preds(self, frames_set_t, fg_masks):
            return preds

    tr = _make_ref_dino_tracker(ref_dt, {"cyc_gamma": 0.8},
                                torch.zeros(T, H, W))
    ref_loss = float(tr.get_cycle_consistency_loss(_StubModel(), [None]))

    data = our_cycle.CycleData(
        source_points=jnp.asarray(src_pix), target_points=jnp.asarray(tgt_pix),
        source_frame_indices=jnp.zeros(p, jnp.int32),
        target_frame_indices=jnp.zeros(p, jnp.int32),
        dists=jnp.asarray(dists), valid=jnp.ones(p, bool))
    both_preds = jnp.concatenate([jnp.asarray(st_pred), jnp.asarray(ts_pred)])
    got = float(our_cycle.cycle_loss_from_preds(both_preds, data, CFG,
                                                gamma=0.8))
    np.testing.assert_allclose(got, ref_loss, rtol=1e-5, atol=1e-7)

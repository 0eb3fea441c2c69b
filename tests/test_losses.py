"""Loss-math parity tests vs torch mirrors of the reference formulas."""

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

"""Best-buddy contrastive losses.

Two InfoNCE terms over the refined feature video (reference
dino_tracker.py:159-330):
  * ``dino_bb``: supervision pairs precomputed from raw DINO features,
    weighted by NMS-ambiguity σ(a(1−r)+b) and 2·cos³;
  * ``refined_bb``: buddies recomputed *on the refined features* every step
    (mutual-NN over an n×n cosine affinity — the in-step MXU heavy hitter),
    weighted by 2·aff³.

TPU redesign: ragged pair dicts → padded BBData gathers; per-pair python
loops → pair math vmapped over the (4-deep) pair axis — a lax.map here
serializes four small-matmul iterations and leaves the MXU idle between
them, while the vmapped batch keeps one big dispatch in flight (live
memory: n_pairs n×n affinity maps, ~1 GB at production shape — fine in
16 GB HBM); randperm subset selection → masked Gumbel top-k. Frame slabs
and per-position norms come from a shared ``tracker.FrameView`` so the
265 MB refined stack is cast/normed once per step for all loss terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import tracker
from ..models.tracker import TrackerConfig
from ..structures import BBData
from ..utils import coords as coord_utils
from . import losses

EPS = 1e-8


def _sample_embeddings_at(frame_embeddings, coords_xy, frame_set_idx,
                          cfg: TrackerConfig, channels_last: bool = False):
    """Trilinear-sample refined embeddings at pixel coords on frame-set index."""
    pts = jnp.concatenate([coords_xy,
                           frame_set_idx[:, None].astype(jnp.float32)], axis=1)
    pts = coord_utils.normalize_points_for_sampling(
        pts, cfg.video_h, cfg.video_w, cfg.dino_patch_size, cfg.stride)
    return tracker.sample_embeddings(frame_embeddings, pts, channels_last)


def dino_bb_contrastive_loss(key, frame_embeddings, frames_set_t, bb: BBData,
                             fg_masks_thw, cfg: TrackerConfig,
                             n_pairs: int, points_per_pair: int,
                             fg_points_ratio: float, temp: float,
                             cl_div: float, sig_a: float, sig_b: float,
                             view=None, pair_sel=None,
                             channels_last: bool = False):
    """Reference dino_tracker.py:159-243. Returns a scalar loss.

    ``pair_sel``: optional (src_sel, tgt_sel) int arrays overriding the
    random frame-pair draw — used by the reference-code golden oracle
    (tests/test_reference_loss_golden.py) to evaluate the deterministic
    loss math at the exact pairs the seeded reference run drew."""
    set_size = frames_set_t.shape[0]
    n_fg = int(points_per_pair * fg_points_ratio)
    n_bg = points_per_pair - n_fg
    if view is None:
        view = tracker.make_frame_view(frame_embeddings,
                                       jnp.dtype(cfg.compute_dtype),
                                       channels_last)

    k_src, k_tgt, k_sel = jax.random.split(key, 3)
    if pair_sel is not None:
        src_sel, tgt_sel = (jnp.asarray(pair_sel[0], jnp.int32),
                            jnp.asarray(pair_sel[1], jnp.int32))
    else:
        src_sel = jax.random.randint(k_src, (n_pairs,), 0, set_size)
        # target != source (the reference redraws until no collision)
        tgt_off = jax.random.randint(k_tgt, (n_pairs,), 1, set_size)
        tgt_sel = (src_sel + tgt_off) % set_size

    def pair_select(k, src_idx, tgt_idx):
        """Per-pair point selection + loss weights — no gradient paths."""
        sf = frames_set_t[src_idx]
        tf = frames_set_t[tgt_idx]
        src_xy = bb.source_coords[sf, tf]      # Nmax×2
        tgt_xy = bb.target_coords[sf, tf]
        cos = bb.cos_sims[sf, tf]
        r = bb.r[sf, tf]
        valid = bb.valid[sf, tf]

        fg_raw = losses.sample_fg_mask_at_points(fg_masks_thw[sf], src_xy,
                                                 cfg.video_w, cfg.video_h)
        kf, kb = jax.random.split(k)
        idx_fg, v_fg = losses.masked_gumbel_topk(kf, valid & fg_raw, n_fg)
        idx_bg, v_bg = losses.masked_gumbel_topk(kb, valid & ~fg_raw, n_bg)
        sel = jnp.concatenate([idx_fg, idx_bg])
        sel_valid = jnp.concatenate([v_fg, v_bg])

        ws = jax.nn.sigmoid(sig_a * (1.0 - r[sel]) + sig_b)
        cos_ws = jnp.clip(2.0 * cos[sel] ** 3, min=0.0)
        wmask = ws * cos_ws * sel_valid
        return src_xy[sel], tgt_xy[sel], wmask

    pair_keys = jax.random.split(k_sel, n_pairs)
    sxy, txy, wmask = jax.vmap(pair_select)(pair_keys, src_sel, tgt_sel)
    kk = sxy.shape[1]

    # ONE with-grad trilinear sampling for all pairs/sides: vmapping the
    # sampling per pair made its backward a per-pair full-plane scatter-add
    # into the 265 MB refined stack (trace: ~10 ms/iter at this line);
    # batching all P·k points turns that into one scatter
    src_f = _sample_embeddings_at(
        frame_embeddings, sxy.reshape(-1, 2),
        jnp.repeat(src_sel, kk), cfg,
        channels_last).reshape(n_pairs, kk, -1)
    tgt_f = _sample_embeddings_at(
        frame_embeddings, txy.reshape(-1, 2),
        jnp.repeat(tgt_sel, kk), cfg,
        channels_last).reshape(n_pairs, kk, -1)

    def pair_loss(src_f_k, tgt_f_k, src_idx, tgt_idx, wmask_k):
        cl1, cl2 = losses.bb_pairs_contrastive_loss_nc(
            src_f_k, tgt_f_k, view.flat_cd[src_idx], view.flat_cd[tgt_idx],
            view.norms[src_idx], view.norms[tgt_idx], temp)
        return jnp.sum((cl1 + cl2) * wmask_k)

    per_pair = jax.vmap(pair_loss)(src_f, tgt_f, src_sel, tgt_sel, wmask)
    # reference: (Σcl1·w + Σcl2·w)/cl_div averaged over the two directions
    return jnp.sum(per_pair) / cl_div / 2.0


def refined_bb_contrastive_loss(key, frame_embeddings, frames_set_t,
                                fg_masks_thw, cfg: TrackerConfig,
                                n_pairs: int, points_per_pair: int,
                                fg_points_ratio: float, temp: float,
                                cl_div: float, view=None, pair_sel=None,
                                channels_last: bool = False):
    """Reference dino_tracker.py:245-330. Buddies mined on-the-fly from the
    refined features (affinity under stop_gradient, like torch.no_grad).

    ``pair_sel``: optional (src_sel, tgt_sel) frame-draw override for the
    reference-code golden oracle (see dino_bb_contrastive_loss)."""
    set_size = frames_set_t.shape[0]
    if channels_last:
        s, hp, wp, c = frame_embeddings.shape
    else:
        s, c, hp, wp = frame_embeddings.shape
    n = hp * wp
    n_fg = int(points_per_pair * fg_points_ratio)
    n_bg = points_per_pair - n_fg
    if view is None:
        view = tracker.make_frame_view(frame_embeddings,
                                       jnp.dtype(cfg.compute_dtype),
                                       channels_last)

    feat_grid = coord_utils.vit_feature_coords(cfg.video_h, cfg.video_w,
                                               cfg.stride, cfg.dino_patch_size)

    k_src, k_tgt, k_sel = jax.random.split(key, 3)
    if pair_sel is not None:
        src_sel, tgt_sel = (jnp.asarray(pair_sel[0], jnp.int32),
                            jnp.asarray(pair_sel[1], jnp.int32))
    else:
        # reference randint for both — pairs may collide (kept intentionally)
        src_sel = jax.random.randint(k_src, (n_pairs,), 0, set_size)
        tgt_sel = jax.random.randint(k_tgt, (n_pairs,), 0, set_size)

    flat_sg = jax.lax.stop_gradient(view.flat_cd)
    norms_sg = jax.lax.stop_gradient(view.norms)
    # pre-normalize the n×c slabs (16 MB/frame) so the einsum output IS the
    # cosine affinity — normalizing the n×n f32 map afterwards re-read and
    # re-wrote ~263 MB per pair (the measured cl_ref dominator). Row/column
    # scaling by positive norms preserves both argmaxes, so the mutual-NN
    # set is unchanged; the reference's exact EPS-clamped weight values are
    # recomputed below from the selected columns only.
    unit_sg = flat_sg / jnp.clip(norms_sg[:, :, None], min=EPS).astype(
        flat_sg.dtype)

    def pair_mine(k, src_idx, tgt_idx):
        """Per-pair buddy mining + subset selection — no gradient paths
        (the affinity runs on the stop-gradient unit slabs)."""
        # n×n cosine affinity on the (no-grad) unit compute-dtype slabs
        aff = jnp.einsum("nc,mc->nm", unit_sg[src_idx], unit_sg[tgt_idx],
                         preferred_element_type=jnp.float32)
        src_is_bb, tgt_of_src = losses.mutual_nn(aff)

        sf = frames_set_t[src_idx]
        fg_raw = losses.sample_fg_mask_at_points(fg_masks_thw[sf], feat_grid,
                                                 cfg.video_w, cfg.video_h)
        kf, kb = jax.random.split(k)
        idx_fg, v_fg = losses.masked_gumbel_topk(kf, src_is_bb & fg_raw, n_fg)
        idx_bg, v_bg = losses.masked_gumbel_topk(kb, src_is_bb & ~fg_raw, n_bg)
        sel_src = jnp.concatenate([idx_fg, idx_bg])
        sel_valid = jnp.concatenate([v_fg, v_bg])
        sel_tgt = tgt_of_src[sel_src]
        return sel_src, sel_tgt, sel_valid

    pair_keys = jax.random.split(k_sel, n_pairs)
    sel_src, sel_tgt, sel_valid = jax.vmap(pair_mine)(pair_keys, src_sel,
                                                      tgt_sel)  # each P×k

    # ONE with-grad gather for all pairs/sides. The previous per-pair
    # `flat[src_idx][:, sel_src].T` made the backward materialize a full
    # f32 c×n gradient plane per pair and dynamic-update-slice it into the
    # 265 MB (s,c,n) stack — 18.3 ms/iter, the single largest non-conv
    # line in the r4 device trace. Gathering all P·k rows from one
    # (s·n, c) view costs one sparse row scatter-add in the backward —
    # and with channels_last the (s·n, c) view is a FREE reshape (the r5
    # trace still charged 3.4 ms/iter for the channels-first moveaxis).
    if channels_last:
        flat_snc = frame_embeddings.reshape(s * n, c)
    else:
        flat_snc = jnp.moveaxis(frame_embeddings.reshape(s, c, n), 1,
                                2).reshape(s * n, c)
    kk = sel_src.shape[1]
    src_f = jnp.take(flat_snc, (src_sel[:, None] * n + sel_src).reshape(-1),
                     axis=0).reshape(n_pairs, kk, c)
    tgt_f = jnp.take(flat_snc, (tgt_sel[:, None] * n + sel_tgt).reshape(-1),
                     axis=0).reshape(n_pairs, kk, c)

    def pair_loss(src_f_k, tgt_f_k, src_idx, tgt_idx, sel_src_k, sel_tgt_k,
                  sel_valid_k):
        cl1, cl2 = losses.bb_pairs_contrastive_loss_nc(
            src_f_k, tgt_f_k, view.flat_cd[src_idx], view.flat_cd[tgt_idx],
            view.norms[src_idx], view.norms[tgt_idx], temp)
        # selected-pair cosines with the reference's exact EPS-clamped
        # formula, recomputed in f32 from the raw columns (k×c dots — the
        # full bf16 affinity is only ever used for the argmax set)
        sel_cos = jnp.einsum("kc,kc->k",
                             jax.lax.stop_gradient(src_f_k),
                             jax.lax.stop_gradient(tgt_f_k),
                             preferred_element_type=jnp.float32)
        sel_cos = sel_cos / jnp.clip(
            norms_sg[src_idx][sel_src_k] * norms_sg[tgt_idx][sel_tgt_k],
            min=EPS)
        w_cos = jnp.clip(2.0 * sel_cos ** 3, min=0.0)
        return jnp.sum((cl1 + cl2) * w_cos * sel_valid_k)

    per_pair = jax.vmap(pair_loss)(src_f, tgt_f, src_sel, tgt_sel,
                                   sel_src, sel_tgt, sel_valid)
    return jnp.sum(per_pair) / (2.0 * cl_div)

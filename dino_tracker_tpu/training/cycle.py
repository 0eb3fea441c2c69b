"""Cycle-consistency supervision (reference models/tracker.py:182-301,
dino_tracker.py:346-353).

For random frame pairs, random fg/bg-balanced pixel points are tracked
source→target→source with the current model (no-grad); points that return
within ``cyc_thresh`` px are kept and both directions are re-predicted with
gradients, weighted by γ^dist.

TPU redesign: the reference's per-pair python loop + retry-until-nonempty
while-loop become one batched forward over all pairs' points with a validity
mask (an empty mask yields a zero loss instead of a resample — same gradient
in expectation, no data-dependent shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import tracker
from ..models.tracker import TrackerConfig, TrackerInput
from . import losses


class CycleData(NamedTuple):
    source_points: jnp.ndarray   # P×3 pixel (x, y, t_abs)
    target_points: jnp.ndarray   # P×3 pixel (pred x, y, t_abs) — constants
    source_frame_indices: jnp.ndarray  # P (into frames_set_t)
    target_frame_indices: jnp.ndarray
    dists: jnp.ndarray           # P cycle distances (px)
    valid: jnp.ndarray           # P bool


def generate_cycle_data(key, params, frame_embeddings, frames_set_t,
                        fg_masks_thw, cfg: TrackerConfig,
                        n_pairs: int, points_per_pair: int,
                        fg_ratio: float, thresh: float,
                        view=None, mesh=None,
                        channels_last: bool = False) -> CycleData:
    """No-grad sampling + cycle filtering. All outputs are stop-gradiented."""
    set_size = frames_set_t.shape[0]
    h, w = fg_masks_thw.shape[-2:]
    n_fg = int(points_per_pair * fg_ratio)
    n_bg = points_per_pair - n_fg

    k_src, k_tgt, k_pts = jax.random.split(key, 3)
    # reference uses randint over the frame set for both (can collide)
    src_sel = jax.random.randint(k_src, (n_pairs,), 0, set_size)
    tgt_sel = jax.random.randint(k_tgt, (n_pairs,), 0, set_size)

    def sample_pair_points(k, src_idx):
        src_t = frames_set_t[src_idx]
        fg = (fg_masks_thw[src_t] > 0).reshape(-1)
        kf, kb = jax.random.split(k)
        idx_fg, v_fg = losses.masked_gumbel_topk(kf, fg, n_fg)
        idx_bg, v_bg = losses.masked_gumbel_topk(kb, ~fg, n_bg)
        idx = jnp.concatenate([idx_fg, idx_bg])
        valid = jnp.concatenate([v_fg, v_bg])
        x = (idx % w).astype(jnp.float32)
        y = (idx // w).astype(jnp.float32)
        return jnp.stack([x, y], axis=-1), valid

    pair_keys = jax.random.split(k_pts, n_pairs)
    coords, valid = jax.vmap(sample_pair_points)(pair_keys, src_sel)  # n_pairs×P×2

    p = n_pairs * points_per_pair
    src_t = frames_set_t[src_sel].astype(jnp.float32)  # n_pairs
    tgt_t = frames_set_t[tgt_sel].astype(jnp.float32)

    source_points_g = jnp.concatenate(
        [coords, jnp.broadcast_to(src_t[:, None, None],
                                  (n_pairs, points_per_pair, 1))], axis=2)

    emb = jax.lax.stop_gradient(frame_embeddings)
    if view is None:
        view = tracker.make_frame_view(emb, jnp.dtype(cfg.compute_dtype),
                                       channels_last)
    else:
        view = jax.tree.map(jax.lax.stop_gradient, view)

    def predict(points_g, s_idx_g, t_idx_g):
        # blocked predictions: one target frame per pair block, so the
        # correlation contracts against just that frame (N-fold FLOP cut
        # vs the flat all-frames+select path)
        out = tracker.get_point_predictions_grouped(
            params, points_g, s_idx_g, t_idx_g, emb, cfg, view=view,
            mesh=mesh, channels_last=channels_last)
        # (-1,1) -> pixel
        scale = jnp.asarray([cfg.video_w - 1, cfg.video_h - 1], jnp.float32)
        return (out + 1.0) * 0.5 * scale

    fwd = predict(source_points_g, src_sel, tgt_sel)  # n_pairs×P×2 pixel
    target_points_g = jnp.concatenate(
        [fwd, jnp.broadcast_to(tgt_t[:, None, None],
                               (n_pairs, points_per_pair, 1))], axis=2)
    bwd = predict(target_points_g, tgt_sel, src_sel)

    dists = jnp.linalg.norm(coords - bwd, axis=2).reshape(p)
    valid = valid.reshape(p) & (dists <= thresh)
    source_points = source_points_g.reshape(p, 3)
    target_points = target_points_g.reshape(p, 3)
    src_idx = jnp.repeat(src_sel, points_per_pair)
    tgt_idx = jnp.repeat(tgt_sel, points_per_pair)
    return CycleData(*map(jax.lax.stop_gradient,
                          (source_points, target_points, src_idx, tgt_idx,
                           dists, valid)))


def cycle_inputs(data: CycleData, frames_set_t) -> TrackerInput:
    """Both re-prediction directions as ONE flat batch — every op in the
    prediction path (sampling, corr einsum, head) is per-point, so the
    concatenation is math-identical while halving the kernel count. The
    production train step uses the grouped per-pair path instead
    (cycle_consistency_loss with group_size>0, contracting against one
    target frame per pair); this flat form remains the group_size=0
    fallback and the equality oracle for it."""
    return TrackerInput(
        jnp.concatenate([data.source_points, data.target_points]),
        jnp.concatenate([data.source_frame_indices,
                         data.target_frame_indices]),
        jnp.concatenate([data.target_frame_indices,
                         data.source_frame_indices]),
        frames_set_t)


def cycle_loss_from_preds(both_preds, data: CycleData, cfg: TrackerConfig,
                          gamma: float, huber_delta: float = 1.0 / 32.0):
    """Loss formula over the merged st+ts predictions of ``cycle_inputs``."""
    p = data.source_points.shape[0]
    st, ts = both_preds[:p], both_preds[p:]

    scale = jnp.asarray([cfg.video_w - 1, cfg.video_h - 1], jnp.float32)
    tgt_norm = 2.0 * data.target_points[:, :2] / scale - 1.0
    src_norm = 2.0 * data.source_points[:, :2] / scale - 1.0

    weight = (gamma ** data.dists) * data.valid  # P
    n = jnp.maximum(jnp.sum(data.valid), 1)
    loss_st = jnp.sum(weight[:, None] * losses.huber(st, tgt_norm, huber_delta)) / (2 * n)
    loss_ts = jnp.sum(weight[:, None] * losses.huber(ts, src_norm, huber_delta)) / (2 * n)
    loss = (loss_st + loss_ts) / 2.0
    return jnp.where(jnp.sum(data.valid) > 0, loss, 0.0)


def cycle_consistency_loss(params, frame_embeddings, frames_set_t,
                           data: CycleData, cfg: TrackerConfig,
                           gamma: float, huber_delta: float = 1.0 / 32.0,
                           view=None, group_size: int = 0, mesh=None,
                           channels_last: bool = False):
    """Graded re-prediction of both directions, γ^dist-weighted Huber to the
    (constant) cycle-filtered endpoints (reference dino_tracker.py:346-353).

    ``group_size`` > 0 asserts the CycleData rows come in contiguous
    fixed-size per-pair blocks (as generate_cycle_data emits them) and uses
    the blocked prediction path — the per-block single-target correlation,
    an N-fold FLOP cut over the flat path for the same math."""
    if group_size:
        p = data.source_points.shape[0]
        g = p // group_size
        sp = data.source_points.reshape(g, group_size, 3)
        tp = data.target_points.reshape(g, group_size, 3)
        src_g = data.source_frame_indices.reshape(g, group_size)[:, 0]
        tgt_g = data.target_frame_indices.reshape(g, group_size)[:, 0]
        both = tracker.get_point_predictions_grouped(
            params, jnp.concatenate([sp, tp], axis=0),
            jnp.concatenate([src_g, tgt_g]),
            jnp.concatenate([tgt_g, src_g]),
            frame_embeddings, cfg, view=view, mesh=mesh,
            channels_last=channels_last).reshape(2 * p, 2)
    else:
        both = tracker.get_point_predictions(
            params, cycle_inputs(data, frames_set_t), frame_embeddings, cfg,
            view=view, channels_last=channels_last)
    return cycle_loss_from_preds(both, data, cfg, gamma, huber_delta)

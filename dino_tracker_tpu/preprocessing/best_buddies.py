"""DINO best-buddy mining: mutual-NN sweep, optical-flow filter, NMS
ambiguity.

Behavior spec: preprocessing_dino_bb/ in the reference —
  1. ``extract_dino_best_buddies.py``: for every ordered frame pair, cosine
     affinity between all patch features and mutual-argmax pairs;
  2. ``of_filter_dino_best_buddies.py``: keep only pairs whose nearest
     trajectories are *invalid* at the other frame (BB supervision exactly
     where flow failed);
  3. ``compute_dino_bb_nms.py``: per-buddy similarity heatmap → top-400 →
     box NMS → ambiguity r = 2nd/1st peak, symmetrized across directions.

TPU redesign: the T² ordered-pair loop becomes a sweep over unordered pairs
(affinity(t,s) = affinity(s,t)ᵀ — one 8107×8107 MXU matmul serves both
directions, and the reverse direction's buddy list is the mirror of the
forward one, which also makes the r-symmetrization index-aligned instead of
the reference's coordinate-matching loop). Ragged per-pair buddy lists
become BBData padded to a fixed capacity (strongest-cosine buddies kept when
over capacity). The nearest-trajectory grids are chunked running-argmin
reductions instead of a per-point python loop.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import nms_top2_peaks
from ..structures import BBData
from ..utils.coords import bb_meshgrid


@functools.partial(jax.jit, static_argnames=("cap", "use_of_filter"))
def _mutual_nn_pair(source_flat_nc, target_flat_mc, grid_n2, cap: int,
                    use_of_filter: bool = False, closest_s=None,
                    closest_t=None, traj_invalid=None, s_frame=None,
                    t_frame=None):
    """One unordered pair: mutual-NN matches padded to ``cap``.

    Returns (src_idx, tgt_idx, cos, valid) for the s→t direction; the t→s
    direction is its mirror. With ``use_of_filter`` the optical-flow-gap
    filter (keep only buddies whose nearest trajectories are invalid at the
    other frame — reference of_filter_dino_best_buddies.py:97) is applied
    BEFORE the capacity cap, so capping never discards pairs the filter
    would have kept. The filter condition is symmetric, so it is also valid
    for the mirrored direction.
    """
    sn = source_flat_nc / jnp.clip(
        jnp.linalg.norm(source_flat_nc, axis=1, keepdims=True), min=1e-8)
    tn = target_flat_mc / jnp.clip(
        jnp.linalg.norm(target_flat_mc, axis=1, keepdims=True), min=1e-8)
    aff = jnp.dot(sn, tn.T, preferred_element_type=jnp.float32)  # n×m
    src_max = jnp.argmax(aff, axis=1)
    tgt_max = jnp.argmax(aff, axis=0)
    n = aff.shape[0]
    rng = jnp.arange(n)
    is_bb = rng == tgt_max[src_max]
    cos = aff[rng, src_max]
    if use_of_filter:
        # token index == grid index: nearest trajectory of the source token
        # at frame s must be invalid at frame t, and vice versa
        src_traj = closest_s[rng]
        tgt_traj = closest_t[src_max]
        keep = traj_invalid[src_traj, t_frame] & traj_invalid[tgt_traj, s_frame]
        is_bb = is_bb & keep
    # keep the strongest-cosine buddies when count exceeds capacity
    score = jnp.where(is_bb, cos, -jnp.inf)
    top_vals, top_idx = jax.lax.top_k(score, cap)
    valid = jnp.isfinite(top_vals)
    return (top_idx.astype(jnp.int32),
            src_max[top_idx].astype(jnp.int32),
            jnp.where(valid, top_vals, 0.0),
            valid)


def extract_best_buddies(features_tchw, h: int, w: int, stride: int = 7,
                         patch_size: int = 14, cap: int = 1024,
                         compute_dtype=jnp.float32,
                         progress: bool = False,
                         unfiltered_trajectories: Optional[np.ndarray] = None
                         ) -> BBData:
    """Mutual-NN sweep over all frame pairs -> BBData (reference
    extract_dino_best_buddies.py:13-54).

    With ``unfiltered_trajectories`` the optical-flow-gap filter runs fused
    inside the sweep, before the capacity cap.
    """
    t, c = features_tchw.shape[:2]
    grid = bb_meshgrid(h, w, stride, patch_size)  # n×2
    flat = jnp.asarray(features_tchw).reshape(t, c, -1).transpose(0, 2, 1)
    flat = flat.astype(compute_dtype)
    n = flat.shape[1]

    use_filter = unfiltered_trajectories is not None
    closest = invalid = None
    if use_filter:
        closest = jnp.asarray(closest_trajectory_grids(
            unfiltered_trajectories, grid))  # T×n
        invalid = jnp.asarray(np.isnan(unfiltered_trajectories).any(axis=-1))

    src_c = np.zeros((t, t, cap, 2), np.float32)
    tgt_c = np.zeros((t, t, cap, 2), np.float32)
    cos = np.zeros((t, t, cap), np.float32)
    valid = np.zeros((t, t, cap), bool)
    grid_np = np.asarray(grid)

    pairs = [(s, u) for s in range(t) for u in range(s + 1, t)]
    if progress:
        from tqdm import tqdm
        pairs = tqdm(pairs, desc="best buddies")
    for s, u in pairs:
        if use_filter:
            si, ti, cs, va = _mutual_nn_pair(
                flat[s], flat[u], grid, cap, use_of_filter=True,
                closest_s=closest[s], closest_t=closest[u],
                traj_invalid=invalid, s_frame=jnp.asarray(s),
                t_frame=jnp.asarray(u))
        else:
            si, ti, cs, va = _mutual_nn_pair(flat[s], flat[u], grid, cap)
        si, ti, cs, va = map(np.asarray, (si, ti, cs, va))
        src_c[s, u] = grid_np[si]
        tgt_c[s, u] = grid_np[ti]
        cos[s, u] = cs
        valid[s, u] = va
        # mirror for the reverse direction (mutual pairs are symmetric)
        src_c[u, s] = grid_np[ti]
        tgt_c[u, s] = grid_np[si]
        cos[u, s] = cs
        valid[u, s] = va

    return BBData(jnp.asarray(src_c), jnp.asarray(tgt_c), jnp.asarray(cos),
                  jnp.ones((t, t, cap), jnp.float32), jnp.asarray(valid))


# ---------------------------------------------------------------------------
# optical-flow filter
# ---------------------------------------------------------------------------

def closest_trajectory_grids(trajectories_nt2: np.ndarray, grid_n2,
                             chunk: int = 8192) -> np.ndarray:
    """For each frame f and grid point g: index of the nearest trajectory at
    frame f (NaN-coordinates treated as infinitely far). Returns T×n int32.
    Reference of_filter_dino_best_buddies.py:9-29, vectorized as a running
    argmin over trajectory chunks."""
    n_traj, t = trajectories_nt2.shape[:2]
    grid = jnp.asarray(grid_n2)

    @jax.jit
    def frame_argmin(traj_at_f):  # N×2 with NaN
        coords = jnp.nan_to_num(traj_at_f, nan=1e12)

        def chunk_step(carry, chunk_coords):
            best_d, best_i, offset = carry
            d = jnp.linalg.norm(grid[:, None, :] - chunk_coords[None], axis=-1)
            ci = jnp.argmin(d, axis=1)
            cd = jnp.min(d, axis=1)
            take = cd < best_d
            best_i = jnp.where(take, ci + offset, best_i)
            best_d = jnp.minimum(cd, best_d)
            return (best_d, best_i, offset + chunk_coords.shape[0]), None

        pad = (-n_traj) % chunk
        coords_p = jnp.concatenate(
            [coords, jnp.full((pad, 2), 1e12, coords.dtype)])
        chunks = coords_p.reshape(-1, chunk, 2)
        (d, i, _), _ = jax.lax.scan(
            chunk_step,
            (jnp.full((grid.shape[0],), jnp.inf), jnp.zeros(grid.shape[0], jnp.int32),
             jnp.asarray(0, jnp.int32)),
            chunks)
        return i

    out = np.zeros((t, grid.shape[0]), np.int32)
    for f in range(t):
        out[f] = np.asarray(frame_argmin(jnp.asarray(trajectories_nt2[:, f])))
    return out


def of_filter_best_buddies(bb: BBData, trajectories_nt2: np.ndarray,
                           h: int, w: int, stride: int = 7) -> BBData:
    """Keep buddies only where flow supervision is absent: the nearest
    trajectory to the source point must be invalid at the target frame and
    vice versa (reference of_filter_dino_best_buddies.py:37-112)."""
    t = bb.num_frames
    grid = bb_meshgrid(h, w, stride)
    closest = closest_trajectory_grids(trajectories_nt2, grid)  # T×n
    grid_np = np.asarray(grid)
    gh = len(np.unique(grid_np[:, 1]))
    gw = len(np.unique(grid_np[:, 0]))
    closest_grids = closest.reshape(t, gh, gw)
    invalid = np.isnan(trajectories_nt2).any(axis=-1)  # N×T

    src = np.asarray(bb.source_coords)
    tgt = np.asarray(bb.target_coords)
    valid = np.asarray(bb.valid).copy()
    for s in range(t):
        for u in range(t):
            if s == u:
                continue
            # pixel coords -> feature-grid indices ((x - 7) // stride)
            sidx = ((src[s, u] - 7) // stride).astype(np.int64)
            tidx = ((tgt[s, u] - 7) // stride).astype(np.int64)
            sidx = np.clip(sidx, 0, [gw - 1, gh - 1])
            tidx = np.clip(tidx, 0, [gw - 1, gh - 1])
            s_traj = closest_grids[s, sidx[:, 1], sidx[:, 0]]
            t_traj = closest_grids[u, tidx[:, 1], tidx[:, 0]]
            keep = invalid[s_traj, u] & invalid[t_traj, s]
            valid[s, u] &= keep
    return bb._replace(valid=jnp.asarray(valid))


# ---------------------------------------------------------------------------
# NMS ambiguity
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("topk", "box_size", "iou_thresh"))
def _pair_ambiguity(source_feats_cap_c, target_flat_nc, grid_n2,
                    topk: int, box_size: float, iou_thresh: float):
    """r for each (padded) buddy of one ordered pair."""
    sn = source_feats_cap_c / jnp.clip(
        jnp.linalg.norm(source_feats_cap_c, axis=1, keepdims=True), min=1e-8)
    tn = target_flat_nc / jnp.clip(
        jnp.linalg.norm(target_flat_nc, axis=1, keepdims=True), min=1e-8)
    sim = jnp.dot(sn, tn.T, preferred_element_type=jnp.float32)  # cap×n
    peaks, r = nms_top2_peaks(sim, grid_n2, topk=topk, box_size=box_size,
                              iou_thresh=iou_thresh)
    return peaks, r


def compute_bb_ambiguity(bb: BBData, features_tchw, h: int, w: int,
                         stride: int = 7, box_size: float = 30.0,
                         iou_thresh: float = 0.2, topk: int = 400,
                         progress: bool = False) -> BBData:
    """Ambiguity r per buddy, symmetrized max(r_fwd, r_bwd) across the two
    directions of each unordered pair (reference compute_dino_bb_nms.py).
    Because the reverse buddy list is the forward list mirrored, the
    symmetrization is a plain elementwise max."""
    t, c = features_tchw.shape[:2]
    cap = bb.capacity
    grid = bb_meshgrid(h, w, stride)
    flat = jnp.asarray(features_tchw).reshape(t, c, -1)  # t×c×n
    src = np.asarray(bb.source_coords)

    def feats_at(frame, coords_cap2):
        fx = ((coords_cap2[:, 0] - 7) // stride).astype(np.int64)
        fy = ((coords_cap2[:, 1] - 7) // stride).astype(np.int64)
        gw = 1 + (w - 14) // stride
        idx = fy * gw + fx
        return flat[frame][:, np.clip(idx, 0, flat.shape[2] - 1)].T  # cap×c

    r_out = np.ones((t, t, cap), np.float32)
    pairs = [(s, u) for s in range(t) for u in range(s + 1, t)]
    if progress:
        from tqdm import tqdm
        pairs = tqdm(pairs, desc="bb ambiguity")
    for s, u in pairs:
        _, r_fwd = _pair_ambiguity(feats_at(s, src[s, u]), flat[u].T, grid,
                                   topk, box_size, iou_thresh)
        _, r_bwd = _pair_ambiguity(feats_at(u, src[u, s]), flat[s].T, grid,
                                   topk, box_size, iou_thresh)
        r = np.maximum(np.asarray(r_fwd), np.asarray(r_bwd))
        r_out[s, u] = r
        r_out[u, s] = r
    return bb._replace(r=jnp.asarray(r_out))

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
the reference's coordinate-matching loop). Pairs batch on a leading axis
(vmap over one jitted program) and shard across chips when a mesh is given;
the batch size is HBM-budgeted against the P×n×n affinity working set.
Ragged per-pair buddy lists become BBData padded to a shared capacity —
adaptive by default (the sweep runs uncapped, then trims to the largest
observed per-pair count, so nothing is ever dropped; an explicit int cap
keeps the strongest-cosine buddies instead). The nearest-trajectory
grids are chunked running-argmin reductions instead of a per-point python
loop.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

from ..ops.nms import nms_top2_peaks
from ..ops.select import compact_mask, topk_mask
from ..parallel.mesh import constrain_batch, pad_to_multiple
from ..structures import BBData
from ..utils.coords import bb_meshgrid


def _mutual_nn_core(source_flat_nc, target_flat_mc, cap: int,
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
    # keep the strongest-cosine buddies when count exceeds capacity (small
    # frames can have fewer tokens than the capacity — pad instead).
    # lax.top_k at this shape (k=1024 of n=8107) was 15.5 of the core's
    # 18.7 ms (scripts/perf_bb_probe.py) — the radix-select membership mask
    # + one-hot compaction computes the same set with vector ops only; the
    # surviving buddies come out in token-index order instead of descending
    # cosine (downstream treats them as a set).
    if min(cap, n) >= n:
        # uncapped (adaptive mode): mutual-NN count is <= n by construction,
        # so no selection is needed — skip the radix select entirely
        mask = is_bb
    else:
        score = jnp.where(is_bb, cos, -jnp.inf)
        mask = topk_mask(score, min(cap, n)) & is_bb
    top_idx, top_vals, valid = compact_mask(mask, cos, cap, fill_value=0.0)
    # true (pre-cap) mutual-NN count: the reference keeps ALL pairs as
    # ragged lists (extract_dino_best_buddies.py:26-44) — report how many
    # the fixed capacity would drop so the cap is never silent
    count = jnp.sum(is_bb).astype(jnp.int32)
    return (top_idx,
            src_max[top_idx].astype(jnp.int32),
            top_vals,
            valid,
            count)


# budget for the P×n×n f32 affinity working set of one batched sweep call
_AFFINITY_BUDGET_BYTES = 2 << 30


def extract_best_buddies(features_tchw, h: int, w: int, stride: int = 7,
                         patch_size: int = 14, cap: Optional[int] = None,
                         compute_dtype=jnp.float32,
                         progress: bool = False,
                         unfiltered_trajectories: Optional[np.ndarray] = None,
                         pair_batch: int = 8, mesh=None,
                         telemetry: Optional[dict] = None) -> BBData:
    """Mutual-NN sweep over all frame pairs -> BBData (reference
    extract_dino_best_buddies.py:13-54).

    With ``unfiltered_trajectories`` the optical-flow-gap filter runs fused
    inside the sweep, before the capacity cap. ``pair_batch`` unordered
    pairs run per dispatch (vmapped, HBM-budgeted); with ``mesh`` the pair
    axis shards across chips.

    ``telemetry`` (optional dict, filled in-place) receives capacity-cap
    truncation stats: the reference keeps every mutual-NN pair as a ragged
    list, so any pair whose true (post-filter) count exceeds ``cap`` is
    recorded — truncated_pairs / total_pairs / max_count / truncated_frac —
    and logged, so the fixed-shape cap is never silent.
    """
    t, c = features_tchw.shape[:2]
    grid = bb_meshgrid(h, w, stride, patch_size)  # n×2
    flat = jnp.asarray(features_tchw).reshape(t, c, -1).transpose(0, 2, 1)
    flat = flat.astype(compute_dtype)
    n = flat.shape[1]
    # cap=None (default): adaptive — sweep uncapped at capacity n (mutual-NN
    # count can never exceed n, so nothing is EVER truncated, matching the
    # reference's ragged keep-all lists), then trim the padded axis to the
    # largest observed per-pair count before returning. A fixed int cap
    # remains available as an explicit memory knob.
    adaptive = cap is None
    if adaptive:
        cap = n

    use_filter = unfiltered_trajectories is not None
    closest = invalid = None
    if use_filter:
        closest = jnp.asarray(closest_trajectory_grids(
            unfiltered_trajectories, grid))  # T×n
        invalid = jnp.asarray(np.isnan(unfiltered_trajectories).any(axis=-1))

    n_dev = mesh.devices.size if mesh is not None else 1
    # working set per pair: the n×n affinity plus the cap×n compaction
    # one-hot (both f32)
    bsz = min(pair_batch,
              max(1, _AFFINITY_BUDGET_BYTES // (n * n * 4 + cap * n * 4)))
    bsz = max(bsz, n_dev)
    bsz -= bsz % n_dev

    @jax.jit
    def run_batch(flat, closest, invalid, s_idx, u_idx):
        fs = constrain_batch(jnp.take(flat, s_idx, axis=0), mesh)
        fu = constrain_batch(jnp.take(flat, u_idx, axis=0), mesh)
        if use_filter:
            cs = constrain_batch(jnp.take(closest, s_idx, axis=0), mesh)
            cu = constrain_batch(jnp.take(closest, u_idx, axis=0), mesh)
            out = jax.vmap(
                lambda a, b, c1, c2, sf, uf: _mutual_nn_core(
                    a, b, cap, True, c1, c2, invalid, sf, uf)
            )(fs, fu, cs, cu, s_idx, u_idx)
        else:
            out = jax.vmap(lambda a, b: _mutual_nn_core(a, b, cap))(fs, fu)
        return jax.tree.map(lambda x: constrain_batch(x, mesh), out)

    def dispatch(s_idx, u_idx):
        args = (flat, closest, invalid, jnp.asarray(s_idx), jnp.asarray(u_idx))
        if mesh is not None:
            with mesh:
                return run_batch(*args)
        return run_batch(*args)

    src_c = np.zeros((t, t, cap, 2), np.float32)
    tgt_c = np.zeros((t, t, cap, 2), np.float32)
    cos = np.zeros((t, t, cap), np.float32)
    valid = np.zeros((t, t, cap), bool)
    counts = []  # true pre-cap mutual-NN count per unordered pair
    grid_np = np.asarray(grid)

    pairs = np.asarray([(s, u) for s in range(t) for u in range(s + 1, t)],
                       np.int32).reshape(-1, 2)
    # enqueue every batch before fetching any result: dispatch is async, so
    # queued programs pipeline through the device while earlier fetches
    # drain. The previous dispatch→fetch→dispatch loop serialized one relay
    # round trip per batch (~0.4 s × ~300 batches at the adaptive cap — the
    # dominant cost of the sweep, not the compute). Per-batch outputs are
    # ~0.5 MB so holding them all is cheap.
    inflight = []
    for b0 in range(0, len(pairs), bsz):
        chunk = pairs[b0:b0 + bsz]
        padded = pad_to_multiple(chunk, bsz)
        inflight.append((chunk, dispatch(padded[:, 0], padded[:, 1])))
    if progress:
        from tqdm import tqdm
        inflight = tqdm(inflight, desc="best buddies")
    for chunk, out in inflight:
        si_b, ti_b, cs_b, va_b, ct_b = map(np.asarray, out)
        for j, (s, u) in enumerate(chunk):
            si, ti, cs, va = si_b[j], ti_b[j], cs_b[j], va_b[j]
            src_c[s, u] = grid_np[si]
            tgt_c[s, u] = grid_np[ti]
            cos[s, u] = cs
            valid[s, u] = va
            # mirror for the reverse direction (mutual pairs are symmetric)
            src_c[u, s] = grid_np[ti]
            tgt_c[u, s] = grid_np[si]
            cos[u, s] = cs
            valid[u, s] = va
            counts.append(int(ct_b[j]))

    counts = np.asarray(counts, np.int64)
    if adaptive:
        # nothing was truncated (capacity == n). Trim the padded buddy axis
        # to the largest observed count (slots are packed in index order by
        # compact_mask, so a prefix slice keeps every valid entry), rounded
        # up to a lane-friendly multiple of 128.
        maxc = int(counts.max()) if counts.size else 0
        cap = min(n, max(128, -(-maxc // 128) * 128))
        src_c = src_c[:, :, :cap]
        tgt_c = tgt_c[:, :, :cap]
        cos = cos[:, :, :cap]
        valid = valid[:, :, :cap]
    stats = {
        "cap": int(cap),
        "adaptive": bool(adaptive),
        "total_pairs": int(counts.size),
        "truncated_pairs": int(np.sum(counts > cap)),
        "truncated_frac": float(np.mean(counts > cap)) if counts.size else 0.0,
        "max_count": int(counts.max()) if counts.size else 0,
        "mean_count": float(counts.mean()) if counts.size else 0.0,
    }
    if telemetry is not None:
        telemetry.update(stats)
    log = logger.warning if stats["truncated_pairs"] else logger.info
    log("best-buddy capacity cap=%d%s: %d/%d frame pairs truncated "
        "(max mutual-NN count %d, mean %.1f)", cap,
        " (adaptive)" if adaptive else "", stats["truncated_pairs"],
        stats["total_pairs"], stats["max_count"], stats["mean_count"])

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
                           h: int, w: int, stride: int = 7,
                           patch_size: int = 14) -> BBData:
    """Keep buddies only where flow supervision is absent: the nearest
    trajectory to the source point must be invalid at the target frame and
    vice versa (reference of_filter_dino_best_buddies.py:37-112)."""
    t = bb.num_frames
    half = patch_size // 2
    grid = bb_meshgrid(h, w, stride, patch_size)
    closest = closest_trajectory_grids(trajectories_nt2, grid)  # T×n
    grid_np = np.asarray(grid)
    gh = len(np.unique(grid_np[:, 1]))
    gw = len(np.unique(grid_np[:, 0]))
    closest_grids = closest.reshape(t, gh, gw)
    invalid = np.isnan(trajectories_nt2).any(axis=-1)  # N×T

    src = np.asarray(bb.source_coords)  # t×t×cap×2
    tgt = np.asarray(bb.target_coords)
    # pixel coords -> feature-grid indices ((x - patch/2) // stride),
    # batched over every (s, u, buddy) at once — the per-pair python double
    # loop was O(T²·cap) host work at production scale
    sidx = ((src - half) // stride).astype(np.int64)
    tidx = ((tgt - half) // stride).astype(np.int64)
    sx = np.clip(sidx[..., 0], 0, gw - 1)
    sy = np.clip(sidx[..., 1], 0, gh - 1)
    tx = np.clip(tidx[..., 0], 0, gw - 1)
    ty = np.clip(tidx[..., 1], 0, gh - 1)
    s_ax = np.arange(t)[:, None, None]  # source-frame index, bcast t×t×cap
    u_ax = np.arange(t)[None, :, None]  # target-frame index
    s_traj = closest_grids[s_ax, sy, sx]  # t×t×cap
    t_traj = closest_grids[u_ax, ty, tx]
    keep = invalid[s_traj, u_ax] & invalid[t_traj, s_ax]
    off_diag = s_ax != u_ax
    valid = np.asarray(bb.valid) & (keep | ~off_diag)
    return bb._replace(valid=jnp.asarray(valid))


# ---------------------------------------------------------------------------
# NMS ambiguity
# ---------------------------------------------------------------------------

def _pair_ambiguity(source_feats_cap_c, target_flat_nc, grid_n2,
                    topk: int, box_size: float, iou_thresh: float,
                    cap_chunk: int = 1024):
    """r for each (padded) buddy of one ordered pair.

    The cap×n affinity is never materialized whole: with the adaptive
    keep-all capacity, DAVIS-scale videos reach cap≈6k, so a full cap×n f32
    map is ~190 MB — ×2 directions ×16 vmapped pairs that OOMed a 16 GB
    chip. ``nms_top2_peaks`` is row-independent (every reduction is along
    n), so the buddy axis streams through ``lax.map`` in ``cap_chunk``
    slabs, bounding the live affinity at cap_chunk×n per instance with
    bitwise-identical results."""
    cap, c = source_feats_cap_c.shape
    sn = source_feats_cap_c / jnp.clip(
        jnp.linalg.norm(source_feats_cap_c, axis=1, keepdims=True), min=1e-8)
    tn = target_flat_nc / jnp.clip(
        jnp.linalg.norm(target_flat_nc, axis=1, keepdims=True), min=1e-8)
    if cap <= cap_chunk:
        sim = jnp.dot(sn, tn.T, preferred_element_type=jnp.float32)  # cap×n
        return nms_top2_peaks(sim, grid_n2, topk=topk, box_size=box_size,
                              iou_thresh=iou_thresh)
    pad = (-cap) % cap_chunk
    snp = jnp.pad(sn, ((0, pad), (0, 0)))

    def slab(sn_k):
        sim = jnp.dot(sn_k, tn.T, preferred_element_type=jnp.float32)
        return nms_top2_peaks(sim, grid_n2, topk=topk, box_size=box_size,
                              iou_thresh=iou_thresh)

    peaks, r = jax.lax.map(slab, snp.reshape(-1, cap_chunk, c))
    return peaks.reshape(-1, 2)[:cap], r.reshape(-1)[:cap]


def compute_bb_ambiguity(bb: BBData, features_tchw, h: int, w: int,
                         stride: int = 7, box_size: float = 30.0,
                         iou_thresh: float = 0.2, topk: int = 400,
                         patch_size: int = 14, progress: bool = False,
                         pair_batch: int = 16, mesh=None) -> BBData:
    """Ambiguity r per buddy, symmetrized max(r_fwd, r_bwd) across the two
    directions of each unordered pair (reference compute_dino_bb_nms.py).
    Because the reverse buddy list is the forward list mirrored, the
    symmetrization is a plain elementwise max. Unordered pairs batch per
    dispatch (both directions of a pair inside one program); with ``mesh``
    the pair axis shards across chips."""
    t, c = features_tchw.shape[:2]
    cap = bb.capacity
    half = patch_size // 2
    gw = 1 + (w - patch_size) // stride
    grid = bb_meshgrid(h, w, stride, patch_size)
    # one expression so the t×c×n intermediate (1.7 GB at DAVIS scale) is
    # freed as soon as the transpose lands — both would stay live otherwise
    flat_nc = jnp.asarray(features_tchw).reshape(t, c, -1).transpose(0, 2, 1)
    src = jnp.asarray(bb.source_coords)  # t×t×cap×2

    n_dev = mesh.devices.size if mesh is not None else 1
    bsz = max(pair_batch, n_dev)
    bsz -= bsz % n_dev

    @jax.jit
    def run_batch(flat_nc, src, s_idx, u_idx):
        def one_dir(s, u):
            coords = src[s, u]  # cap×2
            fx = ((coords[:, 0] - half) // stride).astype(jnp.int32)
            fy = ((coords[:, 1] - half) // stride).astype(jnp.int32)
            idx = jnp.clip(fy * gw + fx, 0, flat_nc.shape[1] - 1)
            sfeats = flat_nc[s][idx]  # cap×c
            _, r = _pair_ambiguity(sfeats, flat_nc[u], grid, topk,
                                   box_size, iou_thresh)
            return r

        s_idx = constrain_batch(s_idx, mesh)
        u_idx = constrain_batch(u_idx, mesh)
        r_fwd = jax.vmap(one_dir)(s_idx, u_idx)
        r_bwd = jax.vmap(one_dir)(u_idx, s_idx)
        return constrain_batch(jnp.maximum(r_fwd, r_bwd), mesh)

    def dispatch(s_idx, u_idx):
        args = (flat_nc, src, jnp.asarray(s_idx), jnp.asarray(u_idx))
        if mesh is not None:
            with mesh:
                return run_batch(*args)
        return run_batch(*args)

    r_out = np.ones((t, t, cap), np.float32)
    pairs = np.asarray([(s, u) for s in range(t) for u in range(s + 1, t)],
                       np.int32).reshape(-1, 2)
    # enqueue all batches before the first fetch (async dispatch pipelines
    # through the relay; see the same pattern in extract_best_buddies)
    inflight = []
    for b0 in range(0, len(pairs), bsz):
        chunk = pairs[b0:b0 + bsz]
        padded = pad_to_multiple(chunk, bsz)
        inflight.append((chunk, dispatch(padded[:, 0], padded[:, 1])))
    if progress:
        from tqdm import tqdm
        inflight = tqdm(inflight, desc="bb ambiguity")
    for chunk, out in inflight:
        r_b = np.asarray(out)
        for j, (s, u) in enumerate(chunk):
            r_out[s, u] = r_b[j]
            r_out[u, s] = r_b[j]
    return bb._replace(r=jnp.asarray(r_out))

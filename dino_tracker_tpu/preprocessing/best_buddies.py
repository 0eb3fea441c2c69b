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
import time
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


def _packbits(mask_n):
    """Bool (n,) -> packed uint8 (ceil(n/8),), MSB-first — the exact layout
    ``np.unpackbits`` inverts on the host. A dot with the bit weights keeps
    it dense vector work (no scatter)."""
    n = mask_n.shape[0]
    pad = (-n) % 8
    m = jnp.pad(mask_n, (0, pad)).reshape(-1, 8).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8))
    return jnp.sum(m * weights, axis=1, dtype=jnp.uint8)


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
    if min(cap, n) >= n:
        # uncapped (adaptive mode): mutual-NN count is <= n by construction,
        # so no selection is needed. Return the RAW per-token mask + argmax
        # row — compaction happens on the host (np.nonzero over n tokens is
        # microseconds). The device-side compact_mask at cap=n materializes
        # an n×n one-hot (263 MB) and contracts it (263 GFLOP) PER PAIR —
        # measured 89.7 ms/pair vs the ~3-5 ms affinity+argmax floor, it was
        # the dominant cost of the whole adaptive sweep.
        # Wire packing: the whole sweep is relay-FETCH-bound (perf_bb_attrib:
        # 18.4 of 29.6 s was the ragged fetch), so the per-token outputs ship
        # in their smallest exact encodings — argmax as u16 when n fits
        # (8107 tokens at DAVIS scale), the mask as MSB-first packed bits
        # (np.unpackbits layout). cos stays f32: the goldens pin it to the
        # reference at 1e-4 and training artifacts store it f32.
        idx_dtype = jnp.uint16 if n < (1 << 16) else jnp.int32
        return src_max.astype(idx_dtype), cos, _packbits(is_bb)
    # keep the strongest-cosine buddies when count exceeds capacity (small
    # frames can have fewer tokens than the capacity — pad instead).
    # lax.top_k at this shape (k=1024 of n=8107) was 15.5 of the core's
    # 18.7 ms (scripts/perf_bb_probe.py) — the radix-select membership mask
    # + one-hot compaction computes the same set with vector ops only; the
    # surviving buddies come out in token-index order instead of descending
    # cosine (downstream treats them as a set).
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
# pairs per device dispatch (sequential lax.map over HBM-budgeted chunks):
# big enough that relay round-trip latency amortizes, small enough that a
# dropped-RPC retry doesn't redo the whole sweep
_PAIRS_PER_DISPATCH = 256


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
    # raw mode: the core skips on-device compaction (cap >= n can never
    # truncate) and returns per-token mask/argmax/cos; compaction happens on
    # the host. Adaptive additionally trims the buddy axis to the observed
    # maximum; an explicit cap >= n keeps its requested padded shape.
    requested_cap = cap
    if adaptive or cap >= n:
        cap = n
    raw = cap >= n

    phase_t = {}
    _tick = time.monotonic()

    def _phase(name):
        nonlocal _tick
        now = time.monotonic()
        phase_t[name] = round(now - _tick, 2)
        _tick = now

    use_filter = unfiltered_trajectories is not None
    coords_pad = invalid = None
    cg_chunk = 0
    if use_filter:
        # the closest-trajectory grids are computed INSIDE the sweep program
        # (traced via _closest_grids_body) — a separate jitted program paid a
        # 90-300 s first-execution relay round trip per process for ~0.1 s of
        # device work; only the padded coordinates cross the host boundary
        coords_np, cg_chunk = _pad_traj_coords(unfiltered_trajectories)
        coords_pad = jnp.asarray(coords_np)
        invalid = jnp.asarray(np.isnan(unfiltered_trajectories).any(axis=-1))
    _phase("closest_grids_s")

    n_dev = mesh.devices.size if mesh is not None else 1
    # working set per pair: the n×n affinity, plus the cap×n compaction
    # one-hot when a fixed cap compacts on-device (adaptive mode compacts
    # on the host, so only the affinity is live)
    per_pair = n * n * 4 + (0 if raw else cap * n * 4)
    bsz = min(pair_batch, max(1, _AFFINITY_BUDGET_BYTES // per_pair))
    bsz = max(bsz, n_dev)
    bsz -= bsz % n_dev

    def one_chunk(flat, closest, invalid, s_idx, u_idx):
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

    # super-chunking: at DAVIS scale the sweep's device compute is only
    # ~4 ms/pair (one n×n matmul + argmaxes), so hundreds of small
    # dispatches make the stage relay-LATENCY-bound even when pipelined.
    # Each dispatch therefore runs many HBM-budgeted chunks sequentially
    # through lax.map (live working set stays one chunk's affinity; the
    # chunk axis still shards over the mesh inside one_chunk).
    chunks_per_dispatch = max(1, _PAIRS_PER_DISPATCH // bsz)

    @jax.jit
    def run_super(flat, coords_pad, grid_dev, invalid, s_idx_2d, u_idx_2d):
        closest = (_closest_grids_body(coords_pad, grid_dev, cg_chunk)
                   if use_filter else None)
        return jax.lax.map(
            lambda su: one_chunk(flat, closest, invalid, su[0], su[1]),
            (s_idx_2d, u_idx_2d))

    def dispatch(s_idx_2d, u_idx_2d):
        args = (flat, coords_pad, jnp.asarray(grid), invalid,
                jnp.asarray(s_idx_2d), jnp.asarray(u_idx_2d))
        if mesh is not None:
            with mesh:
                return run_super(*args)
        return run_super(*args)

    grid_np = np.asarray(grid)
    counts = []  # true pre-cap mutual-NN count per unordered pair

    pairs = np.asarray([(s, u) for s in range(t) for u in range(s + 1, t)],
                       np.int32).reshape(-1, 2)
    # enqueue every super-chunk before fetching any result: dispatch is
    # async, so queued programs pipeline through the device while earlier
    # fetches drain (the original dispatch→fetch→dispatch loop serialized
    # one relay round trip per batch)
    super_sz = bsz * chunks_per_dispatch
    inflight = []
    for b0 in range(0, len(pairs), super_sz):
        chunk = pairs[b0:b0 + super_sz]
        padded = pad_to_multiple(chunk, super_sz).reshape(-1, bsz, 2)
        inflight.append((chunk, dispatch(padded[..., 0], padded[..., 1])))
    _phase("enqueue_s")
    if progress:
        from tqdm import tqdm
        inflight = tqdm(inflight, desc="best buddies")

    def _flatten(out):
        """(k, bsz, …) lax.map outputs -> (k·bsz, …) host arrays."""
        return [np.asarray(x).reshape(-1, *x.shape[2:]) for x in out]

    if raw:
        # host-side compaction of the raw per-token outputs: ragged keep-all
        # lists first, then one padded allocation at the observed maximum
        # (rounded to 128 lanes) — nothing is ever truncated
        ragged = []
        for chunk, out in inflight:
            sm_b, cs_b, bb_b = _flatten(out)
            # is_bb arrives bit-packed (see _mutual_nn_core's wire packing);
            # unpack once per super-chunk and trim the pad back to n tokens
            bb_b = np.unpackbits(bb_b, axis=1)[:, :n].astype(bool)
            for j, (s, u) in enumerate(chunk):
                idx = np.nonzero(bb_b[j])[0]
                ragged.append((s, u, idx, sm_b[j][idx].astype(np.int64),
                               cs_b[j][idx]))
                counts.append(idx.size)
        counts = np.asarray(counts, np.int64)
        _phase("fetch_ragged_s")
        maxc = int(counts.max()) if counts.size else 0
        cap = (min(n, max(128, -(-maxc // 128) * 128)) if adaptive
               else requested_cap)
        src_c = np.zeros((t, t, cap, 2), np.float32)
        tgt_c = np.zeros((t, t, cap, 2), np.float32)
        cos = np.zeros((t, t, cap), np.float32)
        valid = np.zeros((t, t, cap), bool)
        for s, u, idx, ti, cs in ragged:
            k = idx.size
            src_c[s, u, :k] = grid_np[idx]
            tgt_c[s, u, :k] = grid_np[ti]
            cos[s, u, :k] = cs
            valid[s, u, :k] = True
            # mirror for the reverse direction (mutual pairs are symmetric)
            src_c[u, s, :k] = grid_np[ti]
            tgt_c[u, s, :k] = grid_np[idx]
            cos[u, s, :k] = cs
            valid[u, s, :k] = True
    else:
        src_c = np.zeros((t, t, cap, 2), np.float32)
        tgt_c = np.zeros((t, t, cap, 2), np.float32)
        cos = np.zeros((t, t, cap), np.float32)
        valid = np.zeros((t, t, cap), bool)
        for chunk, out in inflight:
            si_b, ti_b, cs_b, va_b, ct_b = _flatten(out)
            for j, (s, u) in enumerate(chunk):
                si, ti, cs, va = si_b[j], ti_b[j], cs_b[j], va_b[j]
                src_c[s, u] = grid_np[si]
                tgt_c[s, u] = grid_np[ti]
                cos[s, u] = cs
                valid[s, u] = va
                src_c[u, s] = grid_np[ti]
                tgt_c[u, s] = grid_np[si]
                cos[u, s] = cs
                valid[u, s] = va
                counts.append(int(ct_b[j]))
        counts = np.asarray(counts, np.int64)
    _phase("fetch_compact_s")
    stats = {
        "phases": phase_t,
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

    # host (numpy) arrays: the preprocessing consumers (OF filter, NMS row
    # grouping, npz save) are host-side — shipping the ~370 MB padded stack
    # to the device here only to fetch it straight back cost two relay
    # crossings per video. Training loads device arrays from disk instead
    # (structures.load_bb_data).
    return BBData(src_c, tgt_c, cos, np.ones((t, t, cap), np.float32), valid)


# ---------------------------------------------------------------------------
# optical-flow filter
# ---------------------------------------------------------------------------

def _closest_grids_body(coords_tn2, grid, chunk: int):
    """All frames in ONE traced expression: lax.map over the frame axis
    (sequential — the live n×chunk distance matrix stays one frame's worth),
    lax.scan over trajectory chunks inside. Returns T×n int32. Traced inline
    into the sweep program (`run_super`) in production: a standalone jitted
    program for this tiny computation paid a 90-300 s first-execution relay
    round trip per process (measured; the compute itself is 0.13 s warm)."""
    n_chunks = coords_tn2.shape[1] // chunk
    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    n_grid = grid.shape[0]

    def frame(c_n2):
        def step(carry, xs):
            best_d, best_i = carry
            off, cc = xs
            d = jnp.linalg.norm(grid[:, None, :] - cc[None], axis=-1)
            ci = jnp.argmin(d, axis=1).astype(jnp.int32)
            cd = jnp.min(d, axis=1)
            take = cd < best_d
            best_i = jnp.where(take, ci + off, best_i)
            best_d = jnp.minimum(cd, best_d)
            return (best_d, best_i), None

        (_, i), _ = jax.lax.scan(
            step,
            (jnp.full((n_grid,), jnp.inf, grid.dtype),
             jnp.zeros(n_grid, jnp.int32)),
            (offsets, c_n2.reshape(n_chunks, chunk, 2)))
        return i

    return jax.lax.map(frame, coords_tn2)


_closest_grids_all = functools.partial(jax.jit, static_argnames=("chunk",))(
    _closest_grids_body)


def _pad_traj_coords(trajectories_nt2: np.ndarray,
                     chunk: int = 8192) -> Tuple[np.ndarray, int]:
    """T×P×2 f32 frame-major trajectory coordinates, NaN → 1e12 (infinitely
    far), trajectory axis padded to a power-of-two bucket (min 128) so one
    compiled program serves every video whose count lands in the bucket.
    Returns (coords, chunk) with ``chunk`` clipped to the padded size."""
    n_traj, t = trajectories_nt2.shape[:2]
    n_pad = max(128, 1 << max(0, int(n_traj - 1).bit_length()))
    chunk = min(chunk, n_pad)
    n_pad = -(-n_pad // chunk) * chunk
    coords = np.full((t, n_pad, 2), 1e12, np.float32)
    coords[:, :n_traj] = np.nan_to_num(
        np.transpose(trajectories_nt2, (1, 0, 2)), nan=1e12)
    return coords, chunk


def closest_trajectory_grids(trajectories_nt2: np.ndarray, grid_n2,
                             chunk: int = 8192) -> np.ndarray:
    """For each frame f and grid point g: index of the nearest trajectory at
    frame f (NaN-coordinates treated as infinitely far). Returns T×n int32.
    Reference of_filter_dino_best_buddies.py:9-29, vectorized as a running
    argmin over trajectory chunks. Standalone entry (tests +
    ``of_filter_best_buddies``); the production sweep traces the same body
    inline into its own program instead (see ``_closest_grids_body``)."""
    coords, chunk = _pad_traj_coords(trajectories_nt2, chunk)
    return np.asarray(_closest_grids_all(
        jnp.asarray(coords), jnp.asarray(grid_n2), chunk))


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
    return bb._replace(valid=valid)


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
                         pair_batch: int = 16, mesh=None,
                         rows_per_slab: int = 8192,
                         telemetry: Optional[dict] = None) -> BBData:
    """Ambiguity r per buddy, symmetrized max(r_fwd, r_bwd) across the two
    directions of each unordered pair (reference compute_dino_bb_nms.py).
    Because the reverse buddy list is the forward list mirrored, the
    symmetrization is a plain elementwise max.

    Dense valid-row streaming: the padded t×t×cap layout is ~80% invalid
    slots at DAVIS scale (cap = max per-pair count ≈ 5.2× the mean), and
    ``nms_top2_peaks`` is row-independent — so only the VALID rows are ever
    computed. Rows group by TARGET frame (every row of a group contracts
    against the same frame's features → one dense matmul, no padding), one
    dispatch per target frame at a shared padded row count (one compile),
    streamed through ``lax.map`` in ``rows_per_slab`` slabs to bound the
    live slab×n affinity; with ``mesh`` the slab rows shard across chips.
    r of invalid slots is left at the neutral 1.0 (downstream masks by
    ``bb.valid``; the reference's ragged lists have no such slots at all).
    """
    t, c = features_tchw.shape[:2]
    cap = bb.capacity
    half = patch_size // 2
    gw = 1 + (w - patch_size) // stride
    grid = bb_meshgrid(h, w, stride, patch_size)

    phase_t = {}
    _tick = time.monotonic()

    def _phase(name):
        nonlocal _tick
        now = time.monotonic()
        phase_t[name] = round(now - _tick, 2)
        _tick = now

    # one expression so the t×c×n intermediate (1.7 GB at DAVIS scale) is
    # freed as soon as the transpose lands — both would stay live otherwise
    flat_nc = jnp.asarray(features_tchw).reshape(t, c, -1).transpose(0, 2, 1)
    n = flat_nc.shape[1]

    src = np.asarray(bb.source_coords)  # t×t×cap×2
    valid = np.asarray(bb.valid)
    fx = ((src[..., 0] - half) // stride).astype(np.int64)
    fy = ((src[..., 1] - half) // stride).astype(np.int64)
    tok = np.clip(fy * gw + fx, 0, n - 1)  # t×t×cap

    # group valid rows by target frame: direction s→u reads frame s's
    # features at its buddy tokens and contracts against frame u
    rows_sf = [[] for _ in range(t)]   # source frame id per row
    rows_tk = [[] for _ in range(t)]   # source token id per row
    rows_back = [[] for _ in range(t)]  # (s, slots) scatter map
    for s in range(t):
        for u in range(t):
            if s == u:
                continue
            slots = np.nonzero(valid[s, u])[0]
            if slots.size:
                rows_sf[u].append(np.full(slots.size, s, np.int32))
                rows_tk[u].append(tok[s, u, slots].astype(np.int32))
                rows_back[u].append((s, slots))

    _phase("group_rows_s")
    r_out = np.ones((t, t, cap), np.float32)
    m_max = max((sum(a.size for a in rows_tk[f]) for f in range(t)),
                default=0)
    if m_max == 0:
        return bb._replace(r=r_out)
    slab = min(rows_per_slab, -(-m_max // 128) * 128)
    m_pad = -(-m_max // slab) * slab

    def run_frame(flat_nc, sf_ids, tk_ids, f):
        sfeats = flat_nc[sf_ids, tk_ids]  # M×c gather
        sn = sfeats / jnp.clip(jnp.linalg.norm(sfeats, axis=1, keepdims=True),
                               min=1e-8)
        tf = flat_nc[f]
        tn = tf / jnp.clip(jnp.linalg.norm(tf, axis=1, keepdims=True),
                           min=1e-8)

        def one_slab(sn_k):
            sn_k = constrain_batch(sn_k, mesh)
            sim = jnp.dot(sn_k, tn.T, preferred_element_type=jnp.float32)
            _, r = nms_top2_peaks(sim, grid, topk=topk, box_size=box_size,
                                  iou_thresh=iou_thresh)
            return constrain_batch(r, mesh)

        return jax.lax.map(one_slab, sn.reshape(-1, slab, c)).reshape(-1)

    # ONE dispatch for the whole stage: per-frame programs would pay ~t
    # relay round trips for ~3 ms of device work each; the frame axis runs
    # sequentially through an outer lax.map instead (live memory still one
    # slab×n affinity). The full r output is all of 4·t·m_pad bytes.
    @jax.jit
    def run_all(flat_nc, sf_2d, tk_2d, f_ids):
        return jax.lax.map(
            lambda args: run_frame(flat_nc, args[0], args[1], args[2]),
            (sf_2d, tk_2d, f_ids))

    frames = [f for f in range(t) if rows_back[f]]
    sf_2d = np.zeros((len(frames), m_pad), np.int32)
    tk_2d = np.zeros((len(frames), m_pad), np.int32)
    for i, f in enumerate(frames):
        sf = np.concatenate(rows_sf[f])
        sf_2d[i, :sf.size] = sf
        tk_2d[i, :sf.size] = np.concatenate(rows_tk[f])
    args = (flat_nc, jnp.asarray(sf_2d), jnp.asarray(tk_2d),
            jnp.asarray(frames, jnp.int32))
    _phase("pack_rows_s")
    if mesh is not None:
        with mesh:
            r_fut = run_all(*args)
    else:
        r_fut = run_all(*args)
    _phase("dispatch_s")  # tracing + compilation (execution is async)
    r_all = np.asarray(r_fut)
    _phase("execute_fetch_s")
    for i, f in enumerate(frames):
        offset = 0
        for s, slots in rows_back[f]:
            r_out[s, f, slots] = r_all[i, offset:offset + slots.size]
            offset += slots.size
    # symmetrize across directions: the reverse buddy list is the mirror of
    # the forward one, so slot k of (s,u) pairs with slot k of (u,s)
    r_sym = np.maximum(r_out, r_out.transpose(1, 0, 2))
    _phase("scatter_s")
    if telemetry is not None:
        telemetry.update({"phases": phase_t, "m_max": int(m_max),
                          "rows_total": int(sum(
                              sum(a.size for a in rows_tk[f])
                              for f in range(t)))})
    return bb._replace(r=r_sym)

"""Chained optical-flow trajectory extraction.

Behavior spec: reference preprocessing/extract_trajectories.py — per start
frame, every pixel spawns a candidate trajectory that is advanced by the
forward flow, killed on forward-backward cycle error > threshold /
out-of-bounds / (optionally) disagreement with the direct start→t flow, and
deduplicated against trajectories from earlier start frames ("look-behind").

TPU redesign: the per-start-frame time loop is a ``lax.scan`` carrying
(coords h×w×2, alive h×w) — all pixels advance in parallel (the reference
also vectorizes over pixels; we additionally fuse the whole time loop into
one XLA program per start frame and replace the growing trajectory list +
O(N) look-behind scan with a t×h×w occupancy grid). Ragged assembly of
surviving trajectories happens host-side (NumPy), exactly once per start
frame.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.sampling import bilinear_sampler_pixel


def compute_flow_masks(flows_fwd, flows_bwd, threshold: float,
                       add_missing_forward_warp: bool = True):
    """Per-frame backward cycle-consistency masks (reference
    extract_trajectories.py:30-95).

    flows_fwd/flows_bwd: (t-1)×2×h×w — flow i→i+1 and i+1→i.
    Returns masks (t, h, w) bool: frame f>0 is True where frame f's pixel
    cycle-checks against frame f-1 (and received a forward warp); frame 0 is
    all False.
    """
    tm1, _, h, w = flows_fwd.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xs, ys], axis=-1)[None]  # 1×h×w×2

    def per_pair(fwd, bwd):
        coords1 = coords + jnp.transpose(bwd, (1, 2, 0))[None]
        warped_fwd = bilinear_sampler_pixel(fwd[None], coords1)
        coords2 = coords1 + jnp.transpose(warped_fwd[0], (1, 2, 0))[None]
        err = jnp.linalg.norm(coords - coords2, axis=3)[0]  # h×w
        mask = err < threshold
        if add_missing_forward_warp:
            tgt = coords[0] + jnp.transpose(fwd, (1, 2, 0))
            tgt = jnp.round(tgt).astype(jnp.int32)
            inb = ((tgt[..., 0] >= 0) & (tgt[..., 0] <= w - 1)
                   & (tgt[..., 1] >= 0) & (tgt[..., 1] <= h - 1))
            xi = jnp.clip(tgt[..., 0], 0, w - 1)
            yi = jnp.clip(tgt[..., 1], 0, h - 1)
            hit = jnp.zeros((h, w), bool).at[yi.reshape(-1), xi.reshape(-1)].max(
                inb.reshape(-1))
            mask = mask & hit
        return mask

    pair_masks = jax.lax.map(lambda ab: per_pair(*ab), (flows_fwd, flows_bwd))
    return jnp.concatenate([jnp.zeros((1, h, w), bool), pair_masks], axis=0)


@functools.partial(jax.jit, static_argnames=("threshold", "use_direct",
                                             "direct_threshold"))
def _chain_from_start(flows_fwd, flows_bwd, start_mask, start_frame,
                      dflows, dflow_masks, threshold: float,
                      use_direct: bool, direct_threshold: float):
    """Scan the full time range; steps before ``start_frame`` are identity.

    flows_fwd/flows_bwd: (t-1)×2×h×w. start_mask: h×w bool (which pixels
    spawn trajectories). dflows: (t-1)×h×w×2 direct flows start→f (row k is
    flow to frame start+1+k when use_direct); dflow_masks likewise.
    Returns (trajectories t×h×w×2 float32 with NaN, never-nan alive count).
    """
    tm1, _, h, w = flows_fwd.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs, ys], axis=-1)  # h×w×2
    upper = jnp.asarray([w - 1.0, h - 1.0])

    def step(carry, idx):
        coords, alive = carry
        active = idx >= start_frame

        fwd = flows_fwd[idx]
        bwd = flows_bwd[idx]
        warped_fwd = jnp.transpose(
            bilinear_sampler_pixel(fwd[None], coords[None])[0], (1, 2, 0))
        coords1 = coords + warped_fwd
        warped_bwd = jnp.transpose(
            bilinear_sampler_pixel(bwd[None], coords1[None])[0], (1, 2, 0))
        coords2 = coords1 + warped_bwd
        err = jnp.linalg.norm(coords - coords2, axis=-1)
        in_bounds = jnp.all((coords1 >= 0.0) & (coords1 <= upper), axis=-1)
        new_alive = alive & (err < threshold) & in_bounds
        new_coords = coords + warped_fwd
        if use_direct:
            # direct-flow row for target frame idx+1 is dflows[idx - start]
            drow = idx - start_frame
            dflow = dflows[jnp.clip(drow, 0, tm1 - 1)]
            dmask = dflow_masks[jnp.clip(drow, 0, tm1 - 1)]
            err_d = jnp.linalg.norm(new_coords - (grid + dflow), axis=-1)
            err_d = err_d * (dmask > 0.2)
            new_alive = new_alive & (err_d < direct_threshold)

        coords = jnp.where(active, new_coords, coords)
        alive = jnp.where(active, new_alive, alive)
        out = jnp.where(alive[..., None], coords, jnp.nan)
        return (coords, alive), out

    init = (grid, start_mask)
    first = jnp.where(start_mask[..., None], grid, jnp.nan)
    (_, _), rest = jax.lax.scan(step, init, jnp.arange(tm1))
    # rows: frame start_frame is ``first``; rows of ``rest`` hold frames
    # idx+1 — frames ≤ start_frame-1 from rest are pre-start identity junk,
    # masked below.
    t = tm1 + 1
    frames = jnp.arange(t)
    # timeline: frame f < start -> NaN; f == start -> first;
    # f > start -> rest[f-1] (scan output of step idx = f-1)
    timeline = jnp.where(
        (frames[:, None, None, None] == start_frame), first[None],
        jnp.where(frames[:, None, None, None] > start_frame,
                  jnp.concatenate([jnp.full_like(first[None], jnp.nan), rest],
                                  axis=0),
                  jnp.nan))
    return timeline


def _chain_dual(flows_fwd, flows_bwd, start_frame, dflows, dflow_masks,
                threshold: float, direct_threshold: float):
    """BOTH trajectory passes (with / without the direct-flow filter) in one
    sweep. The reference runs the whole chaining script twice
    (main_dino_bb_preprocessing.py:34-39); the two passes share every flow
    warp — pixel coordinates advance identically regardless of aliveness, so
    one coords carry serves both and only the alive masks differ.

    EVERY pixel spawns here (no start mask): aliveness is monotone and
    per-pixel independent of spawn gating, so the host applies eligibility +
    look-behind occupancy when selecting kept columns — exactly equivalent
    to masking at spawn, and it decouples the device program from the
    sequential host-side occupancy state (starts can be dispatched ahead).

    The time loop is a full-range ``lax.scan`` whose per-step timeline rows
    come out as STACKED SCAN OUTPUTS. An earlier revision ran a
    ``fori_loop`` starting at ``start_frame`` with two
    ``dynamic_update_slice`` writes into carried t×h×w×2 timelines —
    skipping the pre-start steps but paying an unaliased copy of both 81 MB
    carries per step (~27 ms/step, ~33 s/video measured by the r5 residual
    probe); the scan's output rows are written in place, and the pre-start
    identity steps it re-admits cost ~100x less than the copies did.

    Returns (timeline_filtered, timeline_unfiltered), each t×h×w×2 float32
    with NaNs for dead/never-born entries.
    """
    tm1, _, h, w = flows_fwd.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs, ys], axis=-1)  # h×w×2
    upper = jnp.asarray([w - 1.0, h - 1.0])

    def step(carry, idx):
        coords, alive_f, alive_u = carry
        active = idx >= start_frame
        fwd = flows_fwd[idx]
        bwd = flows_bwd[idx]
        warped_fwd = jnp.transpose(
            bilinear_sampler_pixel(fwd[None], coords[None])[0], (1, 2, 0))
        coords1 = coords + warped_fwd
        warped_bwd = jnp.transpose(
            bilinear_sampler_pixel(bwd[None], coords1[None])[0], (1, 2, 0))
        coords2 = coords1 + warped_bwd
        err = jnp.linalg.norm(coords - coords2, axis=-1)
        in_bounds = jnp.all((coords1 >= 0.0) & (coords1 <= upper), axis=-1)
        ok = (err < threshold) & in_bounds
        new_alive_u = alive_u & ok
        # direct-flow row for target frame idx+1 is dflows[idx - start]
        drow = jnp.clip(idx - start_frame, 0, tm1 - 1)
        err_d = jnp.linalg.norm(coords1 - (grid + dflows[drow]), axis=-1)
        err_d = err_d * (dflow_masks[drow] > 0.2)
        new_alive_f = alive_f & ok & (err_d < direct_threshold)
        coords = jnp.where(active, coords1, coords)
        alive_f = jnp.where(active, new_alive_f, alive_f)
        alive_u = jnp.where(active, new_alive_u, alive_u)
        out_f = jnp.where(alive_f[..., None], coords, jnp.nan)
        out_u = jnp.where(alive_u[..., None], coords, jnp.nan)
        return (coords, alive_f, alive_u), (out_f, out_u)

    alive0 = jnp.ones((h, w), bool)
    _, (rest_f, rest_u) = jax.lax.scan(step, (grid, alive0, alive0),
                                       jnp.arange(tm1))

    frames = jnp.arange(tm1 + 1)
    first = grid[None]  # the spawn row (every pixel alive at start_frame)

    def timeline(rest):
        # frame f < start -> NaN; f == start -> grid; f > start ->
        # rest[f-1] (pre-start rest rows are identity junk, masked here)
        shifted = jnp.concatenate([jnp.full_like(first, jnp.nan), rest],
                                  axis=0)
        return jnp.where(
            (frames[:, None, None, None] == start_frame), first,
            jnp.where(frames[:, None, None, None] > start_frame, shifted,
                      jnp.nan))

    return timeline(rest_f), timeline(rest_u)


def _make_fused_start_program(decode_fn, threshold: float,
                              direct_threshold: float, min_len: int):
    """ONE jitted program per start frame: direct-flow decode (the engine's
    traceable sweep) + dual chaining + keep-candidate masks. A whole start
    frame is a single dispatch — the split pipeline paid ~1 s of relay
    round-trip latency per chain dispatch on top of the decode dispatch
    (scripts/perf_traj_probe.py: chain was a flat 1.05 s/start while its
    device compute is a fraction of that)."""

    @jax.jit
    def mega(operands, flows_fwd, flows_bwd, start, thresh):
        dflows, dmasks = decode_fn(*operands, start, thresh)
        tl_f, tl_u = _chain_dual(flows_fwd, flows_bwd, start, dflows, dmasks,
                                 threshold=threshold,
                                 direct_threshold=direct_threshold)
        return tl_f, tl_u, _keep_mask(tl_f, min_len), _keep_mask(tl_u, min_len)

    return mega


def _make_fused_group_program(decode_fn, threshold: float,
                              direct_threshold: float, min_len: int):
    """G start frames per dispatch: ``lax.map`` of the single-start body
    over a [G] start vector, returning stacked timelines/keeps.

    The r5 trajectories probe measured a flat ~1.2-1.4 s per start-frame
    dispatch (relay round trip + fetch sync) on top of the decode compute —
    ~60 s across DAVIS's 49 starts. Grouping divides that overhead by G
    while the per-start math (dynamic-trip decode fori + dual chain) is
    unchanged. The map serializes its G bodies on device — that is the
    point: one dispatch, G starts of back-to-back compute."""

    @jax.jit
    def mega_group(operands, flows_fwd, flows_bwd, starts_g, thresh):
        def one(start):
            dflows, dmasks = decode_fn(*operands, start, thresh)
            tl_f, tl_u = _chain_dual(flows_fwd, flows_bwd, start, dflows,
                                     dmasks, threshold=threshold,
                                     direct_threshold=direct_threshold)
            return (tl_f, tl_u, _keep_mask(tl_f, min_len),
                    _keep_mask(tl_u, min_len))

        return jax.lax.map(one, starts_g)

    return mega_group


@functools.partial(jax.jit, static_argnames=("threshold", "direct_threshold",
                                             "min_len"))
def _dual_start_program(flows_fwd, flows_bwd, start, dflows, dmasks,
                        threshold: float, direct_threshold: float,
                        min_len: int):
    """Fallback fused start program for engines without a traceable decode
    (test doubles, precomputed-flow engines): chaining + keep masks in one
    dispatch, direct flows supplied as arrays."""
    tl_f, tl_u = _chain_dual(flows_fwd, flows_bwd, start, dflows, dmasks,
                             threshold=threshold,
                             direct_threshold=direct_threshold)
    return tl_f, tl_u, _keep_mask(tl_f, min_len), _keep_mask(tl_u, min_len)


@functools.partial(jax.jit, static_argnames=("min_len",))
def _keep_mask(timeline_thw2, min_len: int):
    """h·w bool: pixels whose trajectory survives ≥ min_len frames."""
    valid = ~jnp.isnan(timeline_thw2).any(axis=-1)  # t×h×w
    return valid.sum(axis=0) >= min_len


@jax.jit
def _gather_columns(timeline_thw2, idx_flat):
    """t×(hw)×2 gather of kept pixel columns (idx padded to a fixed bucket
    size so at most a handful of shapes ever compile)."""
    t = timeline_thw2.shape[0]
    flat = timeline_thw2.reshape(t, -1, 2)
    return jnp.take(flat, idx_flat, axis=1)


def extract_trajectories(flows_fwd: np.ndarray, flows_bwd: np.ndarray,
                         threshold: float = 1.5,
                         min_trajectory_length: int = 2,
                         direct_flow_fn: Optional[Callable[[int], Tuple[np.ndarray, np.ndarray]]] = None,
                         direct_flow_threshold: float = 2.5,
                         look_behind: bool = True,
                         progress: bool = False) -> np.ndarray:
    """Full extraction over all start frames -> N×t×2 float32 with NaNs
    (reference extract_trajectories.py:163-269).

    direct_flow_fn(start) -> (dflows (t-1-start)×h×w×2, dmasks) enables the
    direct-flow filter (reference :99-160, :222-255).
    """
    flows_fwd = jnp.asarray(flows_fwd)
    flows_bwd = jnp.asarray(flows_bwd)
    tm1, _, h, w = flows_fwd.shape
    t = tm1 + 1

    masks = np.asarray(compute_flow_masks(flows_fwd, flows_bwd, threshold))
    occupied = np.zeros((t, h, w), bool)  # look-behind occupancy
    use_direct = direct_flow_fn is not None

    def padded_direct(start):
        # RaftFlowEngine.direct_flows returns DEVICE arrays already padded
        # to tm1 rows (zeros beyond t-1-start) so the whole direct-flow
        # sweep stays on device; ragged host arrays (tests, alternate
        # engines) are padded here.
        dflows_in, dmasks_in = direct_flow_fn(start)
        n = dflows_in.shape[0]
        if n == tm1:
            return jnp.asarray(dflows_in), jnp.asarray(dmasks_in)
        dflows = jnp.zeros((tm1, h, w, 2), jnp.float32
                           ).at[:n].set(jnp.asarray(dflows_in))
        dmasks = jnp.zeros((tm1, h, w), jnp.float32
                           ).at[:n].set(jnp.asarray(dmasks_in))
        return dflows, dmasks

    collected = []
    starts = list(range(t - (min_trajectory_length - 1)))
    iterator = starts
    if progress:
        from tqdm import tqdm
        iterator = tqdm(starts, desc="chaining trajectories")
    # double buffer: the next start's direct-flow decode is enqueued (JAX
    # dispatch is async) before this start's host-blocking fetch/assembly,
    # overlapping device decode with host work + relay round trips
    prefetched = padded_direct(starts[0]) if (use_direct and starts) else None
    for i, start in enumerate(iterator):
        start_mask = ~masks[start]
        if look_behind:
            start_mask = start_mask | ~occupied[start]

        if use_direct:
            dflows, dmasks = prefetched
        else:
            dflows = jnp.zeros((tm1, h, w, 2), jnp.float32)
            dmasks = jnp.zeros((tm1, h, w), jnp.float32)

        timeline = _chain_from_start(
            flows_fwd, flows_bwd, jnp.asarray(start_mask),
            jnp.asarray(start, jnp.int32), dflows, dmasks,
            threshold=threshold, use_direct=use_direct,
            direct_threshold=direct_flow_threshold)

        if use_direct and i + 1 < len(starts):
            prefetched = padded_direct(starts[i + 1])

        # Ragged assembly: the keep decision runs on device and only the
        # kept columns are fetched (the full t×h×w×2 timeline is ~160 MB at
        # DAVIS scale × one per start frame — a host-link dominator).
        keep = np.asarray(_keep_mask(timeline, min_trajectory_length))  # h×w
        ki = np.flatnonzero(keep.ravel())
        if ki.size:
            # pad the gather to power-of-two buckets: bounded compile count
            cap = max(1024, 1 << int(np.ceil(np.log2(ki.size))))
            idx = np.zeros(min(cap, h * w), np.int32)
            idx[: ki.size] = ki
            trajs = np.asarray(_gather_columns(timeline, jnp.asarray(idx)))
            trajs = trajs[:, : ki.size, :]  # t×K×2
            collected.append(np.transpose(trajs, (1, 0, 2)).astype(np.float32))
            if look_behind:
                # fused multithreaded round+clip+scatter (NumPy fallback
                # below is ~3 s/start at DAVIS scale, serial)
                from ..utils.native_traj import occupancy_update
                if not occupancy_update(trajs, occupied, start):
                    kept_valid = ~np.isnan(trajs).any(axis=-1)  # t×K
                    coords = np.round(np.nan_to_num(trajs)).astype(np.int64)
                    xi = np.clip(coords[..., 0], 0, w - 1)
                    yi = np.clip(coords[..., 1], 0, h - 1)
                    for f in range(start, t):
                        sel = kept_valid[f]
                        occupied[f, yi[f, sel], xi[f, sel]] = True

    if not collected:
        return np.full((0, t, 2), np.nan, np.float32)
    return np.concatenate(collected, axis=0)


def extract_trajectories_dual(
        flows_fwd: np.ndarray, flows_bwd: np.ndarray, *,
        threshold: float = 1.5, min_trajectory_length: int = 2,
        direct_flow_threshold: float = 2.5,
        decode=None,
        direct_flow_fn: Optional[Callable[[int], Tuple[np.ndarray, np.ndarray]]] = None,
        look_behind: bool = True,
        mesh=None,
        start_group: int = 4,
        progress: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """BOTH extraction passes (with and without the direct-flow filter) in
    one sweep over start frames -> (filtered N×t×2, unfiltered M×t×2).

    The reference runs the whole chaining script twice — once per pass
    (main_preprocessing.py:28 and main_dino_bb_preprocessing.py:34-39) —
    re-deriving every adjacent-flow warp. Here each start frame is ONE
    device dispatch producing both timelines + both keep masks; only the
    kept columns are fetched. Per-pass look-behind occupancy (each pass
    dedupes against its own earlier trajectories, exactly as the
    reference's two independent script runs do) and spawn eligibility are
    applied host-side at column selection — exact, because per-pixel
    aliveness is monotone and independent of spawn gating.

    ``decode``: (fn, operands) from ``RaftFlowEngine.direct_sweep_traceable``
    — fuses the direct-flow decode into the same program. Fallback
    ``direct_flow_fn(start)`` serves engines without a traceable decode
    (test doubles, precomputed flows).
    """
    flows_fwd = jnp.asarray(flows_fwd)
    flows_bwd = jnp.asarray(flows_bwd)
    tm1, _, h, w = flows_fwd.shape
    t = tm1 + 1
    min_len = min_trajectory_length

    masks = np.asarray(compute_flow_masks(flows_fwd, flows_bwd, threshold))

    if decode is not None:
        decode_fn, operands = decode
        group = max(1, int(start_group))
        mega = _make_fused_group_program(
            decode_fn, threshold=threshold,
            direct_threshold=direct_flow_threshold, min_len=min_len)
        thresh_dev = jnp.asarray(threshold, jnp.float32)

        def dispatch_group(gstarts):
            return mega(operands, flows_fwd, flows_bwd,
                        jnp.asarray(gstarts, jnp.int32), thresh_dev)
    else:
        assert direct_flow_fn is not None
        group = 1

        def padded_direct(start):
            dflows_in, dmasks_in = direct_flow_fn(start)
            n = dflows_in.shape[0]
            if n == tm1:
                return jnp.asarray(dflows_in), jnp.asarray(dmasks_in)
            dflows = jnp.zeros((tm1, h, w, 2), jnp.float32
                               ).at[:n].set(jnp.asarray(dflows_in))
            dmasks = jnp.zeros((tm1, h, w), jnp.float32
                               ).at[:n].set(jnp.asarray(dmasks_in))
            return dflows, dmasks

        def dispatch_one(start):
            dflows, dmasks = padded_direct(start)
            return _dual_start_program(
                flows_fwd, flows_bwd, jnp.asarray(start, jnp.int32),
                dflows, dmasks, threshold=threshold,
                direct_threshold=direct_flow_threshold, min_len=min_len)

        def dispatch_group(gstarts):
            outs = [dispatch_one(s) for s in gstarts]
            return tuple(list(x) for x in zip(*outs))

    occupied = {"f": np.zeros((t, h, w), bool),
                "u": np.zeros((t, h, w), bool)}
    collected = {"f": [], "u": []}
    starts = list(range(t - (min_len - 1)))
    # fixed-size start groups (last group padded by repeating its final
    # start; the duplicate slots are skipped at harvest) so ONE program
    # serves every group
    groups = [starts[i:i + group] for i in range(0, len(starts), group)]
    padded_groups = [g + [g[-1]] * (group - len(g)) for g in groups]
    iterator = groups
    if progress:
        from tqdm import tqdm
        iterator = tqdm(groups, desc="chaining trajectories (dual)")

    def harvest(key, timeline, keep_dev, start):
        elig = ~masks[start]
        if look_behind:
            elig = elig | ~occupied[key][start]
        ki = np.flatnonzero(np.asarray(keep_dev).ravel() & elig.ravel())
        if not ki.size:
            return
        cap = max(1024, 1 << int(np.ceil(np.log2(ki.size))))
        idx = np.zeros(min(cap, h * w), np.int32)
        idx[: ki.size] = ki
        trajs = np.asarray(_gather_columns(timeline, jnp.asarray(idx)))
        trajs = trajs[:, : ki.size, :]  # t×K×2
        collected[key].append(
            np.transpose(trajs, (1, 0, 2)).astype(np.float32))
        if look_behind:
            from ..utils.native_traj import occupancy_update
            if not occupancy_update(trajs, occupied[key], start):
                kept_valid = ~np.isnan(trajs).any(axis=-1)  # t×K
                coords = np.round(np.nan_to_num(trajs)).astype(np.int64)
                xi = np.clip(coords[..., 0], 0, w - 1)
                yi = np.clip(coords[..., 1], 0, h - 1)
                for f in range(start, t):
                    sel = kept_valid[f]
                    occupied[key][f, yi[f, sel], xi[f, sel]] = True

    if mesh is not None:
        inner = dispatch_group

        def dispatch_group(gstarts):
            with mesh:
                return inner(gstarts)

    # double buffer: the next group's whole-program dispatch is enqueued
    # (JAX dispatch is async) before this group's host-blocking
    # fetch/assembly
    pending = dispatch_group(padded_groups[0]) if groups else None
    for i, g in enumerate(iterator):
        tl_f, tl_u, keep_f, keep_u = pending
        if i + 1 < len(groups):
            pending = dispatch_group(padded_groups[i + 1])
        # ONE host fetch per keep stack per group (vs one per start) — the
        # per-fetch relay round trip was a measured slice of the stage
        keep_f, keep_u = np.asarray(keep_f), np.asarray(keep_u)
        for k, start in enumerate(g):  # padding duplicates not in g
            harvest("f", tl_f[k], keep_f[k], start)
            harvest("u", tl_u[k], keep_u[k], start)

    def assemble(key):
        if not collected[key]:
            return np.full((0, t, 2), np.nan, np.float32)
        return np.concatenate(collected[key], axis=0)

    return assemble("f"), assemble("u")

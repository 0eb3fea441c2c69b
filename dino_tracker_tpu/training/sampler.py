"""Trajectory point-pair sampler — fully jitted, PRNG-key driven.

Redesign of the reference DinoTrackerSampler (data/dataset.py:56-258) for
XLA: trajectories live on-device as N×T×2 arrays with NaN→(coords, valid
mask) decomposition done once at load; each step samples ``num_frames``
random frames, keeps trajectories visible in ≥2 of them (rejection via
lax.while_loop — static shapes, only the key is carried), picks ``batch``
trajectories uniformly without replacement (Gumbel top-k) and 2 visible
frames each (multinomial without replacement == Gumbel top-2 over the
visibility mask).

The reference pages 200k-trajectory windows between CPU and GPU
(data/dataset.py:70-98); on TPU we keep everything in HBM (a 500k×80-frame
trajectory set is ~320 MB) and the "windowing" knob becomes optional
host-side subsampling at load.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TrajectoryBank(NamedTuple):
    """Device-resident trajectories: coords (NaNs replaced by 0) + validity."""
    coords: jnp.ndarray   # N×T×2 float32
    valid: jnp.ndarray    # N×T bool — True where the trajectory exists
    count: jnp.ndarray    # scalar int32 — number of real rows (rest padding)


def build_bank(trajectories_nt2: np.ndarray, pad_to: int = None) -> TrajectoryBank:
    """Host-side prep: drop trajectories with <2 valid frames (reference
    data/dataset.py:100-106), replace NaNs, optionally pad rows to a static
    size."""
    valid = ~np.isnan(trajectories_nt2).any(axis=-1)
    keep = valid.sum(axis=1) > 1
    traj = np.nan_to_num(trajectories_nt2[keep], nan=0.0).astype(np.float32)
    valid = valid[keep]
    n = traj.shape[0]
    if pad_to is not None and pad_to > n:
        t = traj.shape[1]
        traj = np.concatenate([traj, np.zeros((pad_to - n, t, 2), np.float32)])
        valid = np.concatenate([valid, np.zeros((pad_to - n, t), bool)])
    return TrajectoryBank(jnp.asarray(traj), jnp.asarray(valid),
                          jnp.asarray(n, jnp.int32))


class SampledPoints(NamedTuple):
    t1_points: jnp.ndarray  # B×3 (x, y, t) pixel coords + absolute frame
    t2_points: jnp.ndarray  # B×3


def _sample_bank(key, bank: TrajectoryBank, num_frames: int, batch: int
                 ) -> SampledPoints:
    n, t = bank.valid.shape
    if batch == 0:
        z = jnp.zeros((0, 3), jnp.float32)
        return SampledPoints(z, z)
    if n == 0:
        raise ValueError("cannot sample from an empty trajectory bank — "
                         "use resolve_fg_batch to route the quota to the "
                         "non-empty bank")
    row_valid = jnp.arange(n) < bank.count

    def try_frames(carry):
        key, _, _, tries = carry
        key, sub = jax.random.split(key)
        frame_idx = jax.random.choice(sub, t, (num_frames,), replace=False)
        vis = bank.valid[:, frame_idx]  # N×F
        eligible = (jnp.sum(vis, axis=1) >= 2) & row_valid
        return key, frame_idx, eligible, tries + 1

    def cond(carry):
        _, _, eligible, tries = carry
        # bounded retry: tiny banks (e.g. few surviving trajectories) may
        # never expose 2 eligible rows for some frame draws — give up after
        # 32 tries and fall back to the replace-by-best rule below
        return (jnp.sum(eligible) < 2) & (tries < 32)

    init = try_frames((key, jnp.zeros((num_frames,), jnp.int32),
                       jnp.zeros((n,), bool), jnp.asarray(0, jnp.int32)))
    key, frame_idx, eligible, _ = jax.lax.while_loop(
        cond, lambda c: try_frames(c), init)

    def fallback(args):
        # 32-try bailout with zero eligible rows: draw the frames from row
        # 0's own visibility (build_bank guarantees every real row has ≥2
        # valid frames), which makes at least row 0 eligible — otherwise
        # traj_idx degenerates to an arbitrary/padding row and top-2 picks
        # invisible frames, feeding (0,0) coords into the loss
        key, frame_idx, _ = args
        key, sub = jax.random.split(key)
        g = (jax.random.gumbel(sub, (t,))
             + jnp.where(bank.valid[0], 0.0, -jnp.inf))
        _, fidx = jax.lax.top_k(g, num_frames)
        fidx = fidx.astype(frame_idx.dtype)
        vis = bank.valid[:, fidx]
        return key, fidx, (jnp.sum(vis, axis=1) >= 2) & row_valid

    key, frame_idx, eligible = jax.lax.cond(
        jnp.sum(eligible) == 0, fallback, lambda a: a,
        (key, frame_idx, eligible))

    key, k_traj, k_frames = jax.random.split(key, 3)
    # uniform w/o replacement among eligible trajectories; banks smaller than
    # the batch wrap around (sampling with replacement across tiles)
    k = min(batch, n)
    scores = jax.random.gumbel(k_traj, (n,)) + jnp.where(eligible, 0.0, -jnp.inf)
    _, traj_idx = jax.lax.top_k(scores, k)  # k
    # if eligible < k, trailing picks are ineligible — replace by the best
    n_eligible = jnp.sum(eligible)
    traj_idx = jnp.where(jnp.arange(k) < n_eligible, traj_idx, traj_idx[0])
    if k < batch:
        traj_idx = jnp.resize(traj_idx, (batch,))

    # multinomial(2, replacement=False) over visibility at the chosen frames
    vis = bank.valid[traj_idx][:, frame_idx]  # B×F
    g = jax.random.gumbel(k_frames, vis.shape) + jnp.where(vis, 0.0, -jnp.inf)
    _, top2 = jax.lax.top_k(g, 2)  # B×2 indices into frame_idx
    t1 = frame_idx[top2[:, 0]]
    t2 = frame_idx[top2[:, 1]]

    t1_xy = bank.coords[traj_idx, t1]
    t2_xy = bank.coords[traj_idx, t2]
    t1_points = jnp.concatenate([t1_xy, t1[:, None].astype(jnp.float32)], axis=1)
    t2_points = jnp.concatenate([t2_xy, t2[:, None].astype(jnp.float32)], axis=1)
    return SampledPoints(t1_points, t2_points)


class TrainSample(NamedTuple):
    frames_set_t: jnp.ndarray          # S absolute frame indices (padded set)
    source_frame_indices: jnp.ndarray  # B indices into frames_set_t
    target_frame_indices: jnp.ndarray  # B
    t1_points: jnp.ndarray             # B×3 (x, y, t_normalized(-1,1))
    t2_points_normalized: jnp.ndarray  # B×3 in (-1,1)
    target_times: jnp.ndarray          # B absolute frames


def resolve_fg_batch(fg_bank: TrajectoryBank, bg_bank: TrajectoryBank,
                     batch_size: int, fg_traj_ratio: float) -> int:
    """Host-side (pre-jit) split of the point budget between banks.

    The reference hard-assumes both banks are non-empty
    (data/dataset.py:211-232 builds one sub-sampler per bank); real videos
    can legitimately yield an empty side (mask covers everything / nothing),
    so an empty bank routes its quota to the other side instead of crashing."""
    n_fg = int(fg_bank.count)
    n_bg = int(bg_bank.count)
    if n_fg == 0 and n_bg == 0:
        raise ValueError("both trajectory banks are empty — no flow "
                         "supervision available for this video")
    fg_batch = int(batch_size * fg_traj_ratio)
    if n_fg == 0:
        return 0
    if n_bg == 0:
        return batch_size
    return fg_batch


def sample_batch(key, fg_bank: TrajectoryBank, bg_bank: TrajectoryBank,
                 batch_size: int, num_frames: int, fg_traj_ratio: float,
                 video_len: int, video_w: int, video_h: int,
                 fg_batch: int = None) -> TrainSample:
    """One training batch (reference DinoTrackerSampler.forward,
    data/dataset.py:233-258). frames_set_t is padded to 2*num_frames entries
    (duplicate frames repeat the first frame — harmless extra conv rows).

    ``fg_batch`` overrides the ratio-derived split (see resolve_fg_batch);
    callers under jit must pass a static int."""
    kf, kb = jax.random.split(key)
    if fg_batch is None:
        fg_batch = int(batch_size * fg_traj_ratio)
    bg_batch = batch_size - fg_batch
    fg = _sample_bank(kf, fg_bank, num_frames, fg_batch)
    bg = _sample_bank(kb, bg_bank, num_frames, bg_batch)
    t1_points = jnp.concatenate([fg.t1_points, bg.t1_points], axis=0)
    t2_points = jnp.concatenate([fg.t2_points, bg.t2_points], axis=0)

    set_size = 2 * num_frames
    all_t = jnp.concatenate([t1_points[:, 2], t2_points[:, 2]]).astype(jnp.int32)
    frames_set_sorted = jnp.unique(all_t, size=set_size, fill_value=video_len)
    # searchsorted on the sorted padded set (fill slots sit at the end with
    # value video_len and are never matched by real queries)
    source_frame_indices = jnp.searchsorted(frames_set_sorted,
                                            t1_points[:, 2].astype(jnp.int32))
    target_frame_indices = jnp.searchsorted(frames_set_sorted,
                                            t2_points[:, 2].astype(jnp.int32))
    # then make fill slots point at a real frame for the embedding gather
    frames_set_t = jnp.where(frames_set_sorted >= video_len,
                             frames_set_sorted[0], frames_set_sorted)

    normalizer = jnp.asarray([video_w - 1, video_h - 1, video_len - 1],
                             jnp.float32)
    t1_norm = 2.0 * t1_points / normalizer - 1.0
    t2_norm = 2.0 * t2_points / normalizer - 1.0
    # reference keeps t1 x/y in pixels but normalizes its t (dataset.py:246)
    t1_out = jnp.concatenate([t1_points[:, :2], t1_norm[:, 2:3]], axis=1)
    return TrainSample(frames_set_t, source_frame_indices,
                       target_frame_indices, t1_out, t2_norm, t2_points[:, 2])


class BankRotator:
    """Host-RAM trajectory windowing for long videos.

    The reference pages 200k-trajectory windows between CPU and GPU
    (data/dataset.py:70-131, ``keep_traj_in_cpu`` / ``load_next_batch``);
    here the full set stays in host RAM and fixed-size windows rotate into
    HBM — padded to the window size so the jitted train step never
    recompiles.
    """

    def __init__(self, fg_trajectories: np.ndarray, bg_trajectories: np.ndarray,
                 window: int = 200_000):
        self.window = window
        self._fg = self._prep(fg_trajectories)
        self._bg = self._prep(bg_trajectories)
        self._fg_idx = 0
        self._bg_idx = 0

    @staticmethod
    def _prep(traj):
        valid = ~np.isnan(traj).any(axis=-1)
        keep = valid.sum(axis=1) > 1
        return traj[keep]

    def _window(self, traj, start):
        n = traj.shape[0]
        if n <= self.window:
            return build_bank(traj, pad_to=self.window)
        idx = (start + np.arange(self.window)) % n
        return build_bank(traj[idx], pad_to=self.window)

    def current(self):
        return (self._window(self._fg, self._fg_idx),
                self._window(self._bg, self._bg_idx))

    def advance(self):
        """Rotate to the next window (reference ``load_next_batch``)."""
        self._fg_idx = (self._fg_idx + self.window) % max(self._fg.shape[0], 1)
        self._bg_idx = (self._bg_idx + self.window) % max(self._bg.shape[0], 1)
        return self.current()

"""Split trajectories into foreground / background by the mask value at each
trajectory's first valid frame (reference
preprocessing/split_trajectories_to_fg_bg.py:55-78), fully vectorized."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def trajectory_start_indices(trajectories_nt2: np.ndarray) -> np.ndarray:
    """First valid timestep per trajectory (reference ``generate_start_end``,
    split_trajectories_to_fg_bg.py:9-35)."""
    valid = ~np.isnan(trajectories_nt2).any(axis=-1)  # N×T
    return np.argmax(valid, axis=1)


def generate_start_end(trajectories_nt2: np.ndarray) -> np.ndarray:
    """(first, last) valid timestep per trajectory — N×2 (reference
    split_trajectories_to_fg_bg.py:9-35 / data/dataset.py:134-160)."""
    valid = ~np.isnan(trajectories_nt2).any(axis=-1)
    t = valid.shape[1]
    first = np.argmax(valid, axis=1)
    last = t - 1 - np.argmax(valid[:, ::-1], axis=1)
    return np.stack([first, last], axis=1)


def split_fg_bg(trajectories_nt2: np.ndarray, masks_thw: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (fg_trajectories, bg_trajectories)."""
    starts = trajectory_start_indices(trajectories_nt2)
    n = trajectories_nt2.shape[0]
    pts = trajectories_nt2[np.arange(n), starts]  # N×2
    pts = np.round(np.nan_to_num(pts)).astype(np.int64)
    h, w = masks_thw.shape[1:]
    xi = np.clip(pts[:, 0], 0, w - 1)
    yi = np.clip(pts[:, 1], 0, h - 1)
    at_start = masks_thw[starts, yi, xi]
    is_fg = at_start > 0
    return trajectories_nt2[is_fg], trajectories_nt2[~is_fg]

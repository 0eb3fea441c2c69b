"""Native occupancy update vs the NumPy reference path."""

import numpy as np
import pytest

from dino_tracker_tpu.utils import native_traj

RNG = np.random.default_rng(7)


def numpy_reference(trajs, occupied, start):
    t, k, _ = trajs.shape
    h, w = occupied.shape[1:]
    kept_valid = ~np.isnan(trajs).any(axis=-1)
    coords = np.round(np.nan_to_num(trajs)).astype(np.int64)
    xi = np.clip(coords[..., 0], 0, w - 1)
    yi = np.clip(coords[..., 1], 0, h - 1)
    for f in range(start, t):
        sel = kept_valid[f]
        occupied[f, yi[f, sel], xi[f, sel]] = True


@pytest.mark.parametrize("start", [0, 3])
def test_occupancy_update_matches_numpy(start):
    if native_traj.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    t, k, h, w = 8, 500, 37, 53
    trajs = (RNG.random((t, k, 2)) * [w + 4, h + 4] - 2).astype(np.float32)
    trajs[RNG.random((t, k)) < 0.3] = np.nan  # dead timesteps
    # include exact .5 values to exercise round-half-even parity
    trajs[0, :50] = np.float32([12.5, 7.5])
    trajs[1, :50] = np.float32([13.5, 8.5])

    ref = np.zeros((t, h, w), bool)
    numpy_reference(trajs, ref, start)
    ours = np.zeros((t, h, w), bool)
    assert native_traj.occupancy_update(trajs, ours, start)
    np.testing.assert_array_equal(ours, ref)
    # frames before start untouched
    assert not ours[:start].any()


def test_occupancy_update_accumulates():
    if native_traj.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    t, k, h, w = 4, 50, 10, 12
    occ = np.zeros((t, h, w), bool)
    a = np.full((t, k, 2), np.nan, np.float32)
    a[2, 0] = [3.0, 4.0]
    assert native_traj.occupancy_update(a, occ, 0)
    b = np.full((t, k, 2), np.nan, np.float32)
    b[3, 1] = [5.0, 6.0]
    assert native_traj.occupancy_update(b, occ, 0)
    assert occ[2, 4, 3] and occ[3, 6, 5]
    assert occ.sum() == 2

"""Coordinate-math parity tests vs the reference formulas (computed in torch/NumPy)."""

import numpy as np
import torch
import jax.numpy as jnp

from dino_tracker_tpu.utils import coords
from dino_tracker_tpu.config import feature_grid_size

RNG = np.random.default_rng(1)


def torch_range_normalizer(shapes):
    return torch.tensor(shapes).float() - 1


def test_range_normalize_roundtrip():
    shapes = (854.0, 476.0, 50.0)
    nrm = coords.make_range_normalizer(shapes)
    x = np.stack([RNG.random(32) * 853, RNG.random(32) * 475,
                  RNG.random(32) * 49], axis=-1).astype(np.float32)
    y = coords.normalize_range(jnp.asarray(x), nrm, dst=(-1, 1))
    # reference math (data/dataset.py:21-37)
    tn = torch_range_normalizer(shapes)
    ref = torch.from_numpy(x.copy())
    ref = ref / tn
    ref = 2 * ref - 1
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), atol=1e-6)

    back = coords.unnormalize_range(y, nrm, src=(-1, 1))
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


def test_range_normalize_partial_dims():
    shapes = (854.0, 476.0, 50.0)
    nrm = coords.make_range_normalizer(shapes)
    x = RNG.random((8, 3)).astype(np.float32) * 100
    y = coords.normalize_range(jnp.asarray(x), nrm, dst=(0, 1), dims=(0, 1))
    np.testing.assert_allclose(np.asarray(y)[:, 2], x[:, 2])  # untouched
    np.testing.assert_allclose(np.asarray(y)[:, 0], x[:, 0] / 853.0, atol=1e-6)


def test_normalize_points_for_sampling_reference_math():
    """Exact reference math from models/tracker.py:77-94."""
    h, w, patch_size, stride = 476, 854, 14, 7
    pts = np.stack([RNG.random(64) * (w - 1), RNG.random(64) * (h - 1),
                    RNG.random(64) * 49], axis=-1).astype(np.float32)
    ours = coords.normalize_points_for_sampling(jnp.asarray(pts), h, w,
                                                patch_size, stride)
    last_coord_h = ((h - patch_size) // stride) * stride + (patch_size / 2)
    last_coord_w = ((w - patch_size) // stride) * stride + (patch_size / 2)
    ah = 2 / (last_coord_h - (patch_size / 2))
    aw = 2 / (last_coord_w - (patch_size / 2))
    bh = 1 - last_coord_h * 2 / (last_coord_h - (patch_size / 2))
    bw = 1 - last_coord_w * 2 / (last_coord_w - (patch_size / 2))
    a = torch.tensor([[aw, ah, 1]])
    b = torch.tensor([[bw, bh, 0]])
    ref = a * torch.from_numpy(pts) + b
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)
    # patch centers map to the grid corners
    corner = coords.normalize_points_for_sampling(
        jnp.asarray([[7.0, 7.0, 0.0]]), h, w, patch_size, stride)
    np.testing.assert_allclose(np.asarray(corner)[0, :2], [-1.0, -1.0], atol=1e-6)


def test_feature_grid_size():
    assert feature_grid_size(476, 854) == (67, 121)


def test_vit_feature_coords_and_bb_meshgrid_agree_at_default_res():
    a = np.asarray(coords.vit_feature_coords(476, 854))
    b = np.asarray(coords.bb_meshgrid(476, 854))
    assert a.shape == (67 * 121, 2)
    np.testing.assert_allclose(a, b)
    assert a[0].tolist() == [7.0, 7.0]
    assert a[-1].tolist() == [847.0, 469.0]


def test_soft_argmax_pixel_grid_matches_reference_bounds():
    """gen_grid bounds from models/networks/tracker_head.py:68-77."""
    import math
    video_h, video_w, patch_size, step = 476, 854, 14, 7
    grid = np.asarray(coords.soft_argmax_pixel_grid(video_h, video_w,
                                                    patch_size, step))
    h_start = patch_size // 2
    h_end = ((video_h - 2 * h_start) // step) * step + h_start + math.ceil(step / 2)
    ys = torch.arange(h_start, h_end, step)
    w_end = ((video_w - 2 * h_start) // step) * step + h_start + math.ceil(step / 2)
    xs = torch.arange(h_start, w_end, step)
    assert grid.shape == (len(ys), len(xs), 2)
    # must exactly match the corr-map feature grid size so that heatmap
    # weights align with pixel coordinates
    assert grid.shape[:2] == feature_grid_size(video_h, video_w)
    np.testing.assert_allclose(grid[:, 0, 1], ys.numpy())
    np.testing.assert_allclose(grid[0, :, 0], xs.numpy())

"""Coordinate systems and normalizers.

Three coordinate frames coexist in the pipeline:
  1. *pixel* coords (x, y) in the model-resolution video (854×476 default);
  2. *normalized* coords in (0,1) or (-1,1), affine per-axis over [0, size-1]
     (reference data/dataset.py:5-53 ``RangeNormalizer``);
  3. the *ViT feature grid*: patch centers at ``patch/2 + k*stride`` pixels —
     sampling the feature video requires mapping pixel coords onto this grid
     (reference models/tracker.py:77-94 ``normalize_points_for_sampling``).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp


# ----------------------------------------------------------------------------
# RangeNormalizer
# ----------------------------------------------------------------------------

def make_range_normalizer(shapes: Sequence[float]) -> jnp.ndarray:
    """shapes = (W, H[, T]); returns the per-dim scale array ``size - 1``."""
    return jnp.asarray(shapes, dtype=jnp.float32) - 1.0


def normalize_range(x, normalizer, dst=(0.0, 1.0), dims=(0, 1, 2)):
    """Affine-map selected trailing-dim entries of ``x`` [B×D] to ``dst``.

    x[:, d] in [0, shapes[d]-1] -> dst. Mirrors reference
    data/dataset.py:21-37.
    """
    dims = tuple(dims)
    d = x.shape[-1]
    scale = jnp.ones((d,), dtype=x.dtype)
    off = jnp.zeros((d,), dtype=x.dtype)
    sel = jnp.zeros((d,), dtype=bool).at[jnp.asarray(dims)].set(True)
    norm = jnp.where(sel, normalizer[:d], 1.0)
    scale = jnp.where(sel, (dst[1] - dst[0]) / norm, scale)
    off = jnp.where(sel, dst[0], off)
    return x * scale + off


def unnormalize_range(x, normalizer, src=(0.0, 1.0), dims=(0, 1, 2)):
    """Inverse of :func:`normalize_range` (reference data/dataset.py:39-53)."""
    dims = tuple(dims)
    d = x.shape[-1]
    sel = jnp.zeros((d,), dtype=bool).at[jnp.asarray(dims)].set(True)
    norm = jnp.where(sel, normalizer[:d], 1.0)
    scale = jnp.where(sel, norm / (src[1] - src[0]), jnp.ones((d,), x.dtype))
    off = jnp.where(sel, -src[0] * norm / (src[1] - src[0]), jnp.zeros((d,), x.dtype))
    return x * scale + off


# ----------------------------------------------------------------------------
# ViT feature-grid mapping
# ----------------------------------------------------------------------------

def vit_grid_affine(h: int, w: int, patch_size: int = 14, stride: int = 7
                    ) -> Tuple[Tuple[float, float], Tuple[float, float]]:
    """(a, b) per-axis s.t. ``a*px + b`` maps pixel coords onto the [-1, 1]
    feature-grid range: patch-center ``patch/2`` -> -1, last patch center -> 1.

    Exact reference math (models/tracker.py:77-94).
    """
    half = patch_size / 2.0
    last_h = ((h - patch_size) // stride) * stride + half
    last_w = ((w - patch_size) // stride) * stride + half
    ah = 2.0 / (last_h - half)
    aw = 2.0 / (last_w - half)
    bh = 1.0 - last_h * 2.0 / (last_h - half)
    bw = 1.0 - last_w * 2.0 / (last_w - half)
    return (aw, ah), (bw, bh)


def normalize_points_for_sampling(points, h: int, w: int,
                                  patch_size: int = 14, stride: int = 7):
    """Map [..., 3] (x, y, t) pixel points onto the feature grid's [-1,1]
    x/y range; t is passed through (reference models/tracker.py:77-94)."""
    (aw, ah), (bw, bh) = vit_grid_affine(h, w, patch_size, stride)
    a = jnp.asarray([aw, ah, 1.0], dtype=points.dtype)
    b = jnp.asarray([bw, bh, 0.0], dtype=points.dtype)
    return points * a + b


def vit_feature_coords(h: int, w: int, stride: int = 7, patch_size: int = 14):
    """Patch-center pixel coords of the feature grid, flattened row-major to
    N×2 (x, y). Reference models/utils.py:87-95
    ``get_vit_feature_coords_from_mask`` (arange end ``size - half + 1``)."""
    half = patch_size // 2
    x = jnp.arange(half, w - half + 1, stride, dtype=jnp.float32)
    y = jnp.arange(half, h - half + 1, stride, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(x, y)  # H'×W'
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def bb_meshgrid(h: int, w: int, stride: int = 7, patch_size: int = 14):
    """Best-buddy patch-center grid, N×2 (x, y) — same centers, reference
    arange end is ``size`` (preprocessing_dino_bb/dino_bb_utils.py:5-15)."""
    half = patch_size // 2
    x = jnp.arange(half, w, stride, dtype=jnp.float32)
    y = jnp.arange(half, h, stride, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(x, y)
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def soft_argmax_pixel_grid(video_h: int, video_w: int,
                           patch_size: int = 14, step: int = 7):
    """H'×W'×2 (x, y) pixel grid used by the tracker-head soft-argmax.

    Exact reference bounds (models/networks/tracker_head.py:68-77):
    start = patch/2, end = ((size - patch)//step)*step + patch/2 + ceil(step/2).
    """
    h_start = patch_size // 2
    w_start = patch_size // 2
    h_end = ((video_h - 2 * h_start) // step) * step + h_start + math.ceil(step / 2)
    w_end = ((video_w - 2 * w_start) // step) * step + w_start + math.ceil(step / 2)
    ys = jnp.arange(h_start, h_end, step, dtype=jnp.float32)
    xs = jnp.arange(w_start, w_end, step, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # H'×W'
    return jnp.stack([gx, gy], axis=-1)

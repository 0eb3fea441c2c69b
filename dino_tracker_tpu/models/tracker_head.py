"""TrackerHead: correlation-heatmap refinement + masked soft-argmax.

Two spatially-sum-normalized convs refine the B×1×H'×W' correlation map; the
softmax heatmap is then soft-argmaxed inside a radius-35px circle centered on
the *raw* cost volume's hard argmax, on the patch-center pixel grid. Output
coords are normalized to (-1, 1). Behavior spec: reference
models/networks/tracker_head.py:34-121 and conv_norm.py:7-46.

TPU design: the whole head is fused elementwise/conv work on a tiny H'×W'
grid (67×121) — XLA fuses the softmax+mask+weighted-mean into one kernel; the
branchy zero-sum fallback of the reference becomes a branchless where().
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import nn
from ..utils import coords as coord_utils

EPS = 1e-8


def init_tracker_head(key, in_channels: int = 1, hidden_channels: int = 16,
                      out_channels: int = 1, kernel_size: int = 3,
                      dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": nn.kaiming_uniform_conv(k1, hidden_channels, in_channels,
                                         kernel_size, kernel_size, dtype),
        "conv2": nn.kaiming_uniform_conv(k2, out_channels, hidden_channels,
                                         kernel_size, kernel_size, dtype),
    }


def normalized_conv2d(x_nhwc, params, kernel_size: int = 3):
    """Conv whose weights are divided by their per-(out,in) spatial sum
    (reference conv_norm.py:34-46), sign-guarded at |sum| < 1e-8."""
    w = params["w"]  # HWIO
    w_sum = jnp.sum(w, axis=(0, 1), keepdims=True)  # 1×1×I×O
    w_sum = jnp.where(jnp.abs(w_sum) < EPS,
                      jnp.where(w_sum >= 0, EPS, -EPS), w_sum)
    normalized = {"w": w / w_sum, "b": params["b"]}
    return nn.conv2d(x_nhwc, normalized, padding=kernel_size // 2)


def apply_tracker_head(params, cost_volume_b1hw, video_hw: Tuple[int, int],
                       patch_size: int = 14, stride: int = 7,
                       argmax_radius: float = 35.0):
    """cost_volume: B×1×H'×W' (post-ReLU cosine corr) -> B×2 coords in (-1,1)."""
    video_h, video_w = video_hw
    b, _, hp, wp = cost_volume_b1hw.shape

    # hard argmax on the RAW cost volume (pre-refiner) — reference
    # tracker_head.py:115-116
    flat_raw = cost_volume_b1hw[:, 0].reshape(b, hp * wp)
    argmax_flat = jnp.argmax(flat_raw, axis=1)
    row = argmax_flat // wp
    col = argmax_flat % wp

    # refined heatmap: 2 normalized convs + relu, softmax over H'·W'
    x = nn.nchw_to_nhwc(cost_volume_b1hw)
    x = normalized_conv2d(x, params["conv1"])
    x = jax.nn.relu(x)
    x = normalized_conv2d(x, params["conv2"])
    logits = x[..., 0].reshape(b, hp * wp)
    heatmap = jax.nn.softmax(logits, axis=-1).reshape(b, hp, wp)

    # masked soft-argmax on the patch-center pixel grid
    grid = coord_utils.soft_argmax_pixel_grid(video_h, video_w, patch_size,
                                              stride)  # H'×W'×2
    h_start = w_start = patch_size // 2
    argmax_coord = jnp.stack([col * stride + w_start, row * stride + h_start],
                             axis=-1).astype(jnp.float32)  # B×2
    argmax_coord = jax.lax.stop_gradient(argmax_coord)
    dist = jnp.linalg.norm(grid[None] - argmax_coord[:, None, None], axis=-1)
    mask = (dist <= argmax_radius).astype(heatmap.dtype)  # B×H'×W'

    hm = heatmap * mask
    hm_sum = jnp.sum(hm, axis=(1, 2))  # B
    # branchless zero-sum fallback: uniform weight inside the mask
    # (reference tracker_head.py:87-94)
    mask_count = jnp.sum(mask, axis=(1, 2))
    uniform = mask / jnp.maximum(mask_count, 1.0)[:, None, None]
    zero = hm_sum < 1e-8
    hm = jnp.where(zero[:, None, None], uniform, hm)
    hm_sum = jnp.where(zero, jnp.sum(uniform, axis=(1, 2)), hm_sum)

    point = jnp.sum(grid[None] * hm[..., None], axis=(1, 2)) / hm_sum[:, None]

    normalizer = coord_utils.make_range_normalizer((video_w, video_h))
    return coord_utils.normalize_range(point, normalizer, dst=(-1.0, 1.0),
                                       dims=(0, 1))

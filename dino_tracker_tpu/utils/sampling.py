"""Differentiable grid sampling with torch ``grid_sample`` semantics.

The whole pipeline leans on exact ``grid_sample(align_corners=True,
padding_mode='border')`` behavior — trilinear feature sampling (reference
utils.py:75-101 ``bilinear_interpolate_video``), flow warping (reference
data/data_utils.py:62-76 ``bilinear_sampler``), and CNN→ViT feature-grid
alignment (reference models/utils.py:7-45). We implement it once here as
vectorized jnp gathers (XLA fuses these into a single gather + FMA chain) and
parity-test it against torch on CPU.

Conventions: normalized coords in [-1, 1], ``x`` indexes width (last axis).
align_corners=True maps -1 → 0 and +1 → size-1; align_corners=False maps
-1 → -0.5 and +1 → size-0.5.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_2d(img_chw, iy, ix):
    """img: C×H×W, iy/ix: int arrays of shape S -> C×S gather."""
    c, h, w = img_chw.shape
    flat = img_chw.reshape(c, h * w)
    idx = iy * w + ix
    return jnp.take(flat, idx, axis=1)


def grid_sample_2d(input_chw, grid_s2, align_corners: bool = True,
                   padding_mode: str = "border", mode: str = "bilinear"):
    """Sample a C×H×W image at S normalized (x, y) points -> C×S.

    Matches torch.nn.functional.grid_sample for a single image with the grid
    flattened to S points (torch's N/Ho/Wo batching is pure reshape around
    this core).
    """
    c, h, w = input_chw.shape
    x = _unnormalize(grid_s2[..., 0], w, align_corners)
    y = _unnormalize(grid_s2[..., 1], h, align_corners)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, w - 1)
        y = jnp.clip(y, 0.0, h - 1)

    if mode == "nearest":
        # torch rounds half away from zero? it uses floor(x+0.5) semantics via
        # std::nearbyint with default rounding; jnp.round (banker's) differs on
        # exact .5 — use floor(x+0.5) to match torch's static_cast rounding.
        ix = jnp.clip(jnp.floor(x + 0.5), 0, w - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.floor(y + 0.5), 0, h - 1).astype(jnp.int32)
        out = _gather_2d(input_chw, iy, ix)
        if padding_mode == "zeros":
            valid = (x >= -0.5) & (x <= w - 0.5) & (y >= -0.5) & (y <= h - 0.5)
            out = out * valid[None].astype(out.dtype)
        return out

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[None]
    wy = (y - y0)[None]

    def corner(yc, xc):
        iy = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        ix = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        v = _gather_2d(input_chw, iy, ix)
        if padding_mode == "zeros":
            valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
            v = v * valid[None].astype(v.dtype)
        return v

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample_nchw(input_nchw, grid_nhw2, align_corners: bool = True,
                     padding_mode: str = "border", mode: str = "bilinear"):
    """Batched torch-layout grid_sample: N×C×H×W, N×Ho×Wo×2 -> N×C×Ho×Wo."""
    n, c, h, w = input_nchw.shape
    ho, wo = grid_nhw2.shape[1:3]
    import jax
    out = jax.vmap(
        lambda img, g: grid_sample_2d(img, g.reshape(-1, 2), align_corners,
                                      padding_mode, mode)
    )(input_nchw, grid_nhw2)
    return out.reshape(n, c, ho, wo)


def _gather_3d(vol_cthw, it, iy, ix):
    c, t, h, w = vol_cthw.shape
    flat = vol_cthw.reshape(c, t * h * w)
    idx = (it * h + iy) * w + ix
    return jnp.take(flat, idx, axis=1)


def grid_sample_3d(vol_cthw, points_s3, align_corners: bool = True,
                   padding_mode: str = "border"):
    """Trilinear-sample a C×T×H×W volume at S normalized (x, y, t) points -> C×S.

    Matches torch 5-D grid_sample with the grid flattened to S points
    (grid last-dim order is (x, y, z) = (w-coord, h-coord, t-coord)).
    """
    c, t, h, w = vol_cthw.shape
    x = _unnormalize(points_s3[..., 0], w, align_corners)
    y = _unnormalize(points_s3[..., 1], h, align_corners)
    z = _unnormalize(points_s3[..., 2], t, align_corners)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, w - 1)
        y = jnp.clip(y, 0.0, h - 1)
        z = jnp.clip(z, 0.0, t - 1)

    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    wx, wy, wz = (x - x0)[None], (y - y0)[None], (z - z0)[None]

    def corner(zc, yc, xc):
        it = jnp.clip(zc, 0, t - 1).astype(jnp.int32)
        iy = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        ix = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        v = _gather_3d(vol_cthw, it, iy, ix)
        if padding_mode == "zeros":
            valid = ((xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
                     & (zc >= 0) & (zc <= t - 1))
            v = v * valid[None].astype(v.dtype)
        return v

    v000 = corner(z0, y0, x0)
    v001 = corner(z0, y0, x0 + 1)
    v010 = corner(z0, y0 + 1, x0)
    v011 = corner(z0, y0 + 1, x0 + 1)
    v100 = corner(z0 + 1, y0, x0)
    v101 = corner(z0 + 1, y0, x0 + 1)
    v110 = corner(z0 + 1, y0 + 1, x0)
    v111 = corner(z0 + 1, y0 + 1, x0 + 1)

    c00 = v000 * (1 - wx) + v001 * wx
    c01 = v010 * (1 - wx) + v011 * wx
    c10 = v100 * (1 - wx) + v101 * wx
    c11 = v110 * (1 - wx) + v111 * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


def sample_feature_video(features_tchw, points_s3, normalize_t: bool = True,
                         normalize_h: bool = False, normalize_w: bool = False):
    """Sample a T×C×H×W feature video at S (x, y, t) points -> S×C.

    Equivalent to reference utils.py:75-101 ``bilinear_interpolate_video``
    (align_corners=True, border padding): x/y arrive pre-normalized to [-1,1]
    by default; t is a raw frame index normalized here.
    """
    t, c, h, w = features_tchw.shape
    x = points_s3[..., 0]
    y = points_s3[..., 1]
    z = points_s3[..., 2]
    if normalize_w:
        x = x / (w - 1) * 2.0 - 1.0
    if normalize_h:
        y = y / (h - 1) * 2.0 - 1.0
    if normalize_t:
        if t > 1:
            z = z / (t - 1)
        z = z * 2.0 - 1.0
    pts = jnp.stack([x, y, z], axis=-1)
    vol = jnp.transpose(features_tchw, (1, 0, 2, 3))  # C×T×H×W
    out = grid_sample_3d(vol, pts, align_corners=True, padding_mode="border")
    return out.T  # S×C


def sample_feature_video_thwc(features_thwc, points_s3,
                              normalize_t: bool = True):
    """Channels-last twin of :func:`sample_feature_video`: T×H×W×C at S
    (x, y, t) points -> S×C. Same trilinear math and torch semantics
    (align_corners=True, border padding), but the volume is addressed as
    (T·H·W) ROWS of C lanes — on TPU a row gather is a plain DMA (C=1024
    fills the 128-lane registers), where the channels-first form needs the
    whole 265 MB stack transposed to C×(T·H·W) and then gathers along the
    lane axis (a measured 9.1 ms/iter of the r5 train-step trace). The
    backward is a row scatter-add, the TPU-friendly scatter direction.
    """
    t, h, w, c = features_thwc.shape
    x = points_s3[..., 0]
    y = points_s3[..., 1]
    z = points_s3[..., 2]
    if normalize_t:
        if t > 1:
            z = z / (t - 1)
        z = z * 2.0 - 1.0
    x = jnp.clip(_unnormalize(x, w, True), 0.0, w - 1)
    y = jnp.clip(_unnormalize(y, h, True), 0.0, h - 1)
    z = jnp.clip(_unnormalize(z, t, True), 0.0, t - 1)

    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    wz = (z - z0)[:, None]
    flat = features_thwc.reshape(t * h * w, c)

    def corner(zc, yc, xc):
        it = jnp.clip(zc, 0, t - 1).astype(jnp.int32)
        iy = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        ix = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        return flat[(it * h + iy) * w + ix]  # S×C row gather

    c00 = corner(z0, y0, x0) * (1 - wx) + corner(z0, y0, x0 + 1) * wx
    c01 = corner(z0, y0 + 1, x0) * (1 - wx) + corner(z0, y0 + 1, x0 + 1) * wx
    c10 = corner(z0 + 1, y0, x0) * (1 - wx) + corner(z0 + 1, y0, x0 + 1) * wx
    c11 = (corner(z0 + 1, y0 + 1, x0) * (1 - wx)
           + corner(z0 + 1, y0 + 1, x0 + 1) * wx)
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


def bilinear_sampler_pixel(img_nchw, coords_nhw2):
    """Flow-warp helper: sample at *pixel* coords (x, y), align_corners=True.

    Equivalent to reference data/data_utils.py:62-76 ``bilinear_sampler``
    (normalizes pixel coords to [-1,1] then grid_samples with default zeros
    padding... the reference uses torch's default padding_mode='zeros').
    """
    n, c, h, w = img_nchw.shape
    x = 2 * coords_nhw2[..., 0] / (w - 1) - 1
    y = 2 * coords_nhw2[..., 1] / (h - 1) - 1
    grid = jnp.stack([x, y], axis=-1)
    return grid_sample_nchw(img_nchw, grid, align_corners=True,
                            padding_mode="zeros", mode="bilinear")

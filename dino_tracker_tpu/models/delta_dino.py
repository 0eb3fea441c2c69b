"""DeltaDINO: the per-video CNN feature refiner.

A 4-layer CNN (3→64→128→256→1024, k=5, reflect pad, dilation [1,1,1,2],
BlurPool ×3 → total stride 8) whose output is resampled onto the ViT feature
grid and added as a residual to the raw DINO features. The last conv is
zero-initialized and the last BN γ=0.05 so training starts as the identity
refiner. Behavior spec: reference models/networks/delta_dino.py:7-61 and
models/utils.py:7-45 (``align_cnn_vit_features``).

TPU design: the whole stack is one jitted NHWC conv chain (frames batched on
the leading axis and shardable across chips); the CNN→ViT alignment is a
single fused bilinear gather.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import nn
from ..utils.sampling import grid_sample_nchw


CHANNELS = (3, 64, 128, 256, 1024)
DILATIONS = (1, 1, 1, 2)
DOWNSAMPLE = (True, True, True, False)
KERNEL_SIZE = 5
DOWN_STRIDE = 2


def total_stride() -> int:
    return DOWN_STRIDE ** sum(DOWNSAMPLE)


def init_delta_dino(key, channels=CHANNELS, dtype=jnp.float32):
    """Param/batch-stat pytrees. Layer i = conv + BN (+ ReLU if not last)
    (+ BlurPool if DOWNSAMPLE[i]). ``channels[-1]`` must equal the DINO
    embedding dim (1024 for ViT-L)."""
    params, stats = [], []
    keys = jax.random.split(key, len(channels) - 1)
    for i in range(len(channels) - 1):
        is_last = i == len(channels) - 2
        conv = nn.kaiming_uniform_conv(keys[i], channels[i + 1], channels[i],
                                       KERNEL_SIZE, KERNEL_SIZE, dtype)
        if is_last:  # zero-init: refiner starts as identity residual
            conv = {"w": jnp.zeros_like(conv["w"]), "b": jnp.zeros_like(conv["b"])}
        bn_params, bn_stats = nn.init_batchnorm(
            channels[i + 1], gamma=0.05 if is_last else 1.0, dtype=dtype)
        params.append({"conv": conv, "bn": bn_params})
        stats.append(bn_stats)
    return {"layers": params}, {"layers": stats}


def _bilinear_axis_matrix(coords_norm, in_size: int):
    """Dense [out, in] linear-interp matrix for normalized coords in [-1,1]
    with grid_sample align_corners=True + border-clip semantics (host-side
    NumPy — the grid is static)."""
    import numpy as np
    src = (np.asarray(coords_norm, np.float64) + 1.0) * 0.5 * (in_size - 1)
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w = src - lo
    mat = np.zeros((len(src), in_size), np.float32)
    np.add.at(mat, (np.arange(len(src)), lo), 1.0 - w)
    np.add.at(mat, (np.arange(len(src)), hi), w)
    return mat


def align_cnn_vit_features(vit_hw: Tuple[int, int], cnn_features_nchw,
                           vit_patch_size: int = 14, vit_stride: int = 7,
                           cnn_stride: int = 8):
    """Bilinear-resample CNN features onto the ViT patch-center grid.

    Exact reference grid math (models/utils.py:7-45): CNN feature (i, j) sits
    at pixel (i*cnn_stride, j*cnn_stride); ViT feature k at
    k*vit_stride + patch/2; normalized with an extra -1/c_br half-texel shift.

    The grid is separable and static, so the resample is two small dense
    matmuls (MXU-friendly, dense matmul backward) instead of a gather whose
    backward is a TPU-hostile scatter-add over 33M elements.
    """
    import numpy as np
    vh, vw = vit_hw
    ch, cw = cnn_features_nchw.shape[-2:]
    c_br = [(ch - 1) * cnn_stride, (cw - 1) * cnn_stride]
    vit_x = np.arange(vw, dtype=np.float64) * vit_stride + vit_patch_size / 2.0
    vit_y = np.arange(vh, dtype=np.float64) * vit_stride + vit_patch_size / 2.0
    gx = -1.0 - (1.0 / c_br[1]) + (2.0 * vit_x / c_br[1])
    gy = -1.0 - (1.0 / c_br[0]) + (2.0 * vit_y / c_br[0])
    wy = jnp.asarray(_bilinear_axis_matrix(gy, ch))  # vh×ch
    wx = jnp.asarray(_bilinear_axis_matrix(gx, cw))  # vw×cw
    out = jnp.einsum("oh,nchw->ncow", wy, cnn_features_nchw,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("pw,ncow->ncop", wx, out,
                      preferred_element_type=jnp.float32)


def align_cnn_vit_features_nhwc(vit_hw: Tuple[int, int], cnn_features_nhwc,
                                vit_patch_size: int = 14, vit_stride: int = 7,
                                cnn_stride: int = 8):
    """Channels-last twin of :func:`align_cnn_vit_features` (same grid math,
    same dense separable matmuls) for the NHWC residual path — keeping C on
    the minor axis gives the two contractions clean [out,in]×[in, ...·C]
    GEMM shapes and skips the NHWC→NCHW transpose of the refiner output."""
    import numpy as np
    vh, vw = vit_hw
    ch, cw = cnn_features_nhwc.shape[1:3]
    c_br = [(ch - 1) * cnn_stride, (cw - 1) * cnn_stride]
    vit_x = np.arange(vw, dtype=np.float64) * vit_stride + vit_patch_size / 2.0
    vit_y = np.arange(vh, dtype=np.float64) * vit_stride + vit_patch_size / 2.0
    gx = -1.0 - (1.0 / c_br[1]) + (2.0 * vit_x / c_br[1])
    gy = -1.0 - (1.0 / c_br[0]) + (2.0 * vit_y / c_br[0])
    wy = jnp.asarray(_bilinear_axis_matrix(gy, ch))  # vh×ch
    wx = jnp.asarray(_bilinear_axis_matrix(gx, cw))  # vw×cw
    out = jnp.einsum("oh,nhwc->nowc", wy, cnn_features_nhwc,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("pw,nowc->nopc", wx, out,
                      preferred_element_type=jnp.float32)


def apply_delta_dino(params, batch_stats, frames_nchw, vit_hw: Tuple[int, int],
                     train: bool, vit_stride: int = 7, vit_patch_size: int = 14,
                     compute_dtype=jnp.float32, bias_stopgrad: bool = True,
                     reflect_vjp: bool = True, blurpool_impl: str = "matmul",
                     channels_last: bool = False):
    """frames: N×3×H×W in [0,1] -> residual features N×C×vh×vw (or
    N×vh×vw×C with ``channels_last`` — the TPU-native layout the train step
    uses: the conv stack already runs NHWC internally, so channels-last
    output skips the final transpose and keeps every downstream consumer
    (gathers, correlations, trilinear sampling) on C-minor tiles).

    Returns (residual, new_batch_stats). With compute_dtype=bfloat16 the conv
    inputs/weights run on the MXU in bf16 with f32 accumulation; batch-norm
    statistics and the residual output stay f32. ``bias_stopgrad`` /
    ``reflect_vjp`` / ``blurpool_impl`` mirror the TrackerConfig perf fields.
    """
    x = nn.nchw_to_nhwc(frames_nchw)
    new_stats = []
    n_layers = len(params["layers"])
    for i, (layer, stats) in enumerate(zip(params["layers"], batch_stats["layers"])):
        is_last = i == n_layers - 1
        dilation = DILATIONS[i]
        padding = (KERNEL_SIZE + (KERNEL_SIZE - 1) * (dilation - 1)) // 2
        # Every conv here feeds a TRAIN-mode BatchNorm, whose batch-mean
        # subtraction cancels the conv bias EXACTLY — the bias gradient is
        # zero in real arithmetic (the reference's Adam sees only float
        # cancellation noise ~1e-10 on it, models/networks/delta_dino.py).
        # stop_gradient prunes the autodiff reduce_sum that would otherwise
        # read the full-resolution activations per layer (~3.5 ms/iter
        # measured in the r4 device trace). Forward values are unchanged.
        # The identity holds only for batch-statistics normalization, so the
        # pruning is gated on ``train`` — an eval-mode forward differentiates
        # the bias normally.
        if bias_stopgrad and train:
            conv_p = {"w": layer["conv"]["w"],
                      "b": jax.lax.stop_gradient(layer["conv"]["b"])}
        else:
            conv_p = layer["conv"]
        x = nn.conv2d(x.astype(compute_dtype), conv_p, stride=1,
                      dilation=dilation, padding=padding,
                      padding_mode="reflect", reflect_vjp=reflect_vjp)
        x, s = nn.batchnorm(x, layer["bn"], stats, train=train)
        new_stats.append(s)
        if not is_last:
            x = jax.nn.relu(x)
        if DOWNSAMPLE[i]:
            x = nn.blurpool(x, stride=DOWN_STRIDE, impl=blurpool_impl)
    if channels_last:
        x = align_cnn_vit_features_nhwc(vit_hw, x, vit_patch_size, vit_stride,
                                        cnn_stride=total_stride())
    else:
        x = nn.nhwc_to_nchw(x)
        x = align_cnn_vit_features(vit_hw, x, vit_patch_size, vit_stride,
                                   cnn_stride=total_stride())
    return x, {"layers": new_stats}

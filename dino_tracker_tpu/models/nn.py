"""Minimal functional NN primitives (conv / batchnorm / blurpool).

Pure functions over explicit param pytrees — no framework module state. This
keeps every training step a pure jittable function (params, batch_stats) ->
(out, new_batch_stats) and makes torch-checkpoint conversion trivial.

Initialization matches torch defaults (kaiming-uniform a=√5 + fan-in-bound
uniform bias) so that behavior parity with the reference starts at init.

Layout: public arrays are NCHW (the artifact contract); compute is NHWC
(TPU-native conv layout; XLA maps NHWC convs onto the MXU without transposes).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def kaiming_uniform_conv(key, out_ch: int, in_ch: int, kh: int, kw: int,
                         dtype=jnp.float32):
    """torch nn.Conv2d default init: kaiming_uniform(a=√5) weight + uniform bias."""
    wkey, bkey = jax.random.split(key)
    fan_in = in_ch * kh * kw
    gain = math.sqrt(2.0 / (1.0 + 5.0))  # a = sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    # weight layout HWIO (NHWC conv convention)
    w = jax.random.uniform(wkey, (kh, kw, in_ch, out_ch), dtype, -bound, bound)
    bbound = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(bkey, (out_ch,), dtype, -bbound, bbound)
    return {"w": w, "b": b}


def conv2d(x_nhwc, params, stride: int = 1, dilation: int = 1,
           padding: int = 0, padding_mode: str = "zeros", groups: int = 1):
    """2-D conv, NHWC × HWIO -> NHWC. ``padding`` is symmetric spatial pad."""
    if padding > 0 and padding_mode != "zeros":
        mode = {"reflect": "reflect", "replicate": "edge"}[padding_mode]
        x_nhwc = jnp.pad(x_nhwc, ((0, 0), (padding, padding), (padding, padding), (0, 0)),
                         mode=mode)
        pad = "VALID"
    else:
        pad = [(padding, padding), (padding, padding)]
    # bf16 operands: leave preferred_element_type unset — the TPU MXU
    # accumulates bf16 convs in f32 internally and emits bf16, and matching
    # operand/cotangent dtypes keeps the conv differentiable.
    preferred = jnp.float32 if x_nhwc.dtype == jnp.float32 else None
    out = jax.lax.conv_general_dilated(
        x_nhwc, params["w"].astype(x_nhwc.dtype),
        window_strides=(stride, stride),
        padding=pad,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=preferred,
    )
    if "b" in params and params["b"] is not None:
        out = out + params["b"].astype(out.dtype)
    return out


def init_batchnorm(ch: int, gamma: float = 1.0, dtype=jnp.float32):
    params = {"scale": jnp.full((ch,), gamma, dtype),
              "bias": jnp.zeros((ch,), dtype)}
    stats = {"mean": jnp.zeros((ch,), dtype), "var": jnp.ones((ch,), dtype)}
    return params, stats


def batchnorm(x_nhwc, params, stats, train: bool, momentum: float = 0.1,
              eps: float = 1e-5):
    """torch BatchNorm2d semantics: biased batch var for normalization,
    unbiased var for the running-stat update. Returns (out, new_stats).

    Statistics and the affine transform always compute in f32, but the
    output is cast back to the INPUT dtype — under bf16 mixed precision
    this keeps the whole conv→bn→relu→blurpool chain (and, critically, the
    conv backward cotangents) in bf16 on the MXU instead of silently
    promoting everything after the first bn to f32.
    """
    in_dtype = x_nhwc.dtype
    x_nhwc = x_nhwc.astype(jnp.float32)  # stats and affine always in f32
    if train:
        axes = (0, 1, 2)
        # E[x]/E[x²] in one fused pass (sibling reductions) instead of
        # jnp.var's dependent second sweep — the activations here are
        # hundreds of MB, and this reduction pair is a measured slice of
        # the train step. Same formulation cuDNN uses; mild cancellation
        # is fine in f32 for post-conv activations.
        mean = jnp.mean(x_nhwc, axis=axes)
        var = jnp.maximum(jnp.mean(x_nhwc * x_nhwc, axis=axes) - mean * mean,
                          0.0)
        n = x_nhwc.shape[0] * x_nhwc.shape[1] * x_nhwc.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1 - momentum) * stats["mean"] + momentum * jax.lax.stop_gradient(mean),
            "var": (1 - momentum) * stats["var"] + momentum * jax.lax.stop_gradient(unbiased),
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = jax.lax.rsqrt(var + eps)
    out = (x_nhwc - mean) * inv * params["scale"] + params["bias"]
    return out.astype(in_dtype), new_stats


def blurpool_filter(filt_size: int = 4) -> np.ndarray:
    """Binomial anti-aliasing filter (antialiased_cnns.BlurPool default)."""
    a = {1: [1.0], 2: [1.0, 1.0], 3: [1.0, 2.0, 1.0], 4: [1.0, 3.0, 3.0, 1.0],
         5: [1.0, 4.0, 6.0, 4.0, 1.0], 6: [1.0, 5.0, 10.0, 10.0, 5.0, 1.0],
         7: [1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0]}[filt_size]
    f = np.outer(a, a)
    return (f / f.sum()).astype(np.float32)


def blurpool(x_nhwc, stride: int = 2, filt_size: int = 4):
    """Anti-aliased downsampling: reflect-pad + depthwise binomial filter.

    Matches antialiased_cnns.BlurPool (used by the reference DeltaDINO,
    models/networks/delta_dino.py:44): pad (left, right, top, bottom) =
    ((f-1)//2, ceil((f-1)/2)) reflect, depthwise stride ``stride``.

    Implemented as a per-channel grouped conv. (A separable strided-slice
    multiply-add formulation was tried and measured SLOWER inside the full
    train program on TPU — strided slices along the spatial dims tile worse
    than the conv emitter's depthwise lowering.)
    """
    c = x_nhwc.shape[-1]
    pl = (filt_size - 1) // 2
    pr = math.ceil((filt_size - 1) / 2)
    x = jnp.pad(x_nhwc, ((0, 0), (pl, pr), (pl, pr), (0, 0)), mode="reflect")
    filt = jnp.asarray(blurpool_filter(filt_size), dtype=x.dtype)
    w = jnp.tile(filt[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1 (depthwise)
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=preferred,
    )


def nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))

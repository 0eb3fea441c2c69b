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

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _reflect_unpad_axis(g, pl: int, pr: int, axis: int):
    """Transpose of even-symmetric reflect padding along one axis.

    Source row r receives the cotangent of every padded row that mirrors to
    it: rows 1..pl get the left strip flipped, rows n-1-pr..n-2 the right
    strip flipped. Emitted as ONE concatenate (one full write) — the r4
    device trace showed XLA's own pad-transpose as a chain of full-tensor
    slice+add copies costing ~12 ms/iter across the DeltaDINO stack.
    """
    n = g.shape[axis] - pl - pr
    core = jax.lax.slice_in_dim(g, pl, pl + n, axis=axis)
    left = (jnp.flip(jax.lax.slice_in_dim(g, 0, pl, axis=axis), axis=axis)
            if pl else None)
    right = (jnp.flip(jax.lax.slice_in_dim(g, pl + n, pl + n + pr, axis=axis),
                      axis=axis) if pr else None)
    if pl + pr + 2 <= n:  # strip targets disjoint -> single concat
        parts = [jax.lax.slice_in_dim(core, 0, 1, axis=axis)]
        if pl:
            parts.append(jax.lax.slice_in_dim(core, 1, 1 + pl, axis=axis)
                         + left)
        parts.append(jax.lax.slice_in_dim(core, 1 + pl, n - 1 - pr, axis=axis))
        if pr:
            parts.append(jax.lax.slice_in_dim(core, n - 1 - pr, n - 1,
                                              axis=axis) + right)
        parts.append(jax.lax.slice_in_dim(core, n - 1, n, axis=axis))
        return jnp.concatenate(parts, axis=axis)
    # tiny-axis fallback (strip targets overlap): exact, scatter-add form
    out = core
    if pl:
        idx = tuple(slice(1, 1 + pl) if a == axis else slice(None)
                    for a in range(g.ndim))
        out = out.at[idx].add(left)
    if pr:
        idx = tuple(slice(n - 1 - pr, n - 1) if a == axis else slice(None)
                    for a in range(g.ndim))
        out = out.at[idx].add(right)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def reflect_pad2d(x_nhwc, pads: Tuple[Tuple[int, int], Tuple[int, int]]):
    """Reflect-pad H and W of an NHWC tensor; ``pads`` = ((top, bottom),
    (left, right)), torch ReflectionPad2d / np 'reflect' (edge not repeated)
    semantics. Forward is ``jnp.pad``; the custom backward replaces XLA's
    chained full-tensor slice+add pad-transpose with one concatenate per
    axis (~3x less HBM traffic at DeltaDINO shapes).

    The custom backward assumes single-fold reflection (pad ≤ dim−1, the
    torch ReflectionPad2d validity domain); multi-fold pads would need the
    padded rows to mirror more than once."""
    if (pads[0][0] >= x_nhwc.shape[1] or pads[0][1] >= x_nhwc.shape[1]
            or pads[1][0] >= x_nhwc.shape[2] or pads[1][1] >= x_nhwc.shape[2]):
        raise ValueError(
            f"reflect_pad2d: pad {pads} >= spatial dim of {x_nhwc.shape} "
            "(multi-fold reflection unsupported by the custom VJP)")
    return jnp.pad(x_nhwc, ((0, 0), pads[0], pads[1], (0, 0)), mode="reflect")


def _reflect_pad2d_fwd(x_nhwc, pads):
    return reflect_pad2d(x_nhwc, pads), None


def _reflect_pad2d_bwd(pads, _res, g):
    g = _reflect_unpad_axis(g, pads[1][0], pads[1][1], axis=2)
    g = _reflect_unpad_axis(g, pads[0][0], pads[0][1], axis=1)
    return (g,)


reflect_pad2d.defvjp(_reflect_pad2d_fwd, _reflect_pad2d_bwd)


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
           padding: int = 0, padding_mode: str = "zeros", groups: int = 1,
           reflect_vjp: bool = True):
    """2-D conv, NHWC × HWIO -> NHWC. ``padding`` is symmetric spatial pad.

    ``reflect_vjp=False`` falls back to XLA's autodiff pad-transpose instead
    of the one-concat custom backward (TrackerConfig.reflect_pad_vjp)."""
    if padding > 0 and padding_mode != "zeros":
        if padding_mode == "reflect":
            if reflect_vjp:
                x_nhwc = reflect_pad2d(
                    x_nhwc, ((padding, padding), (padding, padding)))
            else:
                x_nhwc = jnp.pad(
                    x_nhwc,
                    ((0, 0), (padding, padding), (padding, padding), (0, 0)),
                    mode="reflect")
        else:
            x_nhwc = jnp.pad(
                x_nhwc, ((0, 0), (padding, padding), (padding, padding), (0, 0)),
                mode={"replicate": "edge"}[padding_mode])
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

    The bf16→f32 convert is written ONCE PER CONSUMER (each reduction and
    the affine pass) instead of as one shared ``x = x.astype(f32)``: a
    shared cast with three consumers gets MATERIALIZED by XLA (an f32 copy
    of the activation — ~1 GB of HBM writes at the L1 shape, 3.9 ms/iter in
    the r5 device trace), while per-consumer converts fuse into each
    reduce/elementwise op. The numeric values are identical.
    """
    in_dtype = x_nhwc.dtype
    if train:
        axes = (0, 1, 2)
        # E[x]/E[x²] in one fused pass (sibling reductions) instead of
        # jnp.var's dependent second sweep — the activations here are
        # hundreds of MB, and this reduction pair is a measured slice of
        # the train step. Same formulation cuDNN uses; mild cancellation
        # is fine in f32 for post-conv activations.
        mean = jnp.mean(x_nhwc, axis=axes, dtype=jnp.float32)
        var = jnp.maximum(
            jnp.mean(jnp.square(x_nhwc.astype(jnp.float32)), axis=axes)
            - mean * mean, 0.0)
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
    out = (x_nhwc.astype(jnp.float32) - mean) * inv * params["scale"] \
        + params["bias"]
    return out.astype(in_dtype), new_stats


def blurpool_filter(filt_size: int = 4) -> np.ndarray:
    """Binomial anti-aliasing filter (antialiased_cnns.BlurPool default)."""
    a = {1: [1.0], 2: [1.0, 1.0], 3: [1.0, 2.0, 1.0], 4: [1.0, 3.0, 3.0, 1.0],
         5: [1.0, 4.0, 6.0, 4.0, 1.0], 6: [1.0, 5.0, 10.0, 10.0, 5.0, 1.0],
         7: [1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0]}[filt_size]
    f = np.outer(a, a)
    return (f / f.sum()).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _blur_reflect_axis_matrix(n_in: int, stride: int, filt_size: int):
    """Banded [n_out, n_in] matrix of the 1-D binomial blur with the
    reflect padding folded into the band positions (np 'reflect' even
    symmetry: padded index p reads source |p - pl| mirrored at n-1).

    The 2-D binomial filter is separable (outer(a,a)/ (Σa)² = (a/Σa)⊗(a/Σa))
    and Σa is a power of two for every filt_size ≤ 5, so the per-axis
    weights are exact binary floats — the factorization introduces no
    rounding of the filter itself."""
    a = np.asarray({1: [1.0], 2: [1.0, 1.0], 3: [1.0, 2.0, 1.0],
                    4: [1.0, 3.0, 3.0, 1.0], 5: [1.0, 4.0, 6.0, 4.0, 1.0],
                    6: [1.0, 5.0, 10.0, 10.0, 5.0, 1.0],
                    7: [1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0]}[filt_size],
                   np.float64)
    a = a / a.sum()
    pl = (filt_size - 1) // 2
    pr = math.ceil((filt_size - 1) / 2)
    n_out = (n_in + pl + pr - filt_size) // stride + 1
    mat = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        for k in range(filt_size):
            s = o * stride + k - pl
            if s < 0:
                s = -s
            if s >= n_in:
                s = 2 * n_in - 2 - s
            mat[o, s] += a[k]
    return mat


def blurpool(x_nhwc, stride: int = 2, filt_size: int = 4,
             impl: str = "matmul"):
    """Anti-aliased downsampling: reflect-pad + depthwise binomial filter.

    Matches antialiased_cnns.BlurPool (used by the reference DeltaDINO,
    models/networks/delta_dino.py:44): pad (left, right, top, bottom) =
    ((f-1)//2, ceil((f-1)/2)) reflect, depthwise stride ``stride``.

    ``impl="matmul"`` (default): two banded dense matmuls over H then W
    with the reflect pad folded into the bands. A depthwise conv has ~16
    MACs/element — HBM-bound, and XLA's depthwise lowering measured 7x off
    the bandwidth bound in the r4 device trace (~8 ms/iter across the three
    DeltaDINO blurpools, fwd+bwd); as dense contractions both passes and
    their transposes ride the MXU. The H-pass accumulates in f32, so the
    only numeric difference vs the conv form is summation order.
    Confirmed by the round-5 on-chip A/B (scripts/perf_toggle_ab.py,
    PERF.md round-5): selected as TrackerConfig.blurpool_impl's default.

    ``impl="pallas"``: the hand-written TPU stencil kernel
    (ops/blurpool.py) — reads each element once, exact f32 accumulation
    (filt_size 4 / stride 2 only; falls back to the matmul form off-TPU).

    ``impl="conv"``: the per-channel grouped-conv form. (A separable
    strided-slice multiply-add formulation was also tried and measured
    SLOWER inside the full train program on TPU — strided slices along the
    spatial dims tile worse than the conv emitter's depthwise lowering.)
    """
    c = x_nhwc.shape[-1]
    pl = (filt_size - 1) // 2
    pr = math.ceil((filt_size - 1) / 2)
    if impl == "pallas" and filt_size == 4 and stride == 2:
        import jax as _jax
        if _jax.default_backend() not in ("cpu",):
            from ..ops.blurpool import blurpool_pallas
            return blurpool_pallas(x_nhwc)
        impl = "matmul"  # interpret-mode kernels are for tests only
    if impl == "matmul":
        h, w = x_nhwc.shape[1], x_nhwc.shape[2]
        mh = jnp.asarray(_blur_reflect_axis_matrix(h, stride, filt_size))
        mw = jnp.asarray(_blur_reflect_axis_matrix(w, stride, filt_size))
        y = jnp.einsum("oh,nhwc->nowc", mh.astype(x_nhwc.dtype), x_nhwc,
                       preferred_element_type=jnp.float32)
        out = jnp.einsum("pw,nowc->nopc", mw, y,
                         preferred_element_type=jnp.float32)
        return out.astype(x_nhwc.dtype)
    x = reflect_pad2d(x_nhwc, ((pl, pr), (pl, pr)))
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

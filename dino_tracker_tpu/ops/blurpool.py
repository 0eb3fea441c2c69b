"""Pallas TPU blurpool: binomial filt=4, stride=2, reflect pad, as two 1-D
stencil passes with a hand-written transpose (backward) stencil.

The production alternative (``models/nn.py blurpool(impl="matmul")``) keeps
the op on the MXU by burning ~30x the stencil FLOPs in dense banded matmuls
— ~8 ms/iter across DeltaDINO's three blurpools (fwd+bwd) in the r5 train
step trace. A stencil pass reads each element once and writes the half-res
output: roofline ~1.2 ms for the L1 shape. Reference behavior spec:
antialiased_cnns.BlurPool as used by the reference DeltaDINO
(models/networks/delta_dino.py:44).

Mosaic constraints that shaped the implementation (all hit in practice):
no >2-D gathers, no stride-2 slices, no sublane-dim reshapes. The stride-2
taps are therefore expressed as an even/odd de-interleave reshape on the
LEADING axis (minor tiled dims untouched) + stride-1 slices + concats, and
the W pass runs the same leading-axis kernel on an (n, w, h, c) transpose
(the XLA transpose keeps C on the lane axis — a cheap sublane permute).

The op is linear, so the VJP needs no residuals: the backward is the
transpose stencil (an upsampling interleave), also as a Pallas kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# binomial [1,3,3,1]/8 — exact binary floats, matches blurpool_filter(4)
A = (1.0 / 8.0, 3.0 / 8.0, 3.0 / 8.0, 1.0 / 8.0)


def _leading_taps(x, h: int):
    """Four ceil(h/2)-row stencil taps t[o] = x[reflect(2o+off)] for
    off in (-1, 0, 1, 2) along the LEADING axis, via even/odd de-interleave
    + stride-1 slices + reflect-edge concats."""
    ho = (h + 1) // 2
    rest = x.shape[1:]
    if h % 2 == 0:
        pairs = x.reshape(h // 2, 2, *rest)
        even = pairs[:, 0]   # rows 0,2,...,h-2  [ho]
        odd = pairs[:, 1]    # rows 1,3,...,h-1  [ho]
        tm1 = jnp.concatenate([odd[0:1], odd[:ho - 1]], axis=0)
        t2 = jnp.concatenate([even[1:], even[ho - 1:ho]], axis=0)
        return tm1, even, odd, t2
    m = h // 2  # odd h: ho = m+1
    pairs = x[:h - 1].reshape(m, 2, *rest)
    even = jnp.concatenate([pairs[:, 0], x[h - 1:h]], axis=0)  # [ho]
    odd = pairs[:, 1]                                          # [m]
    t1 = jnp.concatenate([odd, odd[m - 1:m]], axis=0)
    tm1 = jnp.concatenate([odd[0:1], odd], axis=0)
    t2 = jnp.concatenate([even[1:], even[m - 1:m]], axis=0)
    return tm1, even, t1, t2


def _down_kernel(x_ref, o_ref, *, h: int):
    x = x_ref[0]  # [H, Wt, Ct]
    tm1, t0, t1, t2 = _leading_taps(x, h)
    acc = (A[0] * tm1.astype(jnp.float32) + A[1] * t0.astype(jnp.float32)
           + A[2] * t1.astype(jnp.float32) + A[3] * t2.astype(jnp.float32))
    o_ref[0] = acc.astype(o_ref.dtype)


def _up_kernel(g_ref, o_ref, *, h: int):
    """Transpose of the leading-axis down stencil: g [Ho, ...] -> gx [H, ...].

    Interior (i = 2o+off-... solved for o): even rows get a1·g[i/2] +
    a3·g[i/2−1]; odd rows get a0·g[(i+1)/2] + a2·g[(i−1)/2]. Reflection
    boundary terms: gx[1] += a0·g[0] (the o=0 left tap reflects −1→1), and
    the right-edge taps of the last o reflect back to h−2 / h−3 per parity.
    """
    g = g_ref[0].astype(jnp.float32)  # [Ho, ...]
    ho = g.shape[0]
    rest = g.shape[1:]
    zero = jnp.zeros((1, *rest), jnp.float32)

    def one_hot_row(row, n, idx):
        """[n, ...] tensor that is ``row`` at position idx, zero elsewhere —
        via concat (Mosaic has no scatter; .at[].add lowers to scatter-add)."""
        parts = []
        if idx > 0:
            parts.append(jnp.zeros((idx, *rest), jnp.float32))
        parts.append(row)
        if idx < n - 1:
            parts.append(jnp.zeros((n - 1 - idx, *rest), jnp.float32))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    g_prev = jnp.concatenate([zero, g[:ho - 1]], axis=0)   # g[j-1]
    g_next = jnp.concatenate([g[1:], zero], axis=0)        # g[j+1]

    if h % 2 == 0:
        # j = 0..ho-1 for both parities
        # boundaries: gx[1] += a0 g[0]  (odd j=0);  gx[h-2] += a3 g[ho-1]
        # (even j=ho-1)
        gx_even = (A[1] * g + A[3] * g_prev
                   + one_hot_row(A[3] * g[ho - 1:ho], ho, ho - 1))
        gx_odd = (A[0] * g_next + A[2] * g
                  + one_hot_row(A[0] * g[0:1], ho, 0))
        gx = jnp.stack([gx_even, gx_odd], axis=1).reshape(h, *rest)
    else:
        m = h // 2  # ho = m+1
        # boundaries: gx[1] += a0 g[0]; gx[h-2] += a2 g[m] (odd j=m-1);
        # gx[h-3] += a3 g[m] (even j=m-1)
        gx_even = (A[1] * g + A[3] * g_prev
                   + one_hot_row(A[3] * g[ho - 1:ho], ho, m - 1))  # [ho]
        gx_odd = (A[0] * g[1:] + A[2] * g[:m]
                  + one_hot_row(A[0] * g[0:1], m, 0)
                  + one_hot_row(A[2] * g[ho - 1:ho], m, m - 1))    # [m]
        gx = jnp.concatenate(
            [jnp.stack([gx_even[:m], gx_odd], axis=1).reshape(2 * m, *rest),
             gx_even[m:m + 1]], axis=0)
    o_ref[0] = gx.astype(o_ref.dtype)


def _tiles(rows: int, w: int, c: int, budget_bytes: int = 8 << 20):
    """W/C tile sizes such that a [rows, wt, ct] bf16 block stays under
    ``budget_bytes`` — the raised vmem_limit_bytes (100 MB) must hold the
    double-buffered in+out windows plus the kernel's f32 tap/accumulator
    intermediates (~5x the out window)."""
    ct = min(c, 128)
    wt = max(8, min(w, budget_bytes // (rows * ct * 2) // 8 * 8))
    return wt, ct


def _leading_pass(kernel, x, out_rows: int, interpret: bool):
    n, h, w, c = x.shape
    wt, ct = _tiles(max(h, out_rows), w, c)
    grid = (n, -(-w // wt), -(-c // ct))
    return pl.pallas_call(
        functools.partial(kernel, h=out_rows if kernel is _up_kernel else h),
        grid=grid,
        in_specs=[pl.BlockSpec((1, h, wt, ct), lambda i, j, k: (i, 0, j, k))],
        out_specs=pl.BlockSpec((1, out_rows, wt, ct),
                               lambda i, j, k: (i, 0, j, k)),
        out_shape=jax.ShapeDtypeStruct((n, out_rows, w, c), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            # the tap/concat intermediates live on the kernel stack; the
            # default 16 MB scoped-VMEM limit rejects the L1 column blocks
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def _blur_down_axis1(x, interpret=False):
    return _leading_pass(_down_kernel, x, (x.shape[1] + 1) // 2, interpret)


def _blur_up_axis1(g, h: int, interpret=False):
    return _leading_pass(_up_kernel, g, h, interpret)


def _swap_hw(x):
    return jnp.transpose(x, (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def blurpool_pallas(x_nhwc, interpret: bool = False):
    """Anti-aliased 2x downsample of an NHWC tensor (filt 4, stride 2,
    reflect pad) — numerically the exact f32 stencil (tighter than the
    matmul form, whose f32 MXU contractions round at bf16x3 precision).
    ``interpret`` runs the kernels in Pallas interpret mode (CPU tests)."""
    y = _blur_down_axis1(x_nhwc, interpret)
    y = _swap_hw(_blur_down_axis1(_swap_hw(y), interpret))
    return y


def _fwd(x_nhwc, interpret):
    return blurpool_pallas(x_nhwc, interpret), (x_nhwc.shape[1],
                                                x_nhwc.shape[2])


def _bwd(interpret, res, g):
    h, w = res
    gy = _blur_up_axis1(_swap_hw(g), w, interpret)
    gx = _blur_up_axis1(_swap_hw(gy), h, interpret)
    return (gx,)


blurpool_pallas.defvjp(_fwd, _bwd)

"""RAFT optical flow, reimplemented functionally in JAX.

The reference gets flow from torchvision's ``raft_large``
(preprocessing/extract_trajectories.py:6,182, 24 update iterations). This is
a from-scratch implementation of the RAFT-large architecture (feature/context
encoders, all-pairs correlation pyramid, SepConv GRU update block, convex
upsampling) designed for TPU:

  * the 24-iteration recurrence is a single ``lax.scan`` (one compiled
    program, no per-iter dispatch);
  * the correlation pyramid lookup is a batched gather expressed with the
    shared grid-sample core (utils/sampling.py);
  * image pairs batch on the leading axis and shard across chips for the
    O(T²) direct-flow sweep;
  * flow inference needs no gradients, so everything runs in inference mode
    (instance norm without affine params, batch norm with checkpoint
    statistics).

Weights convert from the canonical princeton-vl RAFT checkpoints
(raft-things.pth layout, ``module.``-prefixed) via
``convert_raft_state_dict``; torchvision's raft_large ships the same
architecture.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .nn import conv2d, kaiming_uniform_conv
from ..utils.sampling import grid_sample_nchw

HDIM = 128
CDIM = 128
CORR_LEVELS = 4
CORR_RADIUS = 4


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def instance_norm(x_nhwc, eps: float = 1e-5):
    """InstanceNorm2d(affine=False) — per sample, per channel over H, W.
    Statistics always in f32 (bf16 mean/var over ~6k positions drifts); the
    output returns in the input dtype so a bf16 conv chain stays bf16."""
    x32 = x_nhwc.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x_nhwc.dtype)


def batch_norm_eval(x_nhwc, p, eps: float = 1e-5):
    out = ((x_nhwc.astype(jnp.float32) - p["mean"])
           * jax.lax.rsqrt(p["var"] + eps) * p["scale"] + p["bias"])
    return out.astype(x_nhwc.dtype)


def _norm(x, p, kind: str):
    if kind == "instance":
        return instance_norm(x)
    if kind == "batch":
        return batch_norm_eval(x, p)
    return x


def _init_bn(ch):
    return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,)),
            "mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}


def _residual_block(p, x, stride: int, norm: str):
    y = jax.nn.relu(_norm(conv2d(x, p["conv1"], stride=stride, padding=1),
                          p.get("norm1"), norm))
    y = jax.nn.relu(_norm(conv2d(y, p["conv2"], stride=1, padding=1),
                          p.get("norm2"), norm))
    if "downsample" in p:
        x = _norm(conv2d(x, p["downsample"]["conv"], stride=stride),
                  p["downsample"].get("norm"), norm)
    return jax.nn.relu(x + y)


def _encoder(p, x_nhwc, norm: str):
    """BasicEncoder: 7×7/2 stem + 3 residual stages (64, 96, 128) + 1×1 out
    conv; total stride 8."""
    x = jax.nn.relu(_norm(conv2d(x_nhwc, p["conv1"], stride=2, padding=3),
                          p.get("norm1"), norm))
    for i, stride in ((1, 1), (2, 2), (3, 2)):
        blocks = p[f"layer{i}"]
        x = _residual_block(blocks[0], x, stride, norm)
        x = _residual_block(blocks[1], x, 1, norm)
    return conv2d(x, p["conv2"])


def init_raft(key) -> dict:
    """Random params in the same tree the converter fills (RAFT-large)."""
    keys = iter(jax.random.split(key, 64))

    def c(cin, cout, k):
        kh, kw = k if isinstance(k, tuple) else (k, k)
        return kaiming_uniform_conv(next(keys), cout, cin, kh, kw)

    def enc(norm: str):
        def block(cin, cout, stride):
            b = {"conv1": c(cin, cout, 3), "conv2": c(cout, cout, 3)}
            if norm == "batch":
                b["norm1"], b["norm2"] = _init_bn(cout), _init_bn(cout)
            if stride > 1 or cin != cout:
                b["downsample"] = {"conv": c(cin, cout, 1)}
                if norm == "batch":
                    b["downsample"]["norm"] = _init_bn(cout)
            return b

        p = {"conv1": c(3, 64, 7), "conv2": c(128, 256, 1),
             "layer1": [block(64, 64, 1), block(64, 64, 1)],
             "layer2": [block(64, 96, 2), block(96, 96, 1)],
             "layer3": [block(96, 128, 2), block(128, 128, 1)]}
        if norm == "batch":
            p["norm1"] = _init_bn(64)
        return p

    corr_ch = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2  # 324
    return {
        "fnet": enc("instance"),
        "cnet": enc("batch"),
        "update": {
            "enc": {"convc1": c(corr_ch, 256, 1), "convc2": c(256, 192, 3),
                    "convf1": c(2, 128, 7), "convf2": c(128, 64, 3),
                    "conv": c(256, 126, 3)},
            # GRU input = hidden(128) + [context(128) ++ motion(128)] = 384
            "gru": {"convz1": c(384, HDIM, (1, 5)), "convr1": c(384, HDIM, (1, 5)),
                    "convq1": c(384, HDIM, (1, 5)), "convz2": c(384, HDIM, (5, 1)),
                    "convr2": c(384, HDIM, (5, 1)), "convq2": c(384, HDIM, (5, 1))},
            "flow_head": {"conv1": c(HDIM, 256, 3), "conv2": c(256, 2, 3)},
            "mask": {"conv1": c(HDIM, 256, 3), "conv2": c(256, 64 * 9, 1)},
        },
    }


# ---------------------------------------------------------------------------
# correlation pyramid
# ---------------------------------------------------------------------------

def build_corr_pyramid(fmap1_nhwc, fmap2_nhwc):
    """All-pairs correlation -> 4-level pyramid.

    Returns list of (B·h1·w1, 1, h_l, w_l) volumes (the lookup treats each
    source pixel as a batch element, matching RAFT's layout).
    """
    b, h, w, c = fmap1_nhwc.shape
    f1 = fmap1_nhwc.reshape(b, h * w, c)
    f2 = fmap2_nhwc.reshape(b, h * w, c)
    corr = jnp.einsum("bnc,bmc->bnm", f1, f2,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.asarray(c, corr.dtype))
    corr = corr.reshape(b * h * w, 1, h, w)
    pyramid = [corr]
    for _ in range(CORR_LEVELS - 1):
        c_ = pyramid[-1]
        hh, ww = c_.shape[-2:]
        if hh < 2 or ww < 2:  # degenerate tiny inputs: stop pooling
            pyramid.append(c_)
            continue
        # avg_pool2d(2) floor semantics: odd trailing row/col dropped
        c_ = c_[:, :, : 2 * (hh // 2), : 2 * (ww // 2)]
        c_ = c_.reshape(-1, 1, hh // 2, 2, ww // 2, 2).mean(axis=(3, 5))
        pyramid.append(c_)
    return pyramid


def _default_lookup_impl() -> str:
    """einsum on TPU (dense one-hot contractions, ~4x the DMA-gather
    kernel — see corr_lookup), per-row gather elsewhere."""
    return "einsum" if jax.default_backend() == "tpu" else "gather"


def prepare_pyramid_for_lookup(pyramid, impl: Optional[str] = None):
    """Put pyramid levels into ``corr_lookup``'s preferred resident layout
    once, BEFORE the GRU loop.

    impl="einsum": raw (N, hl, wl) volumes — the one-hot contractions need
    no padding at all (out-of-range window rows/cols simply match nothing),
    so the multi-GB pad copies of the gather layout disappear entirely.
    impl="gather": the Pallas window-gather kernel's final layout (border +
    lane-128 + row-block pad in one copy; padding inside the loop body
    would rely on XLA hoisting the copies out of the while loop).

    Returns [(vol, (hl, wl), is_kernel_padded), ...]; degenerate tiny
    levels (tests only) stay raw for the grid-sample tap path.
    """
    impl = impl or _default_lookup_impl()
    if impl == "einsum":
        out = []
        for vol in pyramid:
            hl, wl = vol.shape[-2:]
            out.append((vol.reshape(vol.shape[0], hl, wl)
                        if hl >= 2 and wl >= 2 else vol, (hl, wl), False))
        return out
    return pad_pyramid_for_lookup(pyramid)


def pad_pyramid_for_lookup(pyramid):
    """Gather-kernel layout variant of ``prepare_pyramid_for_lookup``."""
    from ..ops.window_gather import BLOCK as _GATHER_BLOCK
    r = CORR_RADIUS
    pad = 2 * r + 2
    out = []
    for vol in pyramid:
        hl, wl = vol.shape[-2:]
        if hl < 2 or wl < 2:
            out.append((vol, (hl, wl), False))
            continue
        n = vol.shape[0]
        w_total = -(-(wl + 2 * pad) // 128) * 128  # right pad ≥ pad always
        n_total = -(-n // _GATHER_BLOCK) * _GATHER_BLOCK
        volp = jnp.pad(vol.reshape(n, hl, wl),
                       ((0, n_total - n), (pad, pad),
                        (pad, w_total - wl - pad)))
        out.append((volp, (hl, wl), True))
    return out


@functools.lru_cache(maxsize=None)
def _combine_matrix(side: int, r: int):
    """Static (side², 4·(2r+1)²) one-hot matrix: column slab δ ∈
    {(0,0),(0,1),(1,0),(1,1)} (δy, δx), channel c = slab·81 + dx·9 + dy
    (the torch corr layout's dx-major order), selects flat patch entry
    (dy+δy)·side + (dx+δx)."""
    import numpy as np
    win = 2 * r + 1
    mat = np.zeros((side * side, 4 * win * win), np.float32)
    for slab, (dy_, dx_) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        for dx in range(win):
            for dy in range(win):
                c = slab * win * win + dx * win + dy
                p = (dy + dy_) * side + (dx + dx_)
                mat[p, c] = 1.0
    # NumPy, NOT jnp: an lru-cached jnp array created inside a trace would
    # leak that trace's tracer into later calls
    return mat


def _window_patches(volp, sy, sx, side: int):
    """Per-row contiguous window extraction, routed by backend: the Pallas
    DMA kernel on TPU (ops/window_gather.py), vmapped dynamic_slice
    elsewhere (XLA's TPU lowering of the same gather is the measured
    raft_decode dominator)."""
    from ..ops.window_gather import window_gather, window_gather_reference
    if jax.default_backend() == "tpu":
        return window_gather(volp, sy, sx, side=side)
    # volp may carry extra block-padding rows (corr_lookup pre-pads to the
    # kernel layout); the vmapped fallback needs matching leading dims
    return window_gather_reference(volp[: sy.shape[0]], sy, sx, side=side)


def _einsum_window(vol_nhw, sy, sx, side: int):
    """Window extraction as two one-hot contractions (the TPU-default
    lookup): rows = R @ map, patch = rows @ C^T with R[p,k,h] = (h==sy+k),
    C[p,j,w] = (w==sx+j).

    Pure dense math — no per-pixel serial loop: the per-row DMA gather
    kernel (ops/window_gather.py) issues ~205k strip copies per GRU iter at
    production shape and is DMA-issue bound at 23.4 ms/iter; this measures
    5.8 ms/iter, bitwise-equal output. Out-of-range rows/cols match no
    one-hot entry and contribute exact zeros — grid_sample zeros-padding
    semantics with no volume padding at all.
    """
    n = sy.shape[0]
    hl, wl = vol_nhw.shape[-2:]
    ks = jnp.arange(side, dtype=jnp.int32)
    hh = jnp.arange(hl, dtype=jnp.int32)
    ww = jnp.arange(wl, dtype=jnp.int32)
    dtype = vol_nhw.dtype
    sel_r = (sy[:, None, None] + ks[None, :, None]
             == hh[None, None, :]).astype(dtype)      # (n, side, hl)
    sel_c = (sx[:, None, None] + ks[None, :, None]
             == ww[None, None, :]).astype(dtype)      # (n, side, wl)
    rows = jnp.einsum("pkh,phw->pkw", sel_r, vol_nhw[:n],
                      preferred_element_type=dtype)
    return jnp.einsum("pkw,pjw->pkj", rows, sel_c,
                      preferred_element_type=dtype)   # (n, side, side)


def corr_lookup(pyramid, coords_b2hw, impl: Optional[str] = None):
    """Sample 9×9 windows at coords/2^l per level -> B×(4·81)×h×w.

    The naive per-tap formulation (81 taps × 4 bilinear corners × 4 levels
    of scalar gathers) is the measured decode dominator — XLA emits
    scalar-gather fusions running at ~1 GiB/s, ~95% of raft_decode wall
    clock. Since all 81 window taps share one fractional offset, we instead
    extract ONE contiguous (2r+2)² patch per source pixel — impl="einsum"
    (TPU default) via two one-hot contractions (``_einsum_window``),
    impl="gather" via the Pallas per-row DMA kernel / vmapped
    ``dynamic_slice`` — and combine the four integer-shifted sub-patches
    with the shared bilinear weights. Both are numerically identical to
    grid_sample(zeros padding).

    Window-channel layout matches princeton-vl/torchvision: channel
    k = i*9+j samples (x + d[i], y + d[j]) — the delta grid's FIRST meshgrid
    axis is the x offset; trained motion-encoder weights expect exactly this
    (transposed-looking) layout, hence the patch transpose below.
    """
    impl = impl or _default_lookup_impl()
    b2, _, h, w = coords_b2hw.shape
    coords = jnp.transpose(coords_b2hw, (0, 2, 3, 1))  # B×h×w×2
    r = CORR_RADIUS
    side = 2 * r + 2  # 10: 9×9 window + 1 for the bilinear +1 shift
    pad = 2 * r + 2   # keeps fully-outside (all-zero) windows inside the pad

    out = []
    for lvl, entry in enumerate(pyramid):
        if isinstance(entry, tuple):  # pre-padded (pad_pyramid_for_lookup)
            vol, (hl, wl), pre_padded = entry
        else:
            vol = entry
            hl, wl = vol.shape[-2:]
            pre_padded = False
        n = vol.shape[0]
        if hl < 2 or wl < 2:
            # degenerate tiny level (tests only): keep the reference tap path
            d = jnp.arange(-r, r + 1, dtype=jnp.float32)
            di, dj = jnp.meshgrid(d, d, indexing="ij")
            delta = jnp.stack([di, dj], axis=-1).reshape(-1, 2)
            centroid = coords.reshape(b2 * h * w, 1, 2) / (2 ** lvl)
            pts = centroid + delta[None]
            gx = (2 * pts[..., 0] / (wl - 1) - 1 if wl > 1
                  else jnp.zeros_like(pts[..., 0]))
            gy = (2 * pts[..., 1] / (hl - 1) - 1 if hl > 1
                  else jnp.zeros_like(pts[..., 1]))
            grid = jnp.stack([gx, gy], axis=-1)[:, None]
            sampled = grid_sample_nchw(vol, grid, align_corners=True,
                                       padding_mode="zeros")
            out.append(sampled.reshape(b2, h, w, -1))
            continue

        c = coords.reshape(-1, 2) / (2 ** lvl)  # (N, 2) pixel (x, y)
        # clamp just past the all-outside boundary: windows beyond it read
        # only zeros (pad region / no one-hot match), matching grid_sample
        # zeros semantics exactly
        cx = jnp.clip(c[:, 0], -(r + 1.0), wl - 1 + r + 1.0)
        cy = jnp.clip(c[:, 1], -(r + 1.0), hl - 1 + r + 1.0)
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fx = (cx - x0).astype(vol.dtype)
        fy = (cy - y0).astype(vol.dtype)
        if impl == "einsum":
            if pre_padded:  # kernel layout handed to the einsum path:
                vol = vol[:, pad:pad + hl, pad:pad + wl]  # recover raw rows
            else:
                vol = vol.reshape(-1, hl, wl)
            sx = (x0 - r).astype(jnp.int32)
            sy = (y0 - r).astype(jnp.int32)
            patch = _einsum_window(vol, sy, sx, side)  # N×10×10 (y, x)
        else:
            if pre_padded:
                volp = vol
            else:
                # one fused pad to the kernel's final layout (prefer
                # prepare_pyramid_for_lookup, which runs it outside the loop)
                from ..ops.window_gather import BLOCK as _GATHER_BLOCK
                w_total = -(-(wl + 2 * pad) // 128) * 128
                n_total = -(-n // _GATHER_BLOCK) * _GATHER_BLOCK
                volp = jnp.pad(vol.reshape(n, hl, wl),
                               ((0, n_total - n), (pad, pad),
                                (pad, w_total - wl - pad)))
            sx = (x0 - r + pad).astype(jnp.int32)
            sy = (y0 - r + pad).astype(jnp.int32)
            patch = _window_patches(volp, sy, sx, side)  # N×10×10 (y, x)
        # Bilinear combine as ONE static one-hot matmul: elementwise ops on
        # (N, 10, 10) run at 10/128 lane utilization (measured ~11 ms/iter
        # of pure VPU waste); (N, 100) @ (100, 4·81) extracts all four
        # integer-shifted 9×9 sub-windows at full MXU width with the
        # dx-major channel permutation folded into the matrix for free.
        p4 = jnp.dot(patch.reshape(-1, side * side),
                     jnp.asarray(_combine_matrix(side, r),
                                 dtype=patch.dtype),
                     preferred_element_type=patch.dtype)  # N×(4·81)
        k2 = (2 * r + 1) ** 2
        w00 = ((1 - fy) * (1 - fx))[:, None]
        w01 = ((1 - fy) * fx)[:, None]
        w10 = (fy * (1 - fx))[:, None]
        w11 = (fy * fx)[:, None]
        win = (w00 * p4[:, :k2] + w01 * p4[:, k2:2 * k2]
               + w10 * p4[:, 2 * k2:3 * k2] + w11 * p4[:, 3 * k2:])
        out.append(win.reshape(b2, h, w, k2))
    return jnp.concatenate(out, axis=-1)  # B×h×w×324


# ---------------------------------------------------------------------------
# update block
# ---------------------------------------------------------------------------

_LANE = 128


def _ceil_lane(n: int) -> int:
    return -(-n // _LANE) * _LANE


def _pad_ch(x, target: int):
    """Zero-pad the trailing (channel) axis to ``target``."""
    c = x.shape[-1]
    if c == target:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, target - c)])


def _conv_lane(x, p, padding: int = 0):
    """Conv with in/out channels zero-padded to multiples of the 128-wide
    vector lane. Exact: padded input channels are zeros (contribute nothing),
    padded output channels carry zero weights and bias.

    Measured on TPU v5e: convs whose channel counts are off the 128 lane
    (RAFT's 324/192/126/64-channel update block) lower ~50-100× below MXU
    rate, while 128-multiples run at full speed — this padding is what makes
    the per-pair GRU recurrence MXU-bound instead of layout-bound."""
    w, b = p["w"], p["b"]
    cin, cout = w.shape[2], w.shape[3]
    cin_p, cout_p = _ceil_lane(cin), _ceil_lane(cout)
    w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin), (0, cout_p - cout)))
    b = _pad_ch(b, cout_p)
    x = _pad_ch(x, cin_p)
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred)
    return out + b.astype(out.dtype)


def _motion_encoder(p, flow_nhwc, corr_nhwc):
    """Motion encoder with every conv lane-aligned. Activations stay padded
    between convs (zero channels flow through relu as zeros); downstream
    weights are rearranged so real channels line up with where the padded
    concat puts them."""
    cor = jax.nn.relu(_conv_lane(corr_nhwc, p["convc1"]))  # 256
    cor = jax.nn.relu(_conv_lane(cor, p["convc2"], padding=1))  # 192→256pad
    # convf1 (7×7, 2→128): a 2-channel NHWC input wastes 126/128 lanes; use
    # extracted patches + a lane-aligned 1×1 contraction instead (98→128)
    patches = jax.lax.conv_general_dilated_patches(
        flow_nhwc, (7, 7), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # N×H×W×98
    wf1 = p["convf1"]["w"]  # 7×7×2×128 (HWIO)
    # patches channel order is (c, kh, kw) — torch unfold layout; match it
    wf1_flat = jnp.transpose(wf1, (2, 0, 1, 3)).reshape(-1, wf1.shape[3])
    flo = jax.nn.relu(
        _conv_lane(patches, {"w": wf1_flat[None, None], "b": p["convf1"]["b"]}))
    flo = jax.nn.relu(_conv_lane(flo, p["convf2"], padding=1))  # 64→128pad
    # original: conv(3×3, concat[cor 192, flo 64] = 256 → 126). With padded
    # activations the real channels sit at [0:192] and [256:320] of a 384-ch
    # concat; scatter the weight rows to match (zeros elsewhere — exact).
    wc = p["conv"]["w"]  # 3×3×256×126
    w384 = jnp.zeros((3, 3, 384, wc.shape[3]), wc.dtype)
    w384 = w384.at[:, :, 0:192].set(wc[:, :, 0:192])
    w384 = w384.at[:, :, 256:320].set(wc[:, :, 192:256])
    out = jax.nn.relu(_conv_lane(jnp.concatenate([cor, flo], -1),
                                 {"w": w384, "b": p["conv"]["b"]}, padding=1))
    return jnp.concatenate([out[..., :126], flow_nhwc], axis=-1)  # 128


def _conv_1x5(x, p):
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), [(0, 0), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred) + p["b"].astype(x.dtype)


def _conv_5x1(x, p):
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), [(2, 2), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred) + p["b"].astype(x.dtype)


def _sep_conv_gru(p, h, x):
    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(_conv_1x5(hx, p["convz1"]))
    r = jax.nn.sigmoid(_conv_1x5(hx, p["convr1"]))
    q = jnp.tanh(_conv_1x5(jnp.concatenate([r * h, x], -1), p["convq1"]))
    h = (1 - z) * h + z * q
    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(_conv_5x1(hx, p["convz2"]))
    r = jax.nn.sigmoid(_conv_5x1(hx, p["convr2"]))
    q = jnp.tanh(_conv_5x1(jnp.concatenate([r * h, x], -1), p["convq2"]))
    return (1 - z) * h + z * q


def _flow_head(p, h):
    out = _conv_lane(jax.nn.relu(_conv_lane(h, p["conv1"], padding=1)),
                     p["conv2"], padding=1)
    return out[..., :2]


def convex_upsample(flow_nhwc, mask_nhwc):
    """8× convex upsampling: softmax over 9 weights combines the 3×3
    neighborhood of the coarse flow for each of the 64 subpixels."""
    b, h, w, _ = flow_nhwc.shape
    mask = mask_nhwc.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)
    flow8 = 8.0 * flow_nhwc
    pad = jnp.pad(flow8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack([pad[:, i:i + h, j:j + w] for i in range(3)
                         for j in range(3)], axis=3)  # b×h×w×9×2
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, patches)
    up = jnp.transpose(up, (0, 1, 3, 2, 4, 5)).reshape(b, 8 * h, 8 * w, 2)
    return up


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def _coords_grid(b, h, w):
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs, ys], axis=0)[None]  # 1×2×h×w
    return jnp.broadcast_to(grid, (b, 2, h, w))


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def raft_encode(params, images_nchw, compute_dtype=jnp.float32):
    """Per-frame encoders, hoisted out of the pair loop.

    The reference recomputes fnet+cnet for every one of the O(T²) direct-flow
    pairs (reference preprocessing/extract_trajectories.py:129-141); fnet and
    cnet are pure per-frame functions, so we compute them once per frame
    (O(T)) and only the correlation pyramid + GRU recurrence runs per pair.

    images in [0, 1], N×3×H×W (H, W divisible by 8) ->
    (fmap N×h8×w8×256, net N×h8×w8×128, inp N×h8×w8×128).

    ``compute_dtype=bfloat16`` runs the conv stacks on the MXU in bf16
    (norm statistics stay f32); validate flow parity with the harness's EPE
    gate before enabling it against real weights.
    """
    x = jnp.transpose(images_nchw * 2.0 - 1.0, (0, 2, 3, 1))
    x = x.astype(compute_dtype)
    fmap = _encoder(params["fnet"], x, "instance")
    cnet = _encoder(params["cnet"], x, "batch")
    net = jnp.tanh(cnet[..., :HDIM])
    inp = jax.nn.relu(cnet[..., HDIM:])
    return fmap, net, inp


@functools.partial(jax.jit, static_argnames=("num_iters",))
def raft_decode(params, fmap1, fmap2, net, inp, num_iters: int = 24):
    """Pair-dependent half of RAFT given precomputed per-frame encodings
    (raft_encode): correlation pyramid, ``num_iters`` GRU updates, convex
    upsampling. Returns flow N×2×H×W in pixels (always f32).

    The compute dtype follows the encodings' dtype (raft_encode's
    ``compute_dtype``); the correlation volume, its lookup, and the flow
    coordinate accumulation stay f32 in either mode."""
    b, h8, w8, _ = fmap1.shape
    cdtype = net.dtype
    pyramid = prepare_pyramid_for_lookup(build_corr_pyramid(fmap1, fmap2))
    coords0 = _coords_grid(b, h8, w8)
    up = params["update"]

    def step(carry, _):
        net, coords1 = carry
        corr = corr_lookup(pyramid, coords1)
        flow = jnp.transpose(coords1 - coords0, (0, 2, 3, 1))
        motion = _motion_encoder(up["enc"], flow.astype(cdtype),
                                 corr.astype(cdtype))
        new_net = _sep_conv_gru(up["gru"], net,
                                jnp.concatenate([inp, motion], axis=-1))
        delta = _flow_head(up["flow_head"], new_net).astype(jnp.float32)
        coords1 = coords1 + jnp.transpose(delta, (0, 3, 1, 2))
        return (new_net, coords1), None

    # unroll=2: measured 6.5% faster than the rolled loop on v5e (better
    # cross-iteration scheduling of the gather DMAs vs conv compute);
    # unroll=4 gains nothing more and doubles compile time again
    (net, coords1), _ = jax.lax.scan(step, (net, coords0), None,
                                     length=num_iters, unroll=2)
    flow_coarse = jnp.transpose(coords1 - coords0, (0, 2, 3, 1))
    mask = _conv_lane(jax.nn.relu(_conv_lane(net, up["mask"]["conv1"],
                                             padding=1)),
                      up["mask"]["conv2"])[..., : 64 * 9] * 0.25
    flow_up = convex_upsample(flow_coarse, mask.astype(jnp.float32))
    return jnp.transpose(flow_up, (0, 3, 1, 2))


@functools.partial(jax.jit, static_argnames=("num_iters", "compute_dtype"))
def raft_forward(params, image1_nchw, image2_nchw, num_iters: int = 24,
                 compute_dtype=jnp.float32):
    """Images in [0, 1], H/W divisible by 8 -> flow N×2×H×W (pixels).

    Matches RAFT inference: inputs scaled to [-1, 1], zero-init flow at 1/8
    resolution, ``num_iters`` GRU updates, convex upsampling of the final
    flow only (the reference consumes predictions[-1]).
    """
    fmap1, net, inp = raft_encode(params, image1_nchw,
                                  compute_dtype=compute_dtype)
    fmap2, _, _ = raft_encode(params, image2_nchw,
                              compute_dtype=compute_dtype)
    return raft_decode(params, fmap1, fmap2, net, inp, num_iters=num_iters)


class InputPadder:
    """Pad to /8 with replicate, 'sintel' centering (reference
    data/data_utils.py:26-44)."""

    def __init__(self, dims):
        self.ht, self.wd = dims[-2:]
        pad_ht = (((self.ht // 8) + 1) * 8 - self.ht) % 8
        pad_wd = (((self.wd // 8) + 1) * 8 - self.wd) % 8
        # (left, right, top, bottom)
        self._pad = [pad_wd // 2, pad_wd - pad_wd // 2,
                     pad_ht // 2, pad_ht - pad_ht // 2]

    def pad(self, x_nchw):
        l, r, t, b = self._pad
        return jnp.pad(x_nchw, ((0, 0), (0, 0), (t, b), (l, r)), mode="edge")

    def unpad(self, x_nchw):
        l, r, t, b = self._pad
        ht, wd = x_nchw.shape[-2:]
        return x_nchw[..., t:ht - b, l:wd - r]


# ---------------------------------------------------------------------------
# checkpoint conversion (princeton-vl raft-things.pth layout)
# ---------------------------------------------------------------------------

def convert_raft_state_dict(sd) -> dict:
    """princeton-vl RAFT state dict -> our param tree. Accepts the
    ``module.``-prefixed DataParallel layout of the published checkpoints."""
    def a(name):
        for key in (name, "module." + name):
            if key in sd:
                t = sd[key]
                return jnp.asarray(
                    t.detach().cpu().numpy() if hasattr(t, "detach")
                    else np.asarray(t), jnp.float32)
        raise KeyError(name)

    def cv(name):
        return {"w": jnp.transpose(a(name + ".weight"), (2, 3, 1, 0)),
                "b": a(name + ".bias")}

    def bn(name):
        return {"scale": a(name + ".weight"), "bias": a(name + ".bias"),
                "mean": a(name + ".running_mean"),
                "var": a(name + ".running_var")}

    def enc(prefix, norm):
        def block(bp, cin, cout, stride):
            b = {"conv1": cv(bp + ".conv1"), "conv2": cv(bp + ".conv2")}
            if norm == "batch":
                b["norm1"] = bn(bp + ".norm1")
                b["norm2"] = bn(bp + ".norm2")
            if stride > 1 or cin != cout:
                b["downsample"] = {"conv": cv(bp + ".downsample.0")}
                if norm == "batch":
                    b["downsample"]["norm"] = bn(bp + ".downsample.1")
            return b

        p = {"conv1": cv(prefix + ".conv1"), "conv2": cv(prefix + ".conv2"),
             "layer1": [block(prefix + ".layer1.0", 64, 64, 1),
                        block(prefix + ".layer1.1", 64, 64, 1)],
             "layer2": [block(prefix + ".layer2.0", 64, 96, 2),
                        block(prefix + ".layer2.1", 96, 96, 1)],
             "layer3": [block(prefix + ".layer3.0", 96, 128, 2),
                        block(prefix + ".layer3.1", 128, 128, 1)]}
        if norm == "batch":
            p["norm1"] = bn(prefix + ".norm1")
        return p

    return {
        "fnet": enc("fnet", "instance"),
        "cnet": enc("cnet", "batch"),
        "update": {
            "enc": {k: cv(f"update_block.encoder.{k}") for k in
                    ("convc1", "convc2", "convf1", "convf2", "conv")},
            "gru": {k: cv(f"update_block.gru.{k}") for k in
                    ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2")},
            "flow_head": {"conv1": cv("update_block.flow_head.conv1"),
                          "conv2": cv("update_block.flow_head.conv2")},
            "mask": {"conv1": cv("update_block.mask.0"),
                     "conv2": cv("update_block.mask.2")},
        },
    }

"""Bicubic resize with exact torch ``F.interpolate(mode='bicubic')``
semantics (A = -0.75, align_corners=False, caller-supplied scale factor).

Needed for positional-embedding interpolation parity: the reference resizes
the ViT pos-embed grid with scale_factor=(n0+0.1)/√N and
recompute_scale_factor=False (models/extractor.py:57-85), so the *given*
scale — not out/in — drives the coordinate mapping. Implemented as two
precomputed 1-D weight matrices (separable kernel) -> two small matmuls.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_A = -0.75


def _cubic_weights(t: np.ndarray) -> np.ndarray:
    """4 torch-bicubic taps for fractional offsets t ∈ [0,1): weights for
    source indices floor(src)-1 .. floor(src)+2."""
    def conv1(x):  # |x| <= 1
        return ((_A + 2) * x - (_A + 3)) * x * x + 1
    def conv2(x):  # 1 < |x| < 2
        return ((_A * x - 5 * _A) * x + 8 * _A) * x - 4 * _A
    w0 = conv2(t + 1.0)
    w1 = conv1(t)
    w2 = conv1(1.0 - t)
    w3 = 1.0 - w0 - w1 - w2
    return np.stack([w0, w1, w2, w3], axis=-1)  # [out, 4]


def _resize_matrix(in_size: int, out_size: int, scale: float) -> np.ndarray:
    """W[out, in] such that out = W @ in matches torch upsample_bicubic2d
    with align_corners=False and area_pixel scale = 1/scale_factor."""
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) / scale - 0.5
    i1 = np.floor(src).astype(np.int64)
    t = src - i1
    w = _cubic_weights(t)  # [out, 4]
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(4):
        idx = np.clip(i1 - 1 + tap, 0, in_size - 1)
        np.add.at(mat, (dst.astype(np.int64), idx), w[:, tap])
    return mat.astype(np.float32)


def bicubic_resize_torch(img_chw, out_h: int, out_w: int,
                         scale_h: float = None, scale_w: float = None):
    """Resize C×H×W with torch-bicubic semantics. If scales are omitted they
    default to out/in (plain interpolate(size=...) behavior)."""
    c, h, w = img_chw.shape
    sh = out_h / h if scale_h is None else scale_h
    sw = out_w / w if scale_w is None else scale_w
    wh = jnp.asarray(_resize_matrix(h, out_h, sh))
    ww = jnp.asarray(_resize_matrix(w, out_w, sw))
    out = jnp.einsum("oh,chw->cow", wh, img_chw)
    return jnp.einsum("pw,cow->cop", ww, out)

"""Top-2 greedy NMS for the best-buddy ambiguity score.

The reference runs full torchvision ``batched_nms`` over top-400 candidate
boxes and then keeps only the two highest surviving peaks
(preprocessing_dino_bb/compute_dino_bb_nms.py:12-43). For equal-size boxes,
greedy NMS's first two survivors are exactly (1) the global argmax and
(2) the highest-scoring candidate whose IoU with it is ≤ threshold — so the
whole 400-step greedy loop collapses to two vectorized reductions. We keep
the reference's top-k pre-filter so the second peak is drawn from the same
candidate set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .select import topk_mask


def same_size_box_iou(centers_a, centers_b, half_size: float):
    """IoU between axis-aligned boxes of identical side 2·half_size centered
    at a[..., 2] and b[..., 2]."""
    d = jnp.abs(centers_a - centers_b)
    side = 2.0 * half_size
    inter = jnp.clip(side - d[..., 0], min=0.0) * jnp.clip(side - d[..., 1], min=0.0)
    union = 2.0 * side * side - inter
    return inter / union


@functools.partial(jax.jit, static_argnames=("topk", "box_size", "iou_thresh"))
def nms_top2_peaks(scores_bn, coords_n2, topk: int = 400,
                   box_size: float = 30.0, iou_thresh: float = 0.2):
    """For each row of scores: (peak1, peak2) after greedy box NMS.

    scores_bn: B×N similarity maps (flattened spatial); coords_n2: N×2 pixel
    centers of the N candidates. Returns (peak_affs B×2, r B) with
    r = peak2/peak1 (the ambiguity ratio).
    """
    # lax.top_k at B=1024, n=8107, k=400 dominated the ambiguity pass; the
    # greedy-NMS outcome only needs top-k *membership*, not the sorted list:
    # peak2 = max over {top-k candidates with IoU(peak1) <= thresh}. A
    # radix-select membership mask (ops/select.py) + masked max over all n
    # computes the identical result with vector ops only.
    k = min(topk, scores_bn.shape[1])
    in_topk = topk_mask(scores_bn, k)  # B×n
    peak1_val = jnp.max(scores_bn, axis=1)
    peak1_xy = coords_n2[jnp.argmax(scores_bn, axis=1)]  # B×2
    iou = same_size_box_iou(coords_n2[None, :, :], peak1_xy[:, None, :],
                            box_size)  # B×n
    eligible = in_topk & (iou <= iou_thresh)
    masked = jnp.where(eligible, scores_bn, -jnp.inf)
    peak2_val = jnp.max(masked, axis=1)
    peak2_val = jnp.where(jnp.isfinite(peak2_val), peak2_val, 0.0)
    peaks = jnp.stack([peak1_val, peak2_val], axis=1)
    r = peak2_val / peak1_val
    return peaks, r

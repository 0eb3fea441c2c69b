"""Exact large-k top-k replacements for TPU.

``jax.lax.top_k`` on TPU is a full iterative partial sort; at the shapes the
best-buddy stage needs (k=1024 of n=8107 per pair, and k=400 over 1024 rows
of 8107 in the NMS) it dominates the stage: the r3 probe measured the whole
mutual-NN core at 18.7 ms/pair of which the affinity matmul + both argmaxes
were only 3.1 ms — the remaining ~15.5 ms was the single ``top_k`` call
(scripts/perf_bb_probe.py).

What the stage actually needs is never "the k largest, sorted": it is
either (a) *membership* — "is this element among the k largest?" — or
(b) the k largest as an unordered set. Both reduce to the k-th largest
VALUE, which a 32-step binary search over the monotone unsigned-int
encoding of f32 computes exactly with nothing but vectorized compares and
sums (a radix-style selection, O(32·n) VPU work, trivially vmappable).
Membership is then one compare; set extraction is an index-ordered
compaction done as a one-hot matmul (scatter-free — TPU scatters serialize).

Tie semantics match ``lax.top_k``: ties at the k-th value are broken by
lower index first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _f32_to_ordered_u32(x):
    """Monotone map f32 -> u32: a >= b  <=>  map(a) >= map(b).

    Standard sign-flip trick: non-negative floats get the sign bit set,
    negative floats are bitwise inverted. NaNs are not handled (callers mask
    with -inf, which maps fine).
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    neg = (bits >> 31).astype(jnp.bool_)
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))


def kth_largest(scores, k: int):
    """Exact k-th largest value's ordered-u32 key, along the last axis.

    Returns the u32 key V such that ``count(key >= V) >= k`` and
    ``count(key > V) < k`` — i.e. ``key(x) >= V`` is True exactly for the
    elements ``lax.top_k(scores, k)`` would return, modulo ties at the
    boundary (which callers break by index, matching top_k). If the axis has
    fewer than k elements, V = 0 (everything passes). Works under vmap.
    """
    keys = _f32_to_ordered_u32(scores)

    def step(state, shift):
        lo = state  # invariant: count(key >= lo) >= k (lo=0 trivially)
        mid = lo | (jnp.uint32(1) << shift)
        cnt = jnp.sum((keys >= mid[..., None]).astype(jnp.int32), axis=-1)
        return jnp.where(cnt >= k, mid, lo), None

    lo = jnp.zeros(scores.shape[:-1], jnp.uint32)
    lo, _ = jax.lax.scan(step, lo, jnp.arange(31, -1, -1, dtype=jnp.uint32))
    return lo


def topk_mask(scores, k: int):
    """Boolean mask of the k largest along the last axis (ties at the k-th
    value broken by lower index, exactly like ``lax.top_k``). Never marks
    more than k elements; marks all n when n <= k."""
    keys = _f32_to_ordered_u32(scores)
    v = kth_largest(scores, k)[..., None]
    gt = keys > v
    eq = keys == v
    # everything strictly above the k-th value is in; ties AT the k-th value
    # fill the remaining slots in index order (lax.top_k's tie rule)
    quota = k - jnp.sum(gt.astype(jnp.int32), axis=-1, keepdims=True)
    return gt | (eq & (jnp.cumsum(eq.astype(jnp.int32), axis=-1) <= quota))


def compact_mask(mask, values, k: int, fill_value=0.0):
    """Compact the (<=k) True positions of a 1-D mask into k slots, index
    order, scatter-free.

    Returns ``(idx, vals, valid)`` each of shape (k,): positions of the True
    elements, their ``values``, and a validity mask for slots past the
    count. The compaction is a one-hot contraction (slot j matches the
    element whose inclusive cumsum equals j+1), which XLA maps onto dense
    vector ops instead of a serialized scatter.

    Memory note: the k×n one-hot is materialized as f32 for the dot. At the
    largest production call site (cycle loss: n=h·w≈406k, k≈128, 8 vmapped
    calls/step) that is ~1.6 GB transient if XLA does NOT fuse the
    cumsum-compare producer into the dot operand — within v5e headroom and
    short-lived, but if live-memory profiles ever show pressure here,
    segment the contraction over n (accumulate k×2 partials per slab).
    """
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32))  # inclusive; value at True i = rank+1
    onehot = (pos[None, :] == jnp.arange(1, k + 1, dtype=jnp.int32)[:, None])
    onehot = (onehot & mask[None, :]).astype(jnp.float32)  # k×n, exactly one 1 per filled slot
    rhs = jnp.stack([jnp.arange(n, dtype=jnp.float32),
                     values.astype(jnp.float32)], axis=1)  # n×2
    out = jnp.dot(onehot, rhs, preferred_element_type=jnp.float32)  # k×2
    idx = out[:, 0].astype(jnp.int32)
    vals = out[:, 1]
    valid = jnp.arange(k) < pos[-1]
    vals = jnp.where(valid, vals, fill_value)
    return idx, vals, valid

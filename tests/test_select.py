"""ops/select.py: radix-select top-k membership + scatter-free compaction
must reproduce lax.top_k semantics exactly (including index tie-breaks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dino_tracker_tpu.ops.select import (
    _f32_to_ordered_u32, compact_mask, kth_largest, topk_mask)


def test_ordered_u32_is_monotone():
    vals = np.array([-np.inf, -1e30, -3.5, -1e-40, -0.0, 0.0, 1e-40, 2.25,
                     1e30, np.inf], np.float32)
    keys = np.asarray(_f32_to_ordered_u32(jnp.asarray(vals)))
    # -0.0 and 0.0 compare equal as floats; their keys may order either way
    # within the tie, but every strict float inequality must be preserved
    for i in range(len(vals)):
        for j in range(len(vals)):
            if vals[i] < vals[j]:
                assert keys[i] < keys[j], (vals[i], vals[j])


@pytest.mark.parametrize("n,k", [(50, 7), (8107, 1024), (300, 400)])
def test_topk_mask_matches_lax_top_k(n, k):
    rng = np.random.default_rng(0)
    scores = rng.standard_normal(n).astype(np.float32)
    mask = np.asarray(topk_mask(jnp.asarray(scores), k))
    _, idx = jax.lax.top_k(jnp.asarray(scores), min(k, n))
    expected = np.zeros(n, bool)
    expected[np.asarray(idx)] = True
    np.testing.assert_array_equal(mask, expected)


def test_topk_mask_ties_broken_by_index():
    # ties at the k-th value: lax.top_k keeps the lowest indices; a strictly
    # larger value at a late index must never be displaced by early ties
    scores = np.array([1.0, 1.0, 1.0, 1.0, 2.0], np.float32)
    mask = np.asarray(topk_mask(jnp.asarray(scores), 3))
    np.testing.assert_array_equal(mask, [True, True, False, False, True])


def test_topk_mask_batched_and_with_neg_inf():
    rng = np.random.default_rng(1)
    scores = rng.standard_normal((6, 500)).astype(np.float32)
    scores[scores < 0.5] = -np.inf  # most rows have < k finite entries
    mask = np.asarray(topk_mask(jnp.asarray(scores), 64))
    for b in range(6):
        _, idx = jax.lax.top_k(jnp.asarray(scores[b]), 64)
        expected = np.zeros(500, bool)
        expected[np.asarray(idx)] = True
        np.testing.assert_array_equal(mask[b], expected, err_msg=f"row {b}")


def test_kth_largest_under_vmap():
    rng = np.random.default_rng(2)
    scores = rng.standard_normal((4, 256)).astype(np.float32)
    direct = np.asarray(kth_largest(jnp.asarray(scores), 10))
    vmapped = np.asarray(jax.vmap(lambda s: kth_largest(s, 10))(
        jnp.asarray(scores)))
    np.testing.assert_array_equal(direct, vmapped)


def test_compact_mask_extracts_in_index_order():
    rng = np.random.default_rng(3)
    n, k = 200, 16
    values = rng.standard_normal(n).astype(np.float32)
    mask = np.zeros(n, bool)
    mask[rng.choice(n, size=9, replace=False)] = True
    idx, vals, valid = map(np.asarray, compact_mask(
        jnp.asarray(mask), jnp.asarray(values), k, fill_value=-5.0))
    true_pos = np.flatnonzero(mask)
    np.testing.assert_array_equal(idx[:9], true_pos)
    np.testing.assert_allclose(vals[:9], values[true_pos], rtol=1e-6)
    np.testing.assert_array_equal(valid, np.arange(k) < 9)
    np.testing.assert_array_equal(vals[9:], np.full(k - 9, -5.0))


def test_topk_then_compact_equals_top_k_set():
    # the composition used by _mutual_nn_core: same k-element set as top_k
    rng = np.random.default_rng(4)
    n, k = 4096, 256
    scores = rng.standard_normal(n).astype(np.float32)
    mask = topk_mask(jnp.asarray(scores), k)
    idx, vals, valid = compact_mask(mask, jnp.asarray(scores), k)
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(scores), k)
    assert set(np.asarray(idx).tolist()) == set(np.asarray(ref_idx).tolist())
    np.testing.assert_allclose(np.sort(np.asarray(vals)),
                               np.sort(np.asarray(ref_vals)), rtol=1e-6)
    assert bool(np.all(np.asarray(valid)))

"""Pallas window-gather kernel parity (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from dino_tracker_tpu.ops.window_gather import (window_gather,
                                                window_gather_reference)

RNG = np.random.default_rng(31)


def test_window_gather_matches_dynamic_slice():
    n, hp, wp, side = 70, 26, 33, 10
    vol = jnp.asarray(RNG.standard_normal((n, hp, wp)).astype(np.float32))
    sy = jnp.asarray(RNG.integers(0, hp - side + 1, n).astype(np.int32))
    sx = jnp.asarray(RNG.integers(0, wp - side + 1, n).astype(np.int32))
    ref = window_gather_reference(vol, sy, sx, side=side)
    # block smaller than n and not dividing it: exercises padding + grid
    ours = window_gather(vol, sy, sx, side=side, block=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_window_gather_prepadded_volume_rows():
    """Volume rows pre-padded past len(sy) (corr_lookup's fused-pad layout)."""
    n, hp, wp, side = 40, 26, 128, 10
    vol = jnp.asarray(RNG.standard_normal((64, hp, wp)).astype(np.float32))
    sy = jnp.asarray(RNG.integers(0, hp - side + 1, n).astype(np.int32))
    sx = jnp.asarray(RNG.integers(0, wp - side + 1, n).astype(np.int32))
    ref = window_gather_reference(vol[:n], sy, sx, side=side)
    ours = window_gather(vol, sy, sx, side=side, block=32, interpret=True)
    assert ours.shape == (n, side, side)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_window_gather_chunked_over_max_rows(monkeypatch):
    """Row counts past the SMEM cap split into multiple pallas calls
    (real failure: pair_batch=32 at DAVIS scale overflowed SMEM)."""
    import dino_tracker_tpu.ops.window_gather as wg
    monkeypatch.setattr(wg, "_MAX_ROWS", 64)
    n, hp, wp, side = 150, 20, 24, 8
    vol = jnp.asarray(RNG.standard_normal((n, hp, wp)).astype(np.float32))
    sy = jnp.asarray(RNG.integers(0, hp - side + 1, n).astype(np.int32))
    sx = jnp.asarray(RNG.integers(0, wp - side + 1, n).astype(np.int32))
    ref = window_gather_reference(vol, sy, sx, side=side)
    ours = wg.window_gather(vol, sy, sx, side=side, block=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_window_gather_block_larger_than_n():
    n, hp, wp, side = 5, 16, 17, 4
    vol = jnp.asarray(RNG.standard_normal((n, hp, wp)).astype(np.float32))
    sy = jnp.asarray(RNG.integers(0, hp - side + 1, n).astype(np.int32))
    sx = jnp.asarray(RNG.integers(0, wp - side + 1, n).astype(np.int32))
    ref = window_gather_reference(vol, sy, sx, side=side)
    ours = window_gather(vol, sy, sx, side=side, block=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))

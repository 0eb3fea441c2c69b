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


def test_window_gather_block_larger_than_n():
    n, hp, wp, side = 5, 16, 17, 4
    vol = jnp.asarray(RNG.standard_normal((n, hp, wp)).astype(np.float32))
    sy = jnp.asarray(RNG.integers(0, hp - side + 1, n).astype(np.int32))
    sx = jnp.asarray(RNG.integers(0, wp - side + 1, n).astype(np.int32))
    ref = window_gather_reference(vol, sy, sx, side=side)
    ours = window_gather(vol, sy, sx, side=side, block=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))

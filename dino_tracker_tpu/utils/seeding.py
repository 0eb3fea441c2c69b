"""Seeding helpers (reference models/utils.py:98-104 ``fix_random_seeds``).

JAX randomness is explicit-key-based; this seeds the remaining ambient RNGs
(NumPy — used by host-side shuffles in viz/launcher) and hands back the root
PRNG key that every jitted stage threads explicitly.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def fix_random_seeds(seed: int = 31):
    """Seed ambient RNGs; returns the root jax PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)

"""Shared fixed-shape data structures.

XLA wants static shapes; the reference's ragged per-frame-pair best-buddy
dict (``{"{s}_{t}": {source_coords: N_st×2, ...}}``,
preprocessing_dino_bb/extract_dino_best_buddies.py:45-50) becomes dense
padded arrays with validity masks, indexable with traced frame indices
inside a jitted step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class BBData(NamedTuple):
    """Padded best-buddy correspondences for every ordered frame pair.

    All arrays lead with [T, T, Nmax]; entry (s, t, k) is the k-th buddy of
    ordered pair source-frame s → target-frame t.

    Deliberate omission: the reference also appends the two raw NMS peak
    affinities per buddy (``peak_affs``, compute_dino_bb_nms.py:96-104) into
    its BB dict, but training consumes only their ratio ``r``
    (dino_tracker.py:228) — the field is vestigial and is not carried here.
    """
    source_coords: jnp.ndarray  # T×T×Nmax×2 pixel (x, y)
    target_coords: jnp.ndarray  # T×T×Nmax×2
    cos_sims: jnp.ndarray       # T×T×Nmax
    r: jnp.ndarray              # T×T×Nmax ambiguity ratio (2nd/1st NMS peak)
    valid: jnp.ndarray          # T×T×Nmax bool

    @property
    def num_frames(self) -> int:
        return self.source_coords.shape[0]

    @property
    def capacity(self) -> int:
        return self.source_coords.shape[2]


def empty_bb_data(t: int, capacity: int) -> BBData:
    return BBData(
        source_coords=jnp.zeros((t, t, capacity, 2), jnp.float32),
        target_coords=jnp.zeros((t, t, capacity, 2), jnp.float32),
        cos_sims=jnp.zeros((t, t, capacity), jnp.float32),
        r=jnp.ones((t, t, capacity), jnp.float32),
        valid=jnp.zeros((t, t, capacity), bool),
    )


def save_bb_data(path: str, bb: BBData):
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path,
                        source_coords=np.asarray(bb.source_coords),
                        target_coords=np.asarray(bb.target_coords),
                        cos_sims=np.asarray(bb.cos_sims),
                        r=np.asarray(bb.r),
                        valid=np.asarray(bb.valid))


def load_bb_data(path: str) -> BBData:
    with np.load(path) as f:
        return BBData(jnp.asarray(f["source_coords"]),
                      jnp.asarray(f["target_coords"]),
                      jnp.asarray(f["cos_sims"]),
                      jnp.asarray(f["r"]),
                      jnp.asarray(f["valid"]))

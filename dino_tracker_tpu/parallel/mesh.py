"""Device mesh + sharding layout.

The reference is single-GPU with zero distribution (SURVEY §2); the TPU
rebuild scales within one video over an ICI mesh with a single ``data`` axis:

  * train step: the 512-point batch axis AND the ≤8-frame DeltaDINO conv
    batch shard over ``data`` (params replicated; XLA inserts the psum for
    gradient reduction);
  * feature extraction / RAFT / best-buddy pair sweeps: the frame (or frame-
    pair) axis shards over ``data``;
  * inference: the flat (query × frame) prediction batch shards over ``data``.

Multi-video benchmark fan-out across hosts rides DCN via
parallel/launcher.py (one process per video — embarrassingly parallel).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading axis over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_batch(x, mesh: Optional[Mesh]):
    """Inside-jit sharding constraint: leading axis over ``data``."""
    if mesh is None:
        return x
    spec = P(*([DATA_AXIS] + [None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def constrain_axis(x, mesh: Optional[Mesh], axis: int):
    """Inside-jit sharding constraint: ``axis`` over ``data`` (for blocked
    layouts whose parallel axis is not leading, e.g. the cycle loss's
    G×P×… per-pair point blocks sharded over P)."""
    if mesh is None:
        return x
    spec = [None] * x.ndim
    spec[axis] = DATA_AXIS
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    """Pad ``axis`` up to a multiple by repeating the last slice — keeps
    batch shapes static (no recompiles) and divisible by the mesh size."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    last = np.take(x, [-1], axis=axis)
    reps = [1] * x.ndim
    reps[axis] = rem
    return np.concatenate([x, np.tile(last, reps)], axis=axis)

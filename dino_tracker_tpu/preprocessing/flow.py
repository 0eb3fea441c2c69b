"""Flow engine: adjacent and direct RAFT flows with cycle masks.

Behavior spec: reference preprocessing/extract_trajectories.py:29-160
(``get_flows_with_masks`` / ``compute_direct_flows_for_start_frame``).
Pairs batch on the leading axis (shardable across chips for the O(T²) direct
sweep); each batch is one jitted RAFT program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import raft
from ..utils.sampling import bilinear_sampler_pixel


@dataclasses.dataclass
class RaftFlowEngine:
    """Holds RAFT params + the padded video; serves flow queries."""

    params: dict
    video_tchw: np.ndarray  # [0,1] float32 at inference resolution
    num_iters: int = 24
    pair_batch: int = 8

    def __post_init__(self):
        self.t, _, self.h, self.w = self.video_tchw.shape
        self.padder = raft.InputPadder(self.video_tchw.shape)
        self._padded = np.asarray(self.padder.pad(jnp.asarray(self.video_tchw)))

    def _run_pairs(self, idx_a: np.ndarray, idx_b: np.ndarray) -> np.ndarray:
        """Flow a→b for index arrays; returns N×2×h×w (unpadded)."""
        n = len(idx_a)
        out = np.zeros((n, 2, self.h, self.w), np.float32)
        bsz = self.pair_batch
        for s in range(0, n, bsz):
            e = min(s + bsz, n)
            a = self._padded[idx_a[s:e]]
            b = self._padded[idx_b[s:e]]
            if e - s < bsz:  # pad partial batches to avoid recompiles
                pad = bsz - (e - s)
                a = np.concatenate([a, a[-1:].repeat(pad, 0)])
                b = np.concatenate([b, b[-1:].repeat(pad, 0)])
            from ..utils.retry import retry_transient
            flow = retry_transient(
                lambda: raft.raft_forward(self.params, jnp.asarray(a),
                                          jnp.asarray(b),
                                          num_iters=self.num_iters),
                what="raft batch")
            flow = self.padder.unpad(flow)
            out[s:e] = np.asarray(flow)[: e - s]
        return out

    def adjacent_flows(self, progress: bool = False
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """((t-1)×2×h×w fwd i→i+1, bwd i+1→i)."""
        idx = np.arange(self.t - 1)
        fwd = self._run_pairs(idx, idx + 1)
        bwd = self._run_pairs(idx + 1, idx)
        return fwd, bwd

    def direct_flows(self, start: int, threshold: float
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """Direct flow start→f for all f>start + fwd/bwd cycle masks
        (reference :99-160). Returns ((n)×h×w×2 flows, (n)×h×w masks)."""
        targets = np.arange(start + 1, self.t)
        src = np.full_like(targets, start)
        fwd = self._run_pairs(src, targets)   # n×2×h×w
        bwd = self._run_pairs(targets, src)
        return compute_direct_flow_masks(fwd, bwd, threshold)


def compute_direct_flow_masks(fwd_n2hw: np.ndarray, bwd_n2hw: np.ndarray,
                              threshold: float) -> Tuple[np.ndarray, np.ndarray]:
    """Cycle-check direct flows: warp forward, sample the backward flow at
    the warped position, require return within ``threshold`` and the warped
    point in bounds (reference :143-160)."""
    n, _, h, w = fwd_n2hw.shape
    fwd = jnp.asarray(fwd_n2hw)
    bwd = jnp.asarray(bwd_n2hw)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xs, ys], axis=-1)[None]  # 1×h×w×2

    @jax.jit
    def per_pair(f, b):
        coords1 = coords + jnp.transpose(f, (1, 2, 0))[None]
        warped_b = bilinear_sampler_pixel(b[None], coords1)
        coords2 = coords1 + jnp.transpose(warped_b[0], (1, 2, 0))[None]
        err = jnp.linalg.norm(coords - coords2, axis=-1)[0]
        upper = jnp.asarray([w - 1.0, h - 1.0])
        in_b = jnp.all((coords1[0] >= 0) & (coords1[0] <= upper), axis=-1)
        return (err < threshold) & in_b

    masks = np.stack([np.asarray(per_pair(fwd[i], bwd[i])) for i in range(n)])
    dflows = np.transpose(fwd_n2hw, (0, 2, 3, 1))
    return dflows, masks.astype(np.float32)

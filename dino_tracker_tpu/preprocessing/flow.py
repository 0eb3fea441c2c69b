"""Flow engine: adjacent and direct RAFT flows with cycle masks.

Behavior spec: reference preprocessing/extract_trajectories.py:29-160
(``get_flows_with_masks`` / ``compute_direct_flows_for_start_frame``).

TPU design: the per-frame encoders (fnet/cnet) run ONCE per frame
(models/raft.py ``raft_encode``) and stay resident on device; the O(T²)
direct-flow sweep then only runs the pair-dependent correlation pyramid +
GRU recurrence per pair (``raft_decode``) — the reference recomputes the
full network per pair (extract_trajectories.py:129-141). Pair batches ride
the leading axis and, when a mesh is supplied, shard across chips.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import raft
from ..parallel.mesh import constrain_batch, pad_to_multiple
from ..utils.retry import retry_transient
from ..utils.sampling import bilinear_sampler_pixel


@dataclasses.dataclass
class RaftFlowEngine:
    """Holds RAFT params + the padded video; serves flow queries."""

    params: dict
    video_tchw: np.ndarray  # [0,1] float32 at inference resolution
    num_iters: int = 24
    # 8 pairs/dispatch: per-slot decode cost is flat from 8 up (PERF r2),
    # and the per-start direct sweep rounds its pair count UP to a whole
    # batch — at 16 the DAVIS sweep wasted ~32% of its decoded slots on
    # tail padding (r5 probe), at 8 it wastes ~13%. einsum-lookup peak
    # memory at 476×854 stays well inside HBM (pyramids freed between
    # directions).
    pair_batch: int = 8
    encode_batch: int = 8
    mesh: Optional[object] = None  # jax.sharding.Mesh: shard pair/frame axes
    compute_dtype: object = jnp.float32  # bf16 convs/GRU (corr + flow stay f32)

    def __post_init__(self):
        self.t, _, self.h, self.w = self.video_tchw.shape
        self.padder = raft.InputPadder(self.video_tchw.shape)
        self._padded = np.asarray(self.padder.pad(jnp.asarray(self.video_tchw)))
        self._enc = None  # lazy (fmap, net, inp), device-resident, T leading
        self._decode_jit = None  # cached jitted gather+decode
        self._sweep_jit = None  # ONE jitted per-start direct sweep (all starts)
        self._adj = None  # cached adjacent flows (both trajectory passes use them)

    def _encodings(self):
        """Per-frame encoder outputs for ALL frames, computed once (O(T))."""
        if self._enc is not None:
            return self._enc
        mesh = self.mesh
        n_dev = mesh.devices.size if mesh is not None else 1

        cdtype = self.compute_dtype

        @jax.jit
        def encode(params, frames):
            frames = constrain_batch(frames, mesh)
            return jax.tree.map(
                lambda x: constrain_batch(x, mesh),
                raft.raft_encode(params, frames, compute_dtype=cdtype))

        def run(frames):
            if mesh is not None:
                with mesh:
                    return encode(self.params, jnp.asarray(frames))
            return encode(self.params, jnp.asarray(frames))

        chunks = []
        bsz = max(self.encode_batch, n_dev)
        bsz -= bsz % n_dev
        for s in range(0, self.t, bsz):
            e = min(s + bsz, self.t)
            frames = self._padded[s:e]
            if e - s < bsz:  # pad partial batches to avoid recompiles
                frames = np.concatenate(
                    [frames, frames[-1:].repeat(bsz - (e - s), 0)])
            out = retry_transient(lambda: run(frames), what="raft encode batch")
            chunks.append(jax.tree.map(lambda x: x[: e - s], out))
        self._enc = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *chunks)
        return self._enc

    def _decode_batch(self, fmaps, nets, inps, idx_a, idx_b):
        """One jitted gather+decode over a fixed-size pair batch; the pair
        axis carries a sharding constraint so a mesh splits it over chips."""
        mesh = self.mesh
        if self._decode_jit is None:
            def fn(params, fmaps, nets, inps, ia, ib):
                f1 = constrain_batch(jnp.take(fmaps, ia, axis=0), mesh)
                f2 = constrain_batch(jnp.take(fmaps, ib, axis=0), mesh)
                net = constrain_batch(jnp.take(nets, ia, axis=0), mesh)
                inp = constrain_batch(jnp.take(inps, ia, axis=0), mesh)
                flow = raft.raft_decode(params, f1, f2, net, inp,
                                        num_iters=self.num_iters)
                return constrain_batch(flow, mesh)

            self._decode_jit = jax.jit(fn)
        if mesh is not None:
            with mesh:
                return self._decode_jit(self.params, fmaps, nets, inps,
                                        idx_a, idx_b)
        return self._decode_jit(self.params, fmaps, nets, inps, idx_a, idx_b)

    def _run_pairs(self, idx_a: np.ndarray, idx_b: np.ndarray) -> jnp.ndarray:
        """Flow a→b for index arrays; returns N×2×h×w (unpadded), DEVICE
        resident (full-res flow fields are ~13 MB/pair — downstream consumers
        are all on-device, so they never cross the host link)."""
        fmaps, nets, inps = self._encodings()
        n = len(idx_a)
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        bsz = max(self.pair_batch, n_dev)
        bsz -= bsz % n_dev
        chunks = []
        for s in range(0, n, bsz):
            e = min(s + bsz, n)
            ia = pad_to_multiple(idx_a[s:e].astype(np.int32), bsz)
            ib = pad_to_multiple(idx_b[s:e].astype(np.int32), bsz)
            flow = retry_transient(
                lambda: self._decode_batch(fmaps, nets, inps,
                                           jnp.asarray(ia), jnp.asarray(ib)),
                what="raft pair batch")
            chunks.append(self.padder.unpad(flow)[: e - s])
        return jnp.concatenate(chunks, axis=0)

    def adjacent_flows(self, progress: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """((t-1)×2×h×w fwd i→i+1, bwd i+1→i), device-resident. Cached: both
        the filtered and the unfiltered trajectory passes consume them."""
        if self._adj is None:
            idx = np.arange(self.t - 1)
            fwd = self._run_pairs(idx, idx + 1)
            bwd = self._run_pairs(idx + 1, idx)
            self._adj = (fwd, bwd)
        return self._adj

    def direct_sweep_traceable(self):
        """Pure per-start direct-flow sweep for jit composition: returns
        ``(fn, operands)`` where ``fn(*operands, start_i32, thresh_f32) ->
        (dflows (t-1)×h×w×2, dmasks (t-1)×h×w)``.

        ONE compiled program serves every start frame: the pair chunks run
        under a ``lax.fori_loop`` whose trip count ``ceil((t-1-start)/bsz)``
        is computed from the TRACED ``start``. The previous design compiled
        one variant per distinct chunk count — the TPU-relay probe
        (scripts/perf_traj_probe.py, PERF.md r4) measured each such variant
        at a 25-80 s compile while the warm decode itself was ~1.4 s/chunk,
        i.e. compiles, not decode, dominated the 427 s trajectories stage.
        Everything stays on device — the naive split (decode → host →
        re-upload → mask) shuttles ~900 MB of flow fields over the host link
        per start frame. Rows ≥ t-1-start come back zero; callers may fuse
        further stages (chaining) behind this in the same jit so a whole
        start frame is ONE dispatch."""
        mesh = self.mesh
        n_dev = mesh.devices.size if mesh is not None else 1
        bsz = max(self.pair_batch, n_dev)
        bsz -= bsz % n_dev
        tm1 = self.t - 1
        n_batches_max = max(1, -(-tm1 // bsz))
        l, r, tp, bp = self.padder._pad
        h, w = self.h, self.w
        num_iters = self.num_iters

        def unpad(x):
            hp, wp = x.shape[-2:]
            return x[..., tp:hp - bp, l:wp - r]

        def fn(params, fmaps, nets, inps, start, thresh):
            total = n_batches_max * bsz
            ks = jnp.arange(total, dtype=jnp.int32)

            def dec(i1, i2):
                f1 = constrain_batch(jnp.take(fmaps, i1, axis=0), mesh)
                f2 = constrain_batch(jnp.take(fmaps, i2, axis=0), mesh)
                net = constrain_batch(jnp.take(nets, i1, axis=0), mesh)
                inp = constrain_batch(jnp.take(inps, i1, axis=0), mesh)
                return constrain_batch(
                    raft.raft_decode(params, f1, f2, net, inp,
                                     num_iters=num_iters), mesh)

            def body(i, bufs):
                dflows_b, masks_b = bufs
                ia = jnp.broadcast_to(start, (bsz,)).astype(jnp.int32)
                ib = jnp.clip(
                    start + 1 + i * bsz + jnp.arange(bsz, dtype=jnp.int32),
                    0, tm1)  # junk rows masked below
                fwd = unpad(dec(ia, ib))  # bsz×2×h×w (source-frame grid)
                bwd = unpad(dec(ib, ia))
                # one implementation of the cycle-consistency mask shared
                # with the host oracle used by tests / alternate engines
                mask = _cycle_masks_batched(fwd, bwd, thresh).astype(
                    jnp.float32)
                dflows_b = jax.lax.dynamic_update_slice(
                    dflows_b, jnp.transpose(fwd, (0, 2, 3, 1)),
                    (i * bsz, 0, 0, 0))
                masks_b = jax.lax.dynamic_update_slice(
                    masks_b, mask, (i * bsz, 0, 0))
                return (dflows_b, masks_b)

            nb = (tm1 - start + bsz - 1) // bsz
            bufs = (jnp.zeros((total, h, w, 2), jnp.float32),
                    jnp.zeros((total, h, w), jnp.float32))
            dflows, masks = jax.lax.fori_loop(0, nb, body, bufs)
            valid = (start + 1 + ks) <= tm1
            dflows = jnp.where(valid[:, None, None, None], dflows, 0.0)
            masks = jnp.where(valid[:, None, None], masks, 0.0)
            # total = ceil(tm1/bsz)*bsz >= tm1, so a static slice suffices
            return (constrain_batch(dflows[:tm1], mesh),
                    constrain_batch(masks[:tm1], mesh))

        fmaps, nets, inps = self._encodings()
        return fn, (self.params, fmaps, nets, inps)

    def direct_flows(self, start: int, threshold: float
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Direct flow start→f for all f>start + fwd/bwd cycle masks
        (reference :99-160). Returns DEVICE arrays padded to the full frame
        count — ((t-1)×h×w×2 flows, (t-1)×h×w masks); rows ≥ t-1-start are
        zero. Downstream chaining consumes these on device directly. One
        dispatch per call, one compiled program across ALL starts (see
        direct_sweep_traceable)."""
        if self._sweep_jit is None:
            fn, operands = self.direct_sweep_traceable()
            self._sweep_jit = (jax.jit(fn), operands)
        fn, operands = self._sweep_jit

        def run():
            args = operands + (jnp.asarray(start, jnp.int32),
                               jnp.asarray(threshold, jnp.float32))
            if self.mesh is not None:
                with self.mesh:
                    return fn(*args)
            return fn(*args)

        return retry_transient(run, what="raft direct sweep")


@jax.jit
def _cycle_masks_batched(fwd_n2hw, bwd_n2hw, threshold):
    """Warp forward, sample the backward flow at the warped position, require
    return within ``threshold`` and the warped point in bounds
    (reference :143-160). Batched over the pair axis, device-resident."""
    n, _, h, w = fwd_n2hw.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xs, ys], axis=-1)[None]  # 1×h×w×2
    coords1 = coords + jnp.transpose(fwd_n2hw, (0, 2, 3, 1))
    warped_b = bilinear_sampler_pixel(bwd_n2hw, coords1)
    coords2 = coords1 + jnp.transpose(warped_b, (0, 2, 3, 1))
    err = jnp.linalg.norm(coords - coords2, axis=-1)
    upper = jnp.asarray([w - 1.0, h - 1.0])
    in_b = jnp.all((coords1 >= 0) & (coords1 <= upper), axis=-1)
    return (err < threshold) & in_b


def compute_direct_flow_masks(fwd_n2hw: np.ndarray, bwd_n2hw: np.ndarray,
                              threshold: float) -> Tuple[np.ndarray, np.ndarray]:
    """Host-array convenience wrapper around ``_cycle_masks_batched``
    (tests / alternate flow engines; the production sweep fuses this into
    ``RaftFlowEngine.direct_sweep_traceable`` and never leaves the device)."""
    masks = np.asarray(_cycle_masks_batched(
        jnp.asarray(fwd_n2hw), jnp.asarray(bwd_n2hw),
        jnp.asarray(threshold, jnp.float32)))
    dflows = np.transpose(fwd_n2hw, (0, 2, 3, 1))
    return dflows, masks.astype(np.float32)

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
    # 16 pairs/dispatch: decode time is flat per-pair from 8 up (PERF r2),
    # so the bigger batch purely halves relay round trips; einsum-lookup
    # peak memory at 476×854 is ~4 GB (pyramids freed between directions)
    pair_batch: int = 16
    encode_batch: int = 8
    mesh: Optional[object] = None  # jax.sharding.Mesh: shard pair/frame axes
    compute_dtype: object = jnp.float32  # bf16 convs/GRU (corr + flow stay f32)

    def __post_init__(self):
        self.t, _, self.h, self.w = self.video_tchw.shape
        self.padder = raft.InputPadder(self.video_tchw.shape)
        self._padded = np.asarray(self.padder.pad(jnp.asarray(self.video_tchw)))
        self._enc = None  # lazy (fmap, net, inp), device-resident, T leading
        self._decode_jit = None  # cached jitted gather+decode
        self._sweep_jits = {}  # n_batches -> jitted per-start direct sweep
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

    def _direct_sweep_fn(self, n_batches: int):
        """ONE jitted program for a whole per-start direct-flow sweep:
        ``n_batches`` fixed-size pair chunks under ``lax.map`` (fwd+bwd
        decode + cycle mask per chunk) assembled to (t-1)-row outputs with
        static shapes.

        Everything stays on device — the naive split (decode → host →
        re-upload → mask) shuttles ~900 MB of flow fields over the host link
        per start frame. Just as important: ONE dispatch per start frame.
        The previous per-batch dispatch loop + eager slice/zeros/concat
        assembly had per-START-frame shapes, and the TPU-relay probe
        (scripts/perf_traj_probe.py) measured it at ~2.5-3.5 s of fixed
        overhead per call vs ~0.8 s/chunk of actual decode — per-shape eager
        compiles and extra round trips that summed to ~minutes per video.
        ``n_batches`` takes ceil((t-1-start)/pair_batch) distinct values
        (≤4 at T=50), so at most that many compiled variants exist; the
        ``start`` scalar itself is traced, not baked in."""
        mesh = self.mesh
        n_dev = mesh.devices.size if mesh is not None else 1
        bsz = max(self.pair_batch, n_dev)
        bsz -= bsz % n_dev
        tm1 = self.t - 1
        l, r, tp, bp = self.padder._pad
        h, w = self.h, self.w

        def unpad(x):
            hp, wp = x.shape[-2:]
            return x[..., tp:hp - bp, l:wp - r]

        def fn(params, fmaps, nets, inps, start, thresh):
            total = n_batches * bsz
            ks = jnp.arange(total, dtype=jnp.int32)
            tgt = jnp.clip(start + 1 + ks, 0, tm1)  # junk rows masked below
            src = jnp.full((total,), start, jnp.int32)

            def dec(i1, i2):
                f1 = constrain_batch(jnp.take(fmaps, i1, axis=0), mesh)
                f2 = constrain_batch(jnp.take(fmaps, i2, axis=0), mesh)
                net = constrain_batch(jnp.take(nets, i1, axis=0), mesh)
                inp = constrain_batch(jnp.take(inps, i1, axis=0), mesh)
                return constrain_batch(
                    raft.raft_decode(params, f1, f2, net, inp,
                                     num_iters=self.num_iters), mesh)

            def chunk(i):
                ia = jax.lax.dynamic_slice_in_dim(src, i * bsz, bsz)
                ib = jax.lax.dynamic_slice_in_dim(tgt, i * bsz, bsz)
                fwd = unpad(dec(ia, ib))  # bsz×2×h×w (source-frame grid)
                bwd = unpad(dec(ib, ia))
                # one implementation of the cycle-consistency mask shared
                # with the host oracle used by tests / alternate engines
                mask = _cycle_masks_batched(fwd, bwd, thresh).astype(
                    jnp.float32)
                return jnp.transpose(fwd, (0, 2, 3, 1)), mask  # n×h×w×2

            dflows, masks = jax.lax.map(
                chunk, jnp.arange(n_batches, dtype=jnp.int32))
            dflows = dflows.reshape(total, h, w, 2)
            masks = masks.reshape(total, h, w)
            valid = (start + 1 + ks) <= tm1
            dflows = jnp.where(valid[:, None, None, None], dflows, 0.0)
            masks = jnp.where(valid[:, None, None], masks, 0.0)
            if total >= tm1:
                dflows, masks = dflows[:tm1], masks[:tm1]
            else:
                pad = tm1 - total
                dflows = jnp.concatenate(
                    [dflows, jnp.zeros((pad, h, w, 2), jnp.float32)])
                masks = jnp.concatenate(
                    [masks, jnp.zeros((pad, h, w), jnp.float32)])
            return (constrain_batch(dflows, mesh),
                    constrain_batch(masks, mesh))

        return jax.jit(fn)

    def direct_flows(self, start: int, threshold: float
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Direct flow start→f for all f>start + fwd/bwd cycle masks
        (reference :99-160). Returns DEVICE arrays padded to the full frame
        count — ((t-1)×h×w×2 flows, (t-1)×h×w masks); rows ≥ t-1-start are
        zero. Downstream chaining consumes these on device directly. One
        dispatch per call (see _direct_sweep_fn)."""
        fmaps, nets, inps = self._encodings()
        n = self.t - 1 - start
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        bsz = max(self.pair_batch, n_dev)
        bsz -= bsz % n_dev
        n_batches = max(1, -(-n // bsz))
        fn = self._sweep_jits.get(n_batches)
        if fn is None:
            fn = self._sweep_jits[n_batches] = self._direct_sweep_fn(n_batches)

        def run():
            args = (self.params, fmaps, nets, inps,
                    jnp.asarray(start, jnp.int32),
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
    ``RaftFlowEngine._direct_sweep_fn`` and never leaves the device)."""
    masks = np.asarray(_cycle_masks_batched(
        jnp.asarray(fwd_n2hw), jnp.asarray(bwd_n2hw),
        jnp.asarray(threshold, jnp.float32)))
    dflows = np.transpose(fwd_n2hw, (0, 2, 3, 1))
    return dflows, masks.astype(np.float32)

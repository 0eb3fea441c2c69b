"""Trajectory + occlusion inference.

Behavior spec: reference models/model_inference.py (ModelInference). Given
trained params and the cached refined feature video:
  1. track every query point to all T frames;
  2. cosine similarity of the trajectory's features vs the query feature;
  3. *anchor* re-tracking — every trajectory point re-predicted to every
     anchor frame (frames with cos ≥ 0.7);
  4. occlusion rule: occluded iff the anchor-median distance exceeds the max
     median error at visible frames, OR cos < 0.6.

TPU redesign: the reference loops one query × one anchor at a time
(model_inference.py:69-72,137-147); here predictions go through a
multi-target kernel (tracker.get_point_predictions_multi_target): each
source point's embedding contracts against the frame set ONCE and its K
target predictions share that correlation pass — a K-fold FLOP cut over
carrying one (source, target) pair per row (trajectories K=T, anchor
re-tracking K=A). The variable-anchor medians become masked medians, and
anchors gather onto a padded max-visible axis (bucketed to the fixed set
{8, 16, 32, T} so kernel variants amortize across a whole benchmark, not
per video) instead of predicting all T×T pairs —
the reference re-tracks only from visible anchors
(model_inference.py:160-163). The flat one-pair-per-row path is kept as the
equality oracle (tests/test_inference.py). ``chunk`` bounds predictions per
dispatch and ``corr_budget_bytes`` the B×T×H'·W' correlation working set;
pass ``mesh`` to shard the source axis across chips.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import tracker
from ..models.tracker import TrackerConfig, TrackerInput


def _pad_to(x, n, axis=0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad)


@dataclasses.dataclass
class ModelInference:
    """Inference runtime over a trained tracker + cached refined features."""

    params: dict
    refined_features: jnp.ndarray  # T×C×h'×w' (eval-mode BN cache)
    cfg: TrackerConfig
    anchor_cosine_similarity_threshold: float = 0.5
    cosine_similarity_threshold: float = 0.5
    chunk: int = 4096
    mesh: Optional[object] = None  # jax.sharding.Mesh: shard the flat batch

    # cap on the B×T×h'w' f32 correlation intermediate per prediction chunk
    corr_budget_bytes: int = 2 << 30

    def __post_init__(self):
        t = self.refined_features.shape[0]
        # the prediction kernel materializes chunk×T×(h'·w') f32 correlations
        # (tracker.get_corr_maps) — scale the chunk so long videos fit in HBM
        hw = self.refined_features.shape[2] * self.refined_features.shape[3]
        max_chunk = max(256, int(self.corr_budget_bytes / (t * hw * 4)))
        self.chunk = min(self.chunk, max_chunk)
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        self.chunk = max(self.chunk - self.chunk % n_dev, n_dev)
        frames_set = jnp.arange(t, dtype=jnp.int32)
        scale = jnp.asarray([self.cfg.video_w - 1, self.cfg.video_h - 1],
                            jnp.float32)
        from ..parallel.mesh import constrain_batch
        mesh = self.mesh

        # the refined feature video and params enter the jitted fns as
        # ARGUMENTS — closing over them would bake GB-scale constants into
        # the compiled programs. The FrameView (compute-dtype cast + norms of
        # the full T-frame cache) is built once here instead of per dispatch.
        # Spec mode: with a ShapeDtypeStruct as ``refined_features`` no
        # device work happens at all — the instance can only prewarm().
        #
        # Internal layout is channels-last (T×h×w×C — the same r5 redesign
        # as the train step: row-DMA sampling gathers, C-minor correlation
        # GEMMs); the public ``refined_features`` field stays the NCHW
        # artifact contract and is transposed once here (the NCHW array is
        # kept — callers reuse the field to build further instances).
        if isinstance(self.refined_features, jax.ShapeDtypeStruct):
            st, sc, sh, sw = self.refined_features.shape
            self._refined_cl = jax.ShapeDtypeStruct(
                (st, sh, sw, sc), self.refined_features.dtype)
        else:
            self._refined_cl = jnp.transpose(self.refined_features,
                                             (0, 2, 3, 1))
        make_view = lambda r: tracker.make_frame_view(  # noqa: E731
            r, jnp.dtype(self.cfg.compute_dtype), channels_last=True)
        if isinstance(self._refined_cl, jax.ShapeDtypeStruct):
            self._view = jax.eval_shape(make_view, self._refined_cl)
        else:
            self._view = make_view(self._refined_cl)

        def predict(params, refined, view, source_points, source_frames,
                    target_frames):
            """B×3 pixel (x, y, t_abs) → B×2 pixel coords on target frames."""
            inp = TrackerInput(constrain_batch(source_points, mesh),
                               constrain_batch(source_frames, mesh),
                               constrain_batch(target_frames, mesh),
                               frames_set)
            out = tracker.get_point_predictions(params, inp, refined, self.cfg,
                                                view=view, channels_last=True)
            return constrain_batch((out + 1.0) * 0.5 * scale, mesh)

        _predict = jax.jit(predict)
        self._predict_jit = _predict

        def dispatch(p, sp, sf, tf):
            if mesh is not None:
                with mesh:
                    return _predict(p, self._refined_cl, self._view,
                                    sp, sf, tf)
            return _predict(p, self._refined_cl, self._view, sp, sf, tf)

        self._predict = dispatch

        def predict_multi(params, refined, view, source_points, source_frames,
                          target_frames_bk):
            """B×3 pixel (x, y, ·) + B×K target frames → B×K×2 pixel coords."""
            out = tracker.get_point_predictions_multi_target(
                params, constrain_batch(source_points, mesh),
                constrain_batch(source_frames, mesh),
                constrain_batch(target_frames_bk, mesh),
                refined, self.cfg, view=view, channels_last=True)
            return constrain_batch((out + 1.0) * 0.5 * scale, mesh)

        _predict_multi = jax.jit(predict_multi)
        self._predict_multi_jit = _predict_multi

        def dispatch_multi(p, sp, sf, tf):
            if mesh is not None:
                with mesh:
                    return _predict_multi(p, self._refined_cl, self._view,
                                          sp, sf, tf)
            return _predict_multi(p, self._refined_cl, self._view,
                                  sp, sf, tf)

        self._predict_multi = dispatch_multi

        def cos_sims_fn(refined, traj_flat, query_frames):
            """Trajectory-feature sampling + cosine-vs-query-frame in ONE
            program over a row-padded (N_p·T)×3 batch — the row count is the
            per-video query-point count, so unpadded eager math here would
            compile fresh (tiny but relay-priced) programs for every
            distinct N in a multi-video benchmark."""
            from ..utils import coords as cu
            norm = cu.normalize_points_for_sampling(
                traj_flat, self.cfg.video_h, self.cfg.video_w,
                self.cfg.dino_patch_size, self.cfg.stride)
            feats = tracker.sample_embeddings(refined, norm,
                                              channels_last=True)
            n_p = query_frames.shape[0]
            feats = feats.reshape(n_p, -1, feats.shape[-1])  # N_p×T×C
            qf = feats[jnp.arange(n_p), query_frames]  # N_p×C
            num = jnp.einsum("ntc,nc->nt", feats, qf)
            den = (jnp.linalg.norm(feats, axis=-1)
                   * jnp.linalg.norm(qf, axis=-1)[:, None])
            # torch cosine_similarity clamps the denominator at eps=1e-8
            return num / jnp.clip(den, min=1e-8)

        self._cos_sims = jax.jit(cos_sims_fn)

    # ------------------------------------------------------------------
    def prewarm(self, params, query_counts=(256,), include_flat: bool = False):
        """AOT-compile this video's inference programs into the persistent
        XLA cache — no device traffic, no real arrays needed.

        ``params`` may be real arrays or a matching ShapeDtypeStruct tree;
        ``jit.lower(specs).compile()`` populates the same on-disk compile
        cache the real dispatches read, so the process that later runs real
        inference at these shapes (this one or a fresh one) skips every
        relay compile. Covers the multi-target kernels at every anchor
        bucket {8, 16, 32, T} and the cos-sims program at the row-quantized
        ``query_counts`` (the warm-inference probe attributed the 80 s vs
        30 s first-video gap to exactly these compiles). Returns the labels
        of the programs built.
        """
        as_spec = lambda tree: jax.tree.map(  # noqa: E731
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype), tree)
        p_spec = as_spec(params)
        r_spec = as_spec(self._refined_cl)
        v_spec = as_spec(self._view)
        t = self.refined_features.shape[0]
        f32, i32 = jnp.float32, jnp.int32
        built = []

        def compile_(label, jitted, *specs):
            if self.mesh is not None:
                with self.mesh:
                    jitted.lower(*specs).compile()
            else:
                jitted.lower(*specs).compile()
            built.append(label)

        # trajectories use K=T; anchor re-tracking uses the fixed buckets
        for k in [t] + [b for b in (8, 16, 32) if b < t]:
            c = self._multi_chunk(k)
            compile_(f"multi_k{k}_c{c}", self._predict_multi_jit,
                     p_spec, r_spec, v_spec,
                     jax.ShapeDtypeStruct((c, 3), f32),
                     jax.ShapeDtypeStruct((c,), i32),
                     jax.ShapeDtypeStruct((c, k), i32))
        for q in query_counts:
            n32 = -(-int(q) // 32) * 32  # infer() row quantization
            n_p = -(-n32 // 64) * 64     # cos-sims row quantization
            compile_(f"cos_sims_n{n_p}", self._cos_sims, r_spec,
                     jax.ShapeDtypeStruct((n_p * t, 3), f32),
                     jax.ShapeDtypeStruct((n_p,), i32))
        if include_flat:
            compile_(f"flat_c{self.chunk}", self._predict_jit,
                     p_spec, r_spec, v_spec,
                     jax.ShapeDtypeStruct((self.chunk, 3), f32),
                     jax.ShapeDtypeStruct((self.chunk,), i32),
                     jax.ShapeDtypeStruct((self.chunk,), i32))
        return built

    # ------------------------------------------------------------------
    def _predict_chunked(self, source_points, source_frames, target_frames):
        b = source_points.shape[0]
        outs = []
        for s in range(0, b, self.chunk):
            e = min(s + self.chunk, b)
            sp = source_points[s:e]
            sf = source_frames[s:e]
            tf = target_frames[s:e]
            if e - s < self.chunk:
                n = self.chunk
                sp, sf, tf = _pad_to(sp, n), _pad_to(sf, n), _pad_to(tf, n)
                outs.append(self._predict(self.params, sp, sf, tf)[: e - s])
            else:
                outs.append(self._predict(self.params, sp, sf, tf))
        return jnp.concatenate(outs, axis=0)

    def _multi_chunk(self, k: int) -> int:
        """Sources per multi-target dispatch: bound the B×T×hw ``corr_all``
        (plus ~24·B·hw of per-slice head temporaries) by the corr budget AND
        keep predictions-per-dispatch ≤ the flat path's ``chunk`` knob."""
        t = self.refined_features.shape[0]
        hw = self.refined_features.shape[2] * self.refined_features.shape[3]
        by_budget = int(self.corr_budget_bytes / ((t + 24) * hw * 4))
        by_preds = self.chunk // k
        c = max(1, min(by_budget, by_preds))
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        # the n_dev floor is the one case allowed past the budget: a dispatch
        # can never carry fewer than one source per device
        return max(c - c % n_dev, n_dev)

    def _predict_multi_chunked(self, source_points, source_frames,
                               target_frames_bk):
        """Chunk the source axis; each dispatch predicts chunk×K points."""
        b, k = target_frames_bk.shape
        chunk = self._multi_chunk(k)
        outs = []
        for s in range(0, b, chunk):
            e = min(s + chunk, b)
            sp, sf = source_points[s:e], source_frames[s:e]
            tf = target_frames_bk[s:e]
            if e - s < chunk:
                sp, sf = _pad_to(sp, chunk), _pad_to(sf, chunk)
                tf = _pad_to(tf, chunk)
            outs.append(self._predict_multi(self.params, sp, sf, tf)[: e - s])
        return jnp.concatenate(outs, axis=0)

    def compute_trajectories(self, query_points) -> jnp.ndarray:
        """query_points N×3 (x, y, t) → trajectories N×T×3 (x, y, t)."""
        q = jnp.asarray(query_points, jnp.float32)
        n = q.shape[0]
        t = self.refined_features.shape[0]
        src_frames = q[:, 2].astype(jnp.int32)
        tgt_frames = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (n, t))
        coords = self._predict_multi_chunked(q, src_frames, tgt_frames)
        times = jnp.broadcast_to(jnp.arange(t, dtype=jnp.float32)[None, :, None],
                                 (n, t, 1))
        return jnp.concatenate([coords, times], axis=-1)

    def compute_trajectory_cos_sims(self, trajectories, query_points):
        """N×T cos sims between per-frame trajectory features and the
        query-frame feature (reference model_inference.py:110-126).
        Rows are padded to a multiple of 64 so the jitted program is shared
        across videos with different query-point counts (padded rows repeat
        row 0 and are sliced off)."""
        n, t = trajectories.shape[:2]
        traj = np.asarray(trajectories)
        qf = np.asarray(query_points)[:, 2].astype(np.int32)
        n_p = -(-n // 64) * 64
        if n_p != n:
            traj = np.concatenate(
                [traj, np.broadcast_to(traj[:1], (n_p - n,) + traj.shape[1:])])
            qf = np.concatenate([qf, np.zeros(n_p - n, np.int32)])
        cos = self._cos_sims(self._refined_cl,
                             jnp.asarray(traj.reshape(n_p * t, -1)),
                             jnp.asarray(qf))
        return cos[:n]

    def compute_anchor_trajectories(self, trajectories, cos_sims=None):
        """G[q, a, t] = trajectory point (q, t) re-tracked to anchor frame
        ``anchor_idx[q, a]`` (reference _get_model_preds_at_anchors:130-154).

        With ``cos_sims`` given, anchors are ONLY the visible frames
        (cos ≥ threshold, reference model_inference.py:160-163), gathered
        onto a padded axis whose size A is the smallest of the FIXED
        buckets {8, 16, 32, T} that fits the max visible count — cutting
        the dominant inference batch by ~T/T_vis vs predicting all T×T
        pairs. The bucket set is fixed (not per-video multiples of 8)
        because every distinct A compiles a fresh multi-target kernel
        variant: on a 30-video benchmark, per-video visible-anchor counts
        spawned a different variant almost every video (~425 s of relay
        compiles on video 1 of the warm-inference probe); four shared
        buckets amortize across the whole benchmark. Without ``cos_sims``
        every frame is an anchor (A = T).

        Returns (G N×A×T×2, anchor_idx N×A int32, anchor_valid N×A bool).
        """
        n, t = trajectories.shape[:2]
        if cos_sims is None:
            anchor_idx = np.broadcast_to(np.arange(t, dtype=np.int32), (n, t))
            anchor_valid = np.ones((n, t), bool)
        else:
            visible = np.asarray(cos_sims) >= self.anchor_cosine_similarity_threshold
            max_vis = int(visible.sum(1).max())
            a_cap = t
            for bucket in (8, 16, 32):
                if bucket >= max_vis and bucket < t:
                    a_cap = bucket
                    break
            # stable argsort puts visible indices first, in frame order
            order = np.argsort(~visible, axis=1, kind="stable")[:, :a_cap]
            anchor_valid = np.take_along_axis(visible, order, axis=1)
            # padded slots re-point at the row's first anchor (their
            # predictions are computed but masked out of the medians)
            anchor_idx = np.where(anchor_valid, order, order[:, :1]).astype(np.int32)
        a = anchor_idx.shape[1]

        # sources are the N·T trajectory points, each re-predicted onto the
        # query's A anchor frames — one multi-target row per trajectory point
        src = trajectories.reshape(-1, 3)  # (N·T)×3
        src_frames = src[:, 2].astype(jnp.int32)
        anchors = jnp.broadcast_to(
            jnp.asarray(anchor_idx)[:, None, :], (n, t, a)).reshape(-1, a)
        coords = self._predict_multi_chunked(src, src_frames, anchors)
        # (N·T)×A×2 → N×A×T×2
        coords = jnp.swapaxes(coords.reshape(n, t, a, 2), 1, 2)
        return (coords, jnp.asarray(anchor_idx), jnp.asarray(anchor_valid))

    def compute_occlusion(self, trajectories, cos_sims, anchor_trajectories,
                          anchor_idx=None, anchor_valid=None):
        """Masked-median occlusion rule (reference
        model_inference.py:169-200). Returns N×T bool.

        ``anchor_trajectories`` is N×A×T×2 over the (padded) anchor axis with
        ``anchor_idx``/``anchor_valid`` from compute_anchor_trajectories;
        legacy full-grid callers may pass N×T×T×2 alone (anchors = all
        frames, validity = visibility).
        """
        anch_th = self.anchor_cosine_similarity_threshold
        cos_th = self.cosine_similarity_threshold
        n, t = trajectories.shape[:2]
        visible = cos_sims >= anch_th  # N×T — over the time axis
        if anchor_idx is None:
            assert anchor_trajectories.shape[1] == t
            anchor_idx = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (n, t))
            anchor_valid = visible

        src = trajectories[:, :, :2]  # N×T×2
        traj_at_anchor = jnp.take_along_axis(
            src, anchor_idx[:, :, None], axis=1)  # N×A×2
        # dists[q, a, t] = ||G[q, a, t] - traj[q, anchor_idx[q, a]]||
        dists = jnp.linalg.norm(
            anchor_trajectories - traj_at_anchor[:, :, None, :], axis=-1)

        def masked_median(x, mask):
            """torch.median semantics (lower middle) over masked entries."""
            big = jnp.where(mask, x, jnp.inf)
            s = jnp.sort(big, axis=-1)
            cnt = jnp.sum(mask, axis=-1)
            idx = jnp.maximum((cnt - 1) // 2, 0)
            med = jnp.take_along_axis(s, idx[..., None], axis=-1)[..., 0]
            return jnp.where(cnt > 0, med, jnp.inf)

        # median over the anchor axis, masked by anchor validity
        med_over_anchors = masked_median(
            jnp.swapaxes(dists, 1, 2), anchor_valid[:, None, :])  # N×T(t)
        # threshold: max over visible t of that median
        med_at_visible = jnp.where(visible, med_over_anchors, -jnp.inf)
        th = jnp.max(med_at_visible, axis=-1, keepdims=True)  # N×1
        occluded = (med_over_anchors > th) | (cos_sims < cos_th)
        return occluded

    def infer(self, query_points, batch_size: Optional[int] = None
              ) -> Tuple[np.ndarray, np.ndarray]:
        """(trajectories N×T×2 pixel, occlusions N×T bool).

        The query rows are padded to a multiple of 32 (copies of row 0,
        sliced off at the end): every stage is row-independent, and the
        per-video query-point count otherwise leaks into the shape of every
        downstream program — the warm-inference probe measured ~90 s of
        fresh relay compiles on the second video of a benchmark just from a
        different point count. Row quantization makes all of them shared.
        (Duplicated rows cannot change the anchor bucket either: the bucket
        depends on the max visible count over rows, and a copy of row 0
        never exceeds row 0.)"""
        qp = np.asarray(query_points)
        n = qp.shape[0]
        n_p = -(-n // 32) * 32
        if n_p != n:
            qp = np.concatenate(
                [qp, np.broadcast_to(qp[:1], (n_p - n,) + qp.shape[1:])])
        trajs = self.compute_trajectories(qp)
        cos_sims = self.compute_trajectory_cos_sims(trajs, qp)
        anchors, anchor_idx, anchor_valid = self.compute_anchor_trajectories(
            trajs, cos_sims)
        occ = self.compute_occlusion(trajs, cos_sims, anchors,
                                     anchor_idx, anchor_valid)
        return np.asarray(trajs[:n, :, :2]), np.asarray(occ[:n])

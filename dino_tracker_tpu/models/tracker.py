"""Tracker core: refined embeddings -> correlation maps -> coordinates.

Functional redesign of the reference Tracker (models/tracker.py:17-325): no
module state or side-channel attributes — every function is pure over
(params, batch_stats, video, dino_embed) and jit/vmap/pjit-friendly. The
correlation ``einsum('bc,nchw->bnhw')`` is the MXU hot path: a B×C by
C×(N·H'·W') matmul in one shot.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import delta_dino as dd
from . import tracker_head as th
from ..utils import coords as coord_utils
from ..utils.sampling import sample_feature_video, sample_feature_video_thwc
from ..config import feature_grid_size

EPS = 1e-8


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    video_h: int = 476
    video_w: int = 854
    dino_patch_size: int = 14
    stride: int = 7
    argmax_radius: float = 35.0
    delta_channels: Tuple[int, ...] = (3, 64, 128, 256, 1024)
    # matmul/conv input dtype ("float32" | "bfloat16"); accumulation is
    # always f32 (preferred_element_type) and head/loss math stays f32
    compute_dtype: str = "float32"
    # Measured perf choices (round-5 on-chip A/B, scripts/perf_toggle_ab.py,
    # PERF.md round-5) — config fields so a bench run's exact code path is
    # serializable; defaults are the winners:
    #   blurpool_impl: "matmul" (banded dense matmuls) | "conv" (depthwise)
    #   reflect_pad_vjp: one-concat custom reflect-pad backward vs XLA's
    #   bias_stopgrad: prune the (exactly-zero) DeltaDINO conv-bias grad
    blurpool_impl: str = "matmul"
    reflect_pad_vjp: bool = True
    bias_stopgrad: bool = True

    @property
    def feat_hw(self) -> Tuple[int, int]:
        return feature_grid_size(self.video_h, self.video_w,
                                 self.dino_patch_size, self.stride)


class TrackerInput(NamedTuple):
    """One batch of point-prediction queries.

    source_points: B×3 (x, y, t) pixel coords (t unused after normalization —
      the frame is given by ``source_frame_indices`` into ``frames_set_t``).
    source_frame_indices / target_frame_indices: B indices into frames_set_t.
    frames_set_t: N absolute frame indices of the embedded frame set.
    """
    source_points: jnp.ndarray
    source_frame_indices: jnp.ndarray
    target_frame_indices: jnp.ndarray
    frames_set_t: jnp.ndarray


def init_tracker(key, cfg: TrackerConfig):
    k1, k2 = jax.random.split(key)
    dd_params, dd_stats = dd.init_delta_dino(k1, channels=cfg.delta_channels)
    params = {"delta_dino": dd_params, "tracker_head": th.init_tracker_head(k2)}
    batch_stats = {"delta_dino": dd_stats}
    return params, batch_stats


def _gather_frames(x_tchw, frames_set_t):
    """Gather frames along axis 0 (plain dynamic-gather form).

    The round-4 snapshot shipped a "flat 2-D row take" variant here
    (reshape to [T, C·h·w] + jnp.take), motivated by a device trace of the
    pre-r4 program that attributed a full-stack relayout to this gather.
    The round-5 on-chip A/B of the committed program (scripts/
    perf_toggle_ab.py, PERF.md round-5) measured the row-take form at
    218.5 ms/iter vs 134.3 ms/iter for this plain gather — the reshape
    itself forced the relayout it was meant to avoid. Keep the simple form.
    """
    return x_tchw[frames_set_t]


def get_refined_embeddings(params, batch_stats, video_tchw, dino_embed_tchw,
                           frames_set_t, cfg: TrackerConfig, train: bool,
                           channels_last: bool = False):
    """Refined = raw DINO + DeltaDINO residual for the frame set.

    Returns (refined N×C×h'×w', residual, raw, new_batch_stats).
    Reference models/tracker.py:113-129 (the 8-frame chunking there is a GPU
    memory workaround; on TPU the whole set is one batched conv).

    With ``channels_last`` the feature stack enters as T×h'×w'×C and every
    output is N×h'×w'×C — the train step's layout: the DeltaDINO conv stack
    already runs NHWC internally, the frame gather stays a row DMA, and the
    downstream correlations/sampling keep C on the minor (lane) axis.
    """
    # The resident feature stack may be f16 (the artifact dtype; 1.66 GB at
    # production scale as f32, halved as f16) — the gathered 8-frame slice
    # upcasts here, exactly where the old f32-at-load pipeline ended up.
    raw = _gather_frames(dino_embed_tchw, frames_set_t).astype(jnp.float32)
    frames = _gather_frames(video_tchw, frames_set_t)
    residual, new_dd_stats = dd.apply_delta_dino(
        params["delta_dino"], batch_stats["delta_dino"], frames, cfg.feat_hw,
        train=train, vit_stride=cfg.stride, vit_patch_size=cfg.dino_patch_size,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        bias_stopgrad=cfg.bias_stopgrad, reflect_vjp=cfg.reflect_pad_vjp,
        blurpool_impl=cfg.blurpool_impl, channels_last=channels_last)
    refined = raw + residual
    return refined, residual, raw, {"delta_dino": new_dd_stats}


def sample_embeddings(embeddings, points_b3, channels_last: bool = False):
    """Trilinear-sample the embedded frame set at B (x_norm, y_norm,
    frame_idx) points -> B×C (reference models/tracker.py:96-111).

    ``channels_last``: embeddings are N×h×w×C and the sampling runs as row
    gathers on (N·h·w)×C (the TPU-friendly direction) instead of lane
    gathers on a transposed C×(N·h·w) view."""
    if channels_last:
        return sample_feature_video_thwc(embeddings, points_b3,
                                         normalize_t=True)
    return sample_feature_video(embeddings, points_b3, normalize_t=True)


class FrameView(NamedTuple):
    """Per-step precomputed frame-embedding tensors shared by every loss
    term.

    Each of the ~10 per-step consumers (of-corr, 4 cycle predictions, the
    contrastive pair losses) otherwise re-flattens, re-casts (f32→compute
    dtype) and re-norms the same N×C×h'×w' refined stack — at the production
    shape that stack is 265 MB, so the redundant passes are pure HBM
    bandwidth. Build once per step with :func:`make_frame_view` and thread
    through ``view=``.

    Layout is channels-MINOR ([N, hw, C]): C=1024 fills the TPU's 128-lane
    registers, frame/position slabs are row slices, and every correlation
    einsum contracts the minor axis of both operands (the natural MXU GEMM).
    """
    flat_cd: jnp.ndarray  # N×(h'·w')×C, compute dtype
    norms: jnp.ndarray    # N×(h'·w'), f32


def make_frame_view(frame_embeddings, compute_dtype=jnp.float32,
                    channels_last: bool = False) -> FrameView:
    """Build the shared view from an N×C×h×w stack (default) or an
    N×h×w×C one (``channels_last`` — a free reshape, no transpose)."""
    if channels_last:
        n, h, w, c = frame_embeddings.shape
        flat = frame_embeddings.reshape(n, h * w, c)
    else:
        n, c, h, w = frame_embeddings.shape
        flat = frame_embeddings.reshape(n, c, h * w).transpose(0, 2, 1)
    return FrameView(flat.astype(compute_dtype),
                     jnp.linalg.norm(flat, axis=2))


def _frame_hw(frame_embeddings, channels_last: bool):
    if channels_last:
        return frame_embeddings.shape[1], frame_embeddings.shape[2]
    return frame_embeddings.shape[2], frame_embeddings.shape[3]


def get_corr_maps(source_embeddings_bc, frame_embeddings,
                  target_frame_indices_b, compute_dtype=jnp.float32,
                  view: Optional[FrameView] = None,
                  channels_last: bool = False):
    """Cosine correlation of each source embedding against its target frame.

    Computes the full B×N map stack as one MXU matmul then selects the target
    row (cheaper than gathering B full frames). Reference
    models/tracker.py:158-169.
    """
    n = frame_embeddings.shape[0]
    h, w = _frame_hw(frame_embeddings, channels_last)
    if view is None:
        view = make_frame_view(frame_embeddings, compute_dtype, channels_last)
    corr_all = jnp.einsum("bc,nkc->bnk",
                          source_embeddings_bc.astype(view.flat_cd.dtype),
                          view.flat_cd,
                          preferred_element_type=jnp.float32)  # B×N×(hw)
    tgt = target_frame_indices_b.astype(jnp.int32)
    # target selection as a one-hot contraction: backward is a dense outer
    # product instead of take_along_axis's scatter
    onehot = jax.nn.one_hot(tgt, n, dtype=corr_all.dtype)  # B×N
    corr = jnp.einsum("bnk,bn->bk", corr_all, onehot)  # B×hw

    target_norms = jnp.einsum("nk,bn->bk", view.norms, onehot)  # B×hw
    source_norms = jnp.linalg.norm(source_embeddings_bc, axis=1)[:, None]
    corr = corr / jnp.clip(source_norms * target_norms, min=EPS)
    return corr.reshape(-1, 1, h, w)


def get_point_predictions_from_embeddings(params, source_embeddings,
                                          frame_embeddings, target_frame_indices,
                                          cfg: TrackerConfig,
                                          view: Optional[FrameView] = None,
                                          channels_last: bool = False):
    corr_maps = get_corr_maps(source_embeddings, frame_embeddings,
                              target_frame_indices,
                              compute_dtype=jnp.dtype(cfg.compute_dtype),
                              view=view, channels_last=channels_last)
    corr_maps = jax.nn.relu(corr_maps)
    return th.apply_tracker_head(params["tracker_head"], corr_maps,
                                 (cfg.video_h, cfg.video_w),
                                 cfg.dino_patch_size, cfg.stride,
                                 cfg.argmax_radius)


def get_point_predictions(params, inp: TrackerInput, frame_embeddings,
                          cfg: TrackerConfig,
                          view: Optional[FrameView] = None,
                          channels_last: bool = False):
    """source points (pixel x, y, ·) -> predicted target coords in (-1, 1)."""
    pts = coord_utils.normalize_points_for_sampling(
        inp.source_points, cfg.video_h, cfg.video_w, cfg.dino_patch_size,
        cfg.stride)
    pts = jnp.concatenate(
        [pts[:, :2], inp.source_frame_indices[:, None].astype(pts.dtype)], axis=1)
    source_embeddings = sample_embeddings(frame_embeddings, pts, channels_last)
    return get_point_predictions_from_embeddings(
        params, source_embeddings, frame_embeddings, inp.target_frame_indices,
        cfg, view=view, channels_last=channels_last)


def get_point_predictions_grouped(params, points_gp3, source_frame_idx_g,
                                  target_frame_idx_g, frame_embeddings,
                                  cfg: TrackerConfig,
                                  view: Optional[FrameView] = None,
                                  mesh=None, channels_last: bool = False):
    """Blocked prediction: group g's P points all live on frame
    ``source_frame_idx_g[g]`` and re-predict onto ``target_frame_idx_g[g]``.

    The flat path computes each point's correlation against ALL N frames
    and one-hot-selects the target (necessary when target frames vary per
    point, as in the of loss); cycle-consistency batches come in
    fixed-size per-pair blocks with ONE target frame per block, so the
    correlation contracts against just that frame — an N-fold FLOP and
    intermediate-memory cut (N=8 at production config) for identical math.

    With ``mesh`` the per-group point axis P shards over ``data`` (G is
    small — cyc_n_frames — so it cannot feed an 8-chip mesh; P=256 can),
    and the head runs on a P-major flattening so the merged (P·G) axis
    inherits the sharding without a regrouping collective.

    points_gp3: G×P×(x, y, ·) pixel coords. Returns G×P×2 coords in (-1,1).
    """
    from ..parallel.mesh import constrain_axis

    g, p, _ = points_gp3.shape
    n = frame_embeddings.shape[0]
    h, w = _frame_hw(frame_embeddings, channels_last)
    c = view.flat_cd.shape[-1] if view is not None else (
        frame_embeddings.shape[-1] if channels_last
        else frame_embeddings.shape[1])
    if view is None:
        view = make_frame_view(frame_embeddings, jnp.dtype(cfg.compute_dtype),
                               channels_last)

    pts = coord_utils.normalize_points_for_sampling(
        points_gp3.reshape(g * p, 3), cfg.video_h, cfg.video_w,
        cfg.dino_patch_size, cfg.stride)
    src_frames = jnp.repeat(source_frame_idx_g, p).astype(pts.dtype)
    pts = jnp.concatenate([pts[:, :2], src_frames[:, None]], axis=1)
    src_f = sample_embeddings(frame_embeddings, pts,
                              channels_last).reshape(g, p, c)
    src_f = constrain_axis(src_f, mesh, 1)

    tgt = target_frame_idx_g.astype(jnp.int32)
    tgt_flat = jnp.take(view.flat_cd, tgt, axis=0)   # G×hw×C
    corr = jnp.einsum("gpc,gkc->gpk", src_f.astype(view.flat_cd.dtype),
                      tgt_flat, preferred_element_type=jnp.float32)
    tgt_norms = jnp.take(view.norms, tgt, axis=0)    # G×hw
    src_norms = jnp.linalg.norm(src_f, axis=2)       # G×P
    corr = corr / jnp.clip(src_norms[..., None] * tgt_norms[:, None, :],
                           min=EPS)
    corr = constrain_axis(corr, mesh, 1)
    if mesh is None:
        corr_maps = jax.nn.relu(corr.reshape(g * p, 1, h, w))
        out = th.apply_tracker_head(params["tracker_head"], corr_maps,
                                    (cfg.video_h, cfg.video_w),
                                    cfg.dino_patch_size, cfg.stride,
                                    cfg.argmax_radius)
        return out.reshape(g, p, 2)
    # P-major flatten: the sharded P axis leads the merge, so the head's
    # (P·G)-row batch stays partitioned (G-major would shard the second
    # merged dim, which GSPMD must regroup). The head is per-row, so the
    # permutation is undone exactly on the way out.
    corr_maps = jax.nn.relu(corr.transpose(1, 0, 2).reshape(p * g, 1, h, w))
    corr_maps = constrain_axis(corr_maps, mesh, 0)
    out = th.apply_tracker_head(params["tracker_head"], corr_maps,
                                (cfg.video_h, cfg.video_w),
                                cfg.dino_patch_size, cfg.stride,
                                cfg.argmax_radius)
    return out.reshape(p, g, 2).transpose(1, 0, 2)


def get_point_predictions_multi_target(params, source_points_b3,
                                       source_frame_idx_b, target_frames_bk,
                                       frame_embeddings, cfg: TrackerConfig,
                                       view: Optional[FrameView] = None,
                                       channels_last: bool = False):
    """One source point → K target frames, sharing one correlation pass.

    The flat path (``get_point_predictions``) carries one (source, target)
    pair per row, so predicting a point onto K frames contracts its embedding
    against ALL N frames K times and one-hot-selects — an N-fold FLOP
    redundancy per target. Here each source embedding contracts against the
    frame set ONCE (``corr_all`` B×N×hw) and the K target rows are gathered;
    the tracker head then runs per target slice under ``lax.map`` so its
    16-channel hidden conv only ever materializes B maps at a time.

    Inference is the caller (reference model_inference.py:69-72,137-147
    re-predicts every trajectory point onto every anchor frame): trajectories
    use K=T, anchor re-tracking K=A. Inference-only — gathers here are
    forward-only by design (no one-hot backward needed).

    source_points_b3: B×(x, y, ·) pixel coords. target_frames_bk: B×K int.
    Returns B×K×2 coords in (-1, 1).
    """
    b, k = target_frames_bk.shape
    n = frame_embeddings.shape[0]
    h, w = _frame_hw(frame_embeddings, channels_last)
    if view is None:
        view = make_frame_view(frame_embeddings, jnp.dtype(cfg.compute_dtype),
                               channels_last)

    pts = coord_utils.normalize_points_for_sampling(
        source_points_b3, cfg.video_h, cfg.video_w, cfg.dino_patch_size,
        cfg.stride)
    pts = jnp.concatenate(
        [pts[:, :2], source_frame_idx_b[:, None].astype(pts.dtype)], axis=1)
    src = sample_embeddings(frame_embeddings, pts, channels_last)  # B×C
    corr_all = jnp.einsum("bc,nkc->bnk", src.astype(view.flat_cd.dtype),
                          view.flat_cd,
                          preferred_element_type=jnp.float32)  # B×N×hw
    src_norms = jnp.linalg.norm(src, axis=1)  # B

    def head_one_target(tgt_b):  # B int32: this slice's target frame per row
        corr_k = jnp.take_along_axis(
            corr_all, tgt_b[:, None, None], axis=1)[:, 0]  # B×hw
        norms_k = jnp.take(view.norms, tgt_b, axis=0)      # B×hw
        corr_k = corr_k / jnp.clip(src_norms[:, None] * norms_k, min=EPS)
        maps = jax.nn.relu(corr_k).reshape(b, 1, h, w)
        return th.apply_tracker_head(params["tracker_head"], maps,
                                     (cfg.video_h, cfg.video_w),
                                     cfg.dino_patch_size, cfg.stride,
                                     cfg.argmax_radius)

    tgt = target_frames_bk.astype(jnp.int32)
    out = jax.lax.map(head_one_target, jnp.swapaxes(tgt, 0, 1))  # K×B×2
    return jnp.swapaxes(out, 0, 1)


class ForwardAux(NamedTuple):
    frame_embeddings: jnp.ndarray  # refined, N×C×h'×w'
    raw_embeddings: jnp.ndarray    # N×C×h'×w'
    batch_stats: dict


def forward(params, batch_stats, video_tchw, dino_embed_tchw,
            inp: TrackerInput, cfg: TrackerConfig, train: bool,
            use_raw_features: bool = False,
            refined_cache: Optional[jnp.ndarray] = None):
    """Full tracker forward (reference models/tracker.py:303-325).

    Returns (coords B×2 in (-1,1), ForwardAux). Embeddings are returned
    explicitly instead of stashed on the module (the reference's
    ``self.frame_embeddings`` side-channel) so loss terms stay pure.
    """
    if use_raw_features:
        raw = dino_embed_tchw[inp.frames_set_t].astype(jnp.float32)
        frame_embeddings = raw
        new_stats = batch_stats
    elif refined_cache is not None:
        frame_embeddings = refined_cache[inp.frames_set_t]
        raw = dino_embed_tchw[inp.frames_set_t].astype(jnp.float32)
        new_stats = batch_stats
    else:
        frame_embeddings, _, raw, new_stats = get_refined_embeddings(
            params, batch_stats, video_tchw, dino_embed_tchw,
            inp.frames_set_t, cfg, train)
    coords = get_point_predictions(params, inp, frame_embeddings, cfg)
    return coords, ForwardAux(frame_embeddings, raw, new_stats)


def make_refine_fn(cfg: TrackerConfig, mesh=None):
    """The jitted eval-mode refine program used by cache_refined_embeddings
    (and AOT-prewarmed by runtime.prewarm_inference). Everything enters as
    arguments (no baked-in constants), and chunk shapes stay static (clamped
    indices) so there is exactly one compile per (cfg, shapes)."""
    from ..parallel.mesh import constrain_batch

    return jax.jit(
        lambda p, bs, v, d, fs: constrain_batch(
            get_refined_embeddings(p, bs, v, d,
                                   constrain_batch(fs, mesh), cfg,
                                   train=False)[0], mesh))


def cache_refined_embeddings(params, batch_stats, video_tchw, dino_embed_tchw,
                             cfg: TrackerConfig, frames_chunk: int = 16,
                             mesh=None):
    """Inference-time cache: refined features for ALL frames (eval-mode BN).

    Chunked over frames to bound peak activation memory on long videos
    (reference models/tracker.py:131-135); with ``mesh`` the per-chunk
    DeltaDINO conv batch shards its frame axis over the devices.
    """
    t = video_tchw.shape[0]
    chunks = []
    refine = make_refine_fn(cfg, mesh)
    n_dev = mesh.devices.size if mesh is not None else 1
    frames_chunk = max(frames_chunk - frames_chunk % n_dev, n_dev)
    for start in range(0, t, frames_chunk):
        e = min(start + frames_chunk, t)
        idx = jnp.minimum(jnp.arange(start, start + frames_chunk), t - 1)
        if mesh is not None:
            with mesh:
                out = refine(params, batch_stats, video_tchw,
                             dino_embed_tchw, idx)
        else:
            out = refine(params, batch_stats, video_tchw, dino_embed_tchw, idx)
        chunks.append(out[: e - start])
    return jnp.concatenate(chunks, axis=0)

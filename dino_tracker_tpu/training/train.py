"""The jitted train step and per-video training loop.

The reference hot loop (dino_tracker.py:392-448) does ~15 separate kernel
launches per iteration with host-side sampling; here the ENTIRE iteration —
trajectory sampling, DeltaDINO refinement, all six loss terms, backward,
Adam + LR schedule — is one compiled XLA program. Phase gates
(``apply_cyc_after`` / ``apply_cl_ref_after`` = 5000) are static branches:
two compiled variants, swapped at the phase boundary.

Parallelism: the step is written mesh-polymorphic — under a
``jax.sharding.Mesh`` the batch (points) axis and the frame-set axis shard
across chips with replicated params; gradients reduce over ICI via the
compiler-inserted psum (see parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TrainConfig
from ..models import tracker
from ..models.tracker import TrackerConfig, TrackerInput
from ..structures import BBData
from . import checkpoint as ckpt_lib
from . import contrastive, cycle, losses
from .sampler import TrajectoryBank, sample_batch
from .sampler import resolve_fg_batch as sampler_resolve_fg_batch

logger = logging.getLogger(__name__)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


class VideoData(NamedTuple):
    """Per-video device-resident training data."""
    video: jnp.ndarray        # T×3×H×W float32 [0,1]
    dino_embed: jnp.ndarray   # T×C×h'×w', f16 (artifact dtype) or f32;
                              # upcast to f32 per gathered frame set
    fg_masks: jnp.ndarray     # T×H×W float32
    bb: BBData
    fg_bank: TrajectoryBank
    bg_bank: TrajectoryBank


def make_optimizer(cfg: TrainConfig):
    """Adam per param-group with the reference's LR schedule: delta_dino
    decays γ^(step//every), tracker_head constant
    (optimization/schedulers.py:4-8, dino_tracker.py:110-121)."""
    def dd_schedule(count):
        return cfg.lr_delta_dino * cfg.scheduler_gamma ** (
            count // cfg.apply_scheduler_every)

    tx = optax.multi_transform(
        {"dd": optax.chain(optax.scale_by_adam(),
                           optax.scale_by_schedule(dd_schedule),
                           optax.scale(-1.0)),
         "head": optax.chain(optax.scale_by_adam(),
                             optax.scale(-cfg.lr_cnn_refiner))},
        param_labels={"delta_dino": "dd", "tracker_head": "head"})
    return tx


def init_train_state(key, cfg: TrainConfig, tcfg: TrackerConfig) -> TrainState:
    params, batch_stats = tracker.init_tracker(key, tcfg)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    return TrainState(params, batch_stats, opt_state, jnp.asarray(0, jnp.int32))


def make_train_step(cfg: TrainConfig, tcfg: TrackerConfig,
                    use_cyc: bool, use_cl_ref: bool, mesh=None,
                    steps_per_call: int = 1, fg_batch: Optional[int] = None):
    """Build the jitted step for one phase. use_cyc/use_cl_ref are static.

    With ``mesh`` the point-batch and frame axes shard over the ``data``
    mesh axis (params replicated; XLA inserts the gradient psum).

    ``steps_per_call > 1`` rolls that many train iterations into one program
    via lax.scan — per-dispatch host↔device latency (dominant on remote-relay
    TPU setups) amortizes across the chunk; returned metrics are chunk means.
    """
    tx = make_optimizer(cfg)
    from ..parallel.mesh import constrain_batch

    def train_step_body(state: TrainState, data: VideoData, key):
        video_len = data.video.shape[0]
        k_sample, k_cyc, k_cl_dino, k_cl_ref = jax.random.split(key, 4)

        sample = sample_batch(k_sample, data.fg_bank, data.bg_bank,
                              cfg.train_batch_size, cfg.batch_n_frames,
                              cfg.fg_traj_ratio, video_len,
                              cfg.video_resw, cfg.video_resh,
                              fg_batch=fg_batch)
        inp = TrackerInput(constrain_batch(sample.t1_points, mesh),
                           constrain_batch(sample.source_frame_indices, mesh),
                           constrain_batch(sample.target_frame_indices, mesh),
                           sample.frames_set_t)
        labels = constrain_batch(sample.t2_points_normalized[:, :2], mesh)

        def loss_fn(params):
            # channels-last hot path: the resident stack arrives T×h'×w'×C
            # (transposed once per fused call below), so the frame gather is
            # a row DMA, the refiner skips its output transpose, and every
            # correlation/sampling consumer keeps C on the lane axis
            refined, _, raw, new_stats = tracker.get_refined_embeddings(
                params, state.batch_stats, data.video, data.dino_embed,
                sample.frames_set_t, tcfg, train=True, channels_last=True)
            refined = constrain_batch(refined, mesh)
            # one cast+norm pass of the refined stack, shared by every loss
            # term (otherwise each re-reads the 265 MB stack to recompute it)
            view = tracker.make_frame_view(refined,
                                           jnp.dtype(tcfg.compute_dtype),
                                           channels_last=True)
            metrics = {}
            # of targets vary per point -> flat all-frames+select path
            coords = tracker.get_point_predictions(params, inp, refined,
                                                   tcfg, view=view,
                                                   channels_last=True)
            if use_cyc:
                # cycle points come in fixed per-pair blocks with one
                # target frame each -> blocked single-target correlations
                # (8x fewer corr FLOPs than the flat path, same math)
                cyc_data = cycle.generate_cycle_data(
                    k_cyc, params, refined, sample.frames_set_t, data.fg_masks,
                    tcfg, cfg.cyc_n_frames, cfg.cyc_batch_size_per_frame,
                    cfg.cyc_fg_points_ratio, cfg.cyc_thresh, view=view,
                    mesh=mesh, channels_last=True)
                l_cyc = cycle.cycle_consistency_loss(
                    params, refined, sample.frames_set_t, cyc_data, tcfg,
                    cfg.cyc_gamma, view=view,
                    group_size=cfg.cyc_batch_size_per_frame, mesh=mesh,
                    channels_last=True)
            else:
                l_cyc = jnp.asarray(0.0)
            l_of = jnp.mean(losses.huber(coords, labels))
            metrics["loss_of"] = l_of
            metrics["loss_cyc"] = l_cyc
            total = l_of + (cfg.lambda_cyc * l_cyc if use_cyc else 0.0)

            if use_cl_ref:
                l_cl_ref = contrastive.refined_bb_contrastive_loss(
                    k_cl_ref, refined, sample.frames_set_t, data.fg_masks,
                    tcfg, cfg.cl_n_frames, cfg.cl_points_per_pair,
                    cfg.cl_fg_points_ratio, cfg.cl_temp, cfg.cl_div_ref_bb,
                    view=view, channels_last=True)
                metrics["loss_cl_refiner"] = l_cl_ref
                total = total + cfg.lambda_cl_ref_bb * l_cl_ref
            else:
                metrics["loss_cl_refiner"] = jnp.asarray(0.0)

            l_cl_dino = contrastive.dino_bb_contrastive_loss(
                k_cl_dino, refined, sample.frames_set_t, data.bb,
                data.fg_masks, tcfg, cfg.cl_n_frames, cfg.cl_points_per_pair,
                cfg.cl_fg_points_ratio, cfg.cl_temp, cfg.cl_div_dino_bb,
                cfg.bb_amb_sig_a, cfg.bb_amb_sig_b, view=view,
                channels_last=True)
            l_norm = losses.emb_norm_regularization(refined, raw,
                                                    channels_last=True)
            l_angle = losses.emb_angle_regularization(refined, raw,
                                                      channels_last=True)
            total = (total + cfg.lambda_cl_dino_bb * l_cl_dino
                     + cfg.lambda_emb_norm * l_norm
                     + cfg.lambda_angle * l_angle)
            metrics.update({"loss_cl_dino_bb": l_cl_dino,
                            "loss_emb_norm_reg": l_norm,
                            "loss_angle_reg": l_angle,
                            "loss_total": total})
            return total, (new_stats, metrics)

        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_stats, new_opt_state,
                          state.step + 1), metrics

    def to_channels_last(data: VideoData) -> VideoData:
        # One T×h'×w'×C copy of the resident stack per fused call (≈2 ms for
        # the f16 DAVIS-scale stack, amortized over steps_per_call iters).
        # Inside the step every consumer then sees C-minor tiles; the r5
        # trace showed the per-iter alternative — XLA relayouting the FULL
        # channels-first stack inside the scan body to serve the 8-frame
        # gather — at 5.7 ms/iter.
        return data._replace(
            dino_embed=jnp.transpose(data.dino_embed, (0, 2, 3, 1)))

    if steps_per_call == 1:
        return jax.jit(lambda state, data, key: train_step_body(
            state, to_channels_last(data), key))

    @jax.jit
    def train_multi(state: TrainState, data: VideoData, key):
        data = to_channels_last(data)
        keys = jax.random.split(key, steps_per_call)
        def one(carry, k):
            new_state, metrics = train_step_body(carry, data, k)
            return new_state, metrics
        state, metrics = jax.lax.scan(one, state, keys)
        return state, jax.tree.map(lambda m: jnp.mean(m), metrics)

    return train_multi


@dataclasses.dataclass
class Trainer:
    """Per-video training driver: phase-aware compiled steps, logging,
    checkpointing (reference train loop dino_tracker.py:392-448)."""

    cfg: TrainConfig
    tcfg: TrackerConfig
    data: VideoData
    ckpt_folder: str
    seed: int = 2
    bank_rotator: Optional[object] = None  # sampler.BankRotator for long videos
    mesh: Optional[object] = None  # jax.sharding.Mesh: shard batch over chips
    # called once, after the first step chunk returns (i.e. after the train
    # step finished compiling) — the runtime hangs the background inference
    # prewarm here so its relay compiles never contend with the train step's
    after_first_chunk: Optional[Callable[[], None]] = None

    def __post_init__(self):
        self._steps = {}

    def _step_fn(self, i: int, n: int):
        use_cyc = i >= self.cfg.apply_cyc_after
        use_cl_ref = i >= self.cfg.apply_cl_ref_after
        fg_batch = sampler_resolve_fg_batch(
            self.data.fg_bank, self.data.bg_bank,
            self.cfg.train_batch_size, self.cfg.fg_traj_ratio)
        key = (use_cyc, use_cl_ref, n, fg_batch)
        if key not in self._steps:
            self._steps[key] = make_train_step(self.cfg, self.tcfg,
                                               use_cyc, use_cl_ref,
                                               mesh=self.mesh,
                                               steps_per_call=n,
                                               fg_batch=fg_batch)
        return self._steps[key]

    def _next_chunk(self, i: int, log_interval: int) -> int:
        """Longest chunk from ``i`` that crosses no phase/log/ckpt/rotation
        boundary (with default configs every boundary is a multiple of
        steps_per_call, so this stays one compiled variant per phase)."""
        cfg = self.cfg
        n = min(max(cfg.steps_per_call, 1), cfg.total_iterations - i)
        for boundary in (cfg.apply_cyc_after, cfg.apply_cl_ref_after):
            if i < boundary:
                n = min(n, boundary - i)
        for interval in (log_interval, cfg.checkpoint_interval,
                         cfg.sampler_batch_iterations):
            if interval > 0:
                next_mult = ((i // interval) + 1) * interval
                n = min(n, next_mult - i)
        return max(n, 1)

    def train(self, log_interval: int = 100,
              progress: bool = True) -> TrainState:
        key = jax.random.PRNGKey(self.seed)
        state = init_train_state(key, self.cfg, self.tcfg)

        loaded, init_iter = ckpt_lib.load_latest(self.ckpt_folder, state)
        if loaded is not None and init_iter > 0:
            state = loaded
            logger.info("resumed from iter %d", init_iter)
        i = max(init_iter, 0)

        bar = None
        if progress:
            try:
                from tqdm import tqdm
                bar = tqdm(total=self.cfg.total_iterations, initial=i)
            except ImportError:
                pass

        running, running_n = {}, 0
        saver = ckpt_lib.AsyncSaver()
        while i < self.cfg.total_iterations:
            n = self._next_chunk(i, log_interval)
            key, sub = jax.random.split(key)
            step = self._step_fn(i, n)
            if self.mesh is not None:
                with self.mesh:
                    state, metrics = step(state, self.data, sub)
            else:
                state, metrics = step(state, self.data, sub)
            if self.after_first_chunk is not None:
                cb, self.after_first_chunk = self.after_first_chunk, None
                cb()
            for k, v in metrics.items():
                running[k] = running.get(k, 0.0) + v * n
            running_n += n
            i += n
            if bar is not None:
                bar.update(n)
            if i % log_interval == 0:
                logger.info("iter %d: %s", i, {
                    k: float(v) / running_n for k, v in running.items()})
                running, running_n = {}, 0
            if (i % self.cfg.checkpoint_interval == 0
                    and i < self.cfg.total_iterations):
                # async: the state fetch (~25-30 s over the relay) overlaps
                # the next chunks' dispatches; join() below gates completion.
                # The final state is saved synchronously after the loop.
                saver.save(self.ckpt_folder, state, i)
            # rotate the HBM trajectory window (reference load_next_batch,
            # dino_tracker.py:444-446)
            if (self.bank_rotator is not None
                    and i % self.cfg.sampler_batch_iterations == 0
                    and i < self.cfg.total_iterations):
                fg_bank, bg_bank = self.bank_rotator.advance()
                self.data = self.data._replace(fg_bank=fg_bank,
                                               bg_bank=bg_bank)
        if bar is not None:
            bar.close()
        saver.join()  # all interval saves landed (or their failure raises)
        ckpt_lib.save_state(self.ckpt_folder, state,
                            self.cfg.total_iterations)
        return state

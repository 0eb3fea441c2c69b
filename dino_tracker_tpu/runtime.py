"""Per-video runtime: artifact loading, training and inference drivers.

Equivalent of the reference ``DINOTracker`` class (dino_tracker.py:22-448) +
the model-loading glue in the CLIs: binds a video's on-disk artifacts
(features, trajectories, masks, best buddies) to device arrays and exposes
train / infer entry points.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import TrainConfig, add_config_paths
from .models.tracker import TrackerConfig
from .structures import load_bb_data
from .training import checkpoint as ckpt_lib
from .training import train as train_lib
from .training.sampler import build_bank
from .inference.infer import ModelInference
from .models import tracker as tracker_lib
from .utils import video_io

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class DINOTrackerRuntime:
    data_path: str
    cfg: TrainConfig
    seed: int = 2
    # number of chips to shard over (0 = single device). Turns on the
    # mesh-sharded train/inference paths (parallel/mesh.py) — the point
    # batch, frame, and flat-prediction axes shard over the ``data`` axis
    mesh_devices: int = 0

    def __post_init__(self):
        from .utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()
        self.mesh = None
        if self.mesh_devices:
            from .parallel.mesh import make_mesh
            self.mesh = make_mesh(self.mesh_devices)
        self.paths = add_config_paths(self.data_path)
        self.tcfg = TrackerConfig(
            video_h=self.cfg.video_resh, video_w=self.cfg.video_resw,
            dino_patch_size=self.cfg.dino_patch_size, stride=self.cfg.stride,
            delta_channels=(3, 64, 128, 256, self.cfg.dino_embed_dim),
            compute_dtype=self.cfg.compute_dtype)
        self.orig_h, self.orig_w, self.video_len = \
            video_io.get_original_video_res(self.paths["video_folder"])
        self._data = None

    # ------------------------------------------------------------------
    def load_video_data(self) -> train_lib.VideoData:
        if self._data is not None:
            return self._data
        # Kept at the artifact's dtype (f16 by default): the resident stack
        # only ever feeds the per-step 8-frame gather, which upcasts its
        # output to f32 — resident f16 is numerically IDENTICAL to upcasting
        # here (f16→f32 is exact) while halving the 1.66 GB stack's HBM
        # footprint and the gather's read traffic.
        dino = video_io.load_npz(self.paths["dino_embed_video_path"])["features"]
        want = self.tcfg.delta_channels[-1]
        if dino.shape[1] != want:
            raise ValueError(
                f"feature artifact has {dino.shape[1]} channels but the "
                f"refiner emits {want} (dino_model_name="
                f"{self.cfg.dino_model_name}) — the video was preprocessed "
                f"with a different DINO variant than this config trains "
                f"against")
        # preprocessing may have capped the video at max_frames; every
        # artifact shares the feature video's length — load to match so
        # clamped gathers can never silently alias frames
        t_feat = dino.shape[0]
        video = video_io.load_video(
            self.paths["video_folder"],
            resize=(self.cfg.video_resh, self.cfg.video_resw),
            num_frames=t_feat)
        assert video.shape[0] == t_feat, (
            f"video has {video.shape[0]} frames but features cover {t_feat}")
        fg_masks = video_io.load_masks(self.paths["masks_path"],
                                       h_resize=self.cfg.video_resh,
                                       w_resize=self.cfg.video_resw)[:t_feat]
        bb = load_bb_data(os.path.join(self.paths["dino_bb_dir"],
                                       "dino_best_buddies_filtered.npz"))
        fg = video_io.load_npz(self.paths["fg_trajectories_file"])["trajectories"]
        bg = video_io.load_npz(self.paths["bg_trajectories_file"])["trajectories"]
        self._rotator = None
        if self.cfg.keep_traj_in_cpu:
            from .training.sampler import BankRotator
            self._rotator = BankRotator(fg, bg)
            fg_bank, bg_bank = self._rotator.current()
        else:
            fg_bank, bg_bank = build_bank(fg), build_bank(bg)
        self._data = train_lib.VideoData(
            video=jnp.asarray(video), dino_embed=jnp.asarray(dino),
            fg_masks=jnp.asarray(fg_masks), bb=bb,
            fg_bank=fg_bank, bg_bank=bg_bank)
        return self._data

    # ------------------------------------------------------------------
    def train(self) -> train_lib.TrainState:
        data = self.load_video_data()
        trainer = train_lib.Trainer(cfg=self.cfg, tcfg=self.tcfg, data=data,
                                    ckpt_folder=self.paths["ckpt_folder"],
                                    seed=self.seed,
                                    bank_rotator=self._rotator,
                                    mesh=self.mesh,
                                    after_first_chunk=self.prewarm_inference)
        return trainer.train()

    # ------------------------------------------------------------------
    def load_state(self, step: Optional[int] = None) -> train_lib.TrainState:
        template = train_lib.init_train_state(
            jax.random.PRNGKey(self.seed), self.cfg, self.tcfg)
        return ckpt_lib.load_state(self.paths["ckpt_folder"], template, step)

    def get_model_inference(self, step: Optional[int] = None,
                            chunk: int = 4096) -> ModelInference:
        # Lean load: inference consumes only (params, video, features).
        # load_video_data() additionally ships the BB pair tensors and
        # trajectory banks (~0.6 GB at DAVIS scale) that only training
        # reads — through the relay that upload dominated per-video
        # benchmark inference. The feature video also stays in its on-disk
        # f16 on the wire (half the bytes): raw + residual promotes to f32
        # on device, bit-identical to upcasting on the host (every f16
        # value is exactly representable in f32).
        if self._data is not None:
            video, dino = self._data.video, self._data.dino_embed
        else:
            dino_np = video_io.load_npz(
                self.paths["dino_embed_video_path"])["features"]
            want = self.tcfg.delta_channels[-1]
            if dino_np.shape[1] != want:
                raise ValueError(
                    f"feature artifact has {dino_np.shape[1]} channels but "
                    f"the refiner emits {want} — the video was preprocessed "
                    "with a different DINO variant than this config")
            t_feat = dino_np.shape[0]
            video = jnp.asarray(video_io.load_video(
                self.paths["video_folder"],
                resize=(self.cfg.video_resh, self.cfg.video_resw),
                num_frames=t_feat))
            dino = jnp.asarray(dino_np)
        state = self.load_state(step)
        refined = tracker_lib.cache_refined_embeddings(
            state.params, state.batch_stats, video, dino,
            self.tcfg, mesh=self.mesh)
        return ModelInference(
            params=state.params, refined_features=refined, cfg=self.tcfg,
            anchor_cosine_similarity_threshold=
                self.cfg.anchor_cosine_similarity_threshold,
            cosine_similarity_threshold=self.cfg.cosine_similarity_threshold,
            chunk=chunk, mesh=self.mesh)

    # ------------------------------------------------------------------
    def prewarm_inference(self, query_counts=(256,), background: bool = True,
                          include_refine: bool = True, chunk: int = 4096):
        """AOT-compile this video's inference programs into the persistent
        XLA cache from shape specs alone — no device traffic, no artifact
        loads beyond an .npz header read.

        Called in a daemon thread during training (runtime.train), so by
        the time inference runs — later in this process or in a fresh one —
        every relay compile is a disk-cache hit and video 1 of a benchmark
        behaves like video N (the warm-inference probe measured 80 s cold
        vs 30 s warm). Non-fatal on any failure.
        """
        def _run():
            try:
                feat_path = self.paths["dino_embed_video_path"]
                if not os.path.exists(feat_path):
                    logger.info("prewarm: no feature artifact yet at %s; "
                                "skipping", feat_path)
                    return
                (t, c, fh, fw), dino_dtype = video_io.npz_array_header(
                    feat_path, "features")
                hp, wp = self.tcfg.feat_hw
                state_spec = jax.eval_shape(
                    lambda: train_lib.init_train_state(
                        jax.random.PRNGKey(0), self.cfg, self.tcfg))
                spec = jax.ShapeDtypeStruct
                r_spec = spec((t, c, hp, wp), jnp.float32)
                mi = ModelInference(
                    params=state_spec.params, refined_features=r_spec,
                    cfg=self.tcfg,
                    anchor_cosine_similarity_threshold=
                        self.cfg.anchor_cosine_similarity_threshold,
                    cosine_similarity_threshold=
                        self.cfg.cosine_similarity_threshold,
                    chunk=chunk, mesh=self.mesh)
                built = mi.prewarm(state_spec.params, query_counts)
                if include_refine:
                    refine = tracker_lib.make_refine_fn(self.tcfg, self.mesh)
                    n_dev = self.mesh.devices.size if self.mesh else 1
                    fchunk = max(16 - 16 % n_dev, n_dev)
                    specs = (state_spec.params, state_spec.batch_stats,
                             spec((t, 3, self.cfg.video_resh,
                                   self.cfg.video_resw), jnp.float32),
                             spec((t, c, fh, fw), jnp.dtype(dino_dtype)),
                             spec((fchunk,), jnp.int32))
                    if self.mesh is not None:
                        with self.mesh:
                            refine.lower(*specs).compile()
                    else:
                        refine.lower(*specs).compile()
                    built.append(f"refine_f{fchunk}")
                logger.info("inference prewarm built %d programs: %s",
                            len(built), built)
                return built
            except Exception:
                logger.exception("inference prewarm failed (non-fatal)")
                return None

        if not background:
            return _run()
        import threading
        th = threading.Thread(target=_run, name="inference-prewarm",
                              daemon=True)
        th.start()
        return th

    # ------------------------------------------------------------------
    def infer_benchmark(self, benchmark_pickle_path: str, video_id: int,
                        step: Optional[int] = None, chunk: int = 4096):
        """Per-query-frame trajectory/occlusion predictions saved as .npy
        (reference inference_benchmark.py:13-41)."""
        from .evaluation.tapvid import get_query_points_from_benchmark_config
        mi = self.get_model_inference(step, chunk)
        qp = get_query_points_from_benchmark_config(
            benchmark_pickle_path, video_id,
            rescale_sizes=[self.cfg.video_resw, self.cfg.video_resh])
        os.makedirs(self.paths["trajectories_dir"], exist_ok=True)
        os.makedirs(self.paths["occlusions_dir"], exist_ok=True)
        for frame_idx in sorted(qp.keys()):
            pts = np.asarray(qp[frame_idx], np.float32)
            trajs, occ = mi.infer(pts)
            np.save(os.path.join(self.paths["trajectories_dir"],
                                 f"trajectories_{frame_idx}.npy"), trajs)
            np.save(os.path.join(self.paths["occlusions_dir"],
                                 f"occlusion_preds_{frame_idx}.npy"), occ)
            logger.info("saved predictions for query frame %d (%d points)",
                        frame_idx, len(pts))

    def infer_grid(self, interval: int = 10, start_frame: int = 0,
                   use_segm_mask: bool = False, step: Optional[int] = None,
                   chunk: int = 4096):
        """Every-``interval``-px grid queries on one frame (reference
        inference_grid.py:12-41)."""
        mi = self.get_model_inference(step, chunk)
        segm = None
        if use_segm_mask:
            masks = video_io.load_masks(self.paths["masks_path"],
                                        h_resize=None, w_resize=None)
            segm = masks[start_frame]
        qp = video_io.get_grid_query_points((self.orig_h, self.orig_w),
                                            segm_mask=segm, interval=interval,
                                            query_frame=start_frame)
        scale = np.asarray([self.cfg.video_resw / self.orig_w,
                            self.cfg.video_resh / self.orig_h, 1.0],
                           np.float32)
        trajs, occ = mi.infer(qp * scale)
        os.makedirs(self.paths["grid_trajectories_dir"], exist_ok=True)
        os.makedirs(self.paths["grid_occlusions_dir"], exist_ok=True)
        np.save(os.path.join(self.paths["grid_trajectories_dir"],
                             "grid_trajectories.npy"), trajs)
        np.save(os.path.join(self.paths["grid_occlusions_dir"],
                             "grid_occlusions.npy"), occ)
        return trajs, occ

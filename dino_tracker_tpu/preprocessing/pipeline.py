"""Preprocessing orchestrator — all stages in one process.

Behavior spec: reference preprocessing/main_preprocessing.py +
preprocessing_dino_bb/main_dino_bb_preprocessing.py, which spawn 9 python
subprocesses communicating through .pt files. Here the stages are plain
function calls sharing device-resident arrays (artifacts still hit disk in
the same layout — config.add_config_paths — so downstream tooling and
resume-at-any-stage work the same way).

Stages:
  1. RAFT flows → chained trajectories (with direct-flow filter)
  2. DINO feature video (layer 15 tokens, stride 7)
  3. FG masks (GT if provided, else layer-23 feature PCA)
  4. FG/BG trajectory split
  5. best buddies: mutual-NN sweep → unfiltered trajectories → OF filter →
     NMS ambiguity
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import PreprocessConfig, add_config_paths
from ..models.vit import ViTConfig, extract_feature_video
from ..structures import save_bb_data
from ..utils import video_io
from ..utils.profiling import stage_timer
from . import best_buddies as bb_lib
from . import fg_mask as fg_lib
from . import split_fg_bg as split_lib
from . import trajectories as traj_lib
from .flow import RaftFlowEngine

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class PreprocessingPipeline:
    data_path: str
    cfg: PreprocessConfig
    raft_params: Optional[dict] = None
    vit_params: Optional[dict] = None
    vit_cfg: Optional[ViTConfig] = None
    progress: bool = True
    flow_engine_override: Optional[object] = None  # injectable for tests
    mesh: Optional[object] = None  # jax.sharding.Mesh: intra-video sharding

    def __post_init__(self):
        from ..utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()
        self.paths = add_config_paths(self.data_path)
        self._video = None
        self._engine = self.flow_engine_override
        self._save_threads = []

    # -- shared inputs ----------------------------------------------------
    @property
    def video(self) -> np.ndarray:
        if self._video is None:
            self._video = video_io.load_video(
                self.paths["video_folder"],
                resize=(self.cfg.video_resh, self.cfg.video_resw),
                num_frames=self.cfg.max_frames)
        return self._video

    @property
    def flow_engine(self) -> RaftFlowEngine:
        if self._engine is None:
            assert self.raft_params is not None, "RAFT weights required"
            self._engine = RaftFlowEngine(
                self.raft_params, self.video, num_iters=self.cfg.raft_iters,
                mesh=self.mesh,
                compute_dtype=jnp.dtype(self.cfg.raft_compute_dtype))
        return self._engine

    # -- stages -----------------------------------------------------------
    def extract_trajectories(self, use_direct_filter: bool, out_path: str):
        eng = self.flow_engine
        logger.info("adjacent RAFT flows (%d pairs)", eng.t - 1)
        fwd, bwd = eng.adjacent_flows(progress=self.progress)
        direct_fn = None
        if use_direct_filter:
            direct_fn = lambda s: eng.direct_flows(s, self.cfg.threshold)
        trajs = traj_lib.extract_trajectories(
            fwd, bwd, threshold=self.cfg.threshold,
            min_trajectory_length=self.cfg.min_trajectory_length,
            direct_flow_fn=direct_fn,
            direct_flow_threshold=self.cfg.direct_flow_threshold,
            progress=self.progress)
        video_io.save_npz(out_path, trajectories=trajs)
        logger.info("saved %s: %s", out_path, trajs.shape)
        return trajs

    def extract_trajectories_both(self):
        """Stage 1 AND the BB stage's unfiltered extraction in ONE fused
        sweep. The reference runs the whole chaining script twice
        (main_preprocessing.py:28, main_dino_bb_preprocessing.py:34-39)
        re-deriving every adjacent-flow warp; the two passes share all
        inputs and differ only in the direct-flow alive mask, so each start
        frame here is one device dispatch emitting both artifacts
        (E2E_r03: the second pass alone cost 121 s/video)."""
        eng = self.flow_engine
        logger.info("adjacent RAFT flows (%d pairs)", eng.t - 1)
        fwd, bwd = eng.adjacent_flows(progress=self.progress)
        decode = direct_fn = None
        if hasattr(eng, "direct_sweep_traceable"):
            decode = eng.direct_sweep_traceable()
        else:
            direct_fn = lambda s: eng.direct_flows(s, self.cfg.threshold)
        trajs, unfiltered = traj_lib.extract_trajectories_dual(
            fwd, bwd, threshold=self.cfg.threshold,
            min_trajectory_length=self.cfg.min_trajectory_length,
            direct_flow_threshold=self.cfg.direct_flow_threshold,
            decode=decode, direct_flow_fn=direct_fn, mesh=self.mesh,
            progress=self.progress)
        video_io.save_npz(self.paths["trajectories_file"],
                          trajectories=trajs)
        logger.info("saved %s: %s", self.paths["trajectories_file"],
                    trajs.shape)
        return trajs, unfiltered

    def extract_dino_features(self, layer, out_path,
                              facet: str = None, stride: int = None):
        """One ViT sweep for one layer (or several layers in a single pass
        when ``layer``/``out_path`` are lists). Returns the DEVICE feature
        array(s) (downstream stages reuse them without a host round trip);
        artifacts are saved from one fetch."""
        assert self.vit_params is not None, "DINO weights required"
        single = isinstance(layer, int)
        layers = [layer] if single else list(layer)
        out_paths = [out_path] if single else list(out_path)
        feats = extract_feature_video(
            self.vit_params, jnp.asarray(self.video), self.vit_cfg,
            stride=self.cfg.dino_stride if stride is None else stride,
            layer=layers,
            facet=self.cfg.dino_facet if facet is None else facet,
            frames_per_batch=self.cfg.extract_frames_per_batch,
            compute_dtype=jnp.dtype(self.cfg.compute_dtype),
            mesh=self.mesh)
        store_dtype = np.dtype(self.cfg.feature_store_dtype)
        for f, path in zip(feats, out_paths):
            if store_dtype != np.float32:
                f = f.astype(jnp.dtype(store_dtype))  # cast on device:
                # halves the device→host fetch too, not just the file
            if self.cfg.async_artifact_save:
                # overlap the multi-GB device→host fetch + npz write with
                # the downstream device-side stages (the BB sweep reuses the
                # DEVICE array, never the file); run() joins before exit
                import threading

                def save(f=f, path=path):
                    video_io.save_npz(path, features=np.asarray(f))
                    logger.info("saved %s: %s (%s)", path, f.shape,
                                store_dtype)
                slot = {"exc": None}

                def run_save(save=save, slot=slot):
                    try:
                        save()
                    except BaseException as e:  # re-raised in join_saves
                        slot["exc"] = e
                th = threading.Thread(target=run_save, name=f"save:{path}")
                th.start()
                self._save_threads.append((th, slot))
            else:
                video_io.save_npz(path, features=np.asarray(f))
                logger.info("saved %s: %s (%s)", path, f.shape, store_dtype)
        return feats[0] if single else feats

    def create_fg_masks(self, mask_features: np.ndarray):
        masks = fg_lib.compute_fg_masks(
            mask_features, (self.cfg.video_resh, self.cfg.video_resw),
            fg_mask_threshold=self.cfg.fg_mask_threshold)
        video_io.save_video_frames((masks * 255).astype(np.uint8),
                                   self.paths["masks_path"])
        return masks

    def split_trajectories(self, trajs: np.ndarray):
        masks = video_io.load_masks(self.paths["masks_path"],
                                    h_resize=self.cfg.video_resh,
                                    w_resize=self.cfg.video_resw)
        fg, bg = split_lib.split_fg_bg(trajs, masks)
        video_io.save_npz(self.paths["fg_trajectories_file"], trajectories=fg)
        video_io.save_npz(self.paths["bg_trajectories_file"], trajectories=bg)
        logger.info("split: %d fg / %d bg trajectories", len(fg), len(bg))
        return fg, bg

    def compute_best_buddies(self, features, unfiltered_trajs: np.ndarray):
        h, w = self.cfg.video_resh, self.cfg.video_resw
        stride = self.cfg.dino_stride
        features = jnp.asarray(features)  # no-op when already on device
        # OF-gap filter runs fused inside the sweep, BEFORE the capacity cap
        telemetry: dict = {}
        bb = bb_lib.extract_best_buddies(
            features, h, w, stride,
            cap=self.cfg.bb_max_pairs_per_frame_pair, progress=self.progress,
            unfiltered_trajectories=unfiltered_trajs, mesh=self.mesh,
            telemetry=telemetry)
        # persist the capacity-cap truncation stats next to the artifact —
        # the reference keeps all mutual-NN pairs (ragged lists); our fixed
        # cap must never truncate silently
        os.makedirs(self.paths["dino_bb_dir"], exist_ok=True)
        with open(os.path.join(self.paths["dino_bb_dir"],
                               "bb_truncation.json"), "w") as f:
            json.dump(telemetry, f, indent=1)
        bb = bb_lib.compute_bb_ambiguity(
            bb, features, h, w, stride,
            box_size=float(self.cfg.dino_bb_box_size),
            iou_thresh=self.cfg.dino_bb_iou_threshold,
            topk=self.cfg.dino_bb_nms_topk, progress=self.progress,
            mesh=self.mesh)
        out = os.path.join(self.paths["dino_bb_dir"],
                           "dino_best_buddies_filtered.npz")
        save_bb_data(out, bb)
        logger.info("saved %s", out)
        return bb

    # -- full run ---------------------------------------------------------
    def run(self):
        from ..utils.profiling import dump_stage_report
        # 1. trajectories with direct-flow filter (training supervision),
        # fused with the BB stage's unfiltered pass (saved in stage 5)
        unfiltered = None
        with stage_timer("preprocess/trajectories"):
            if self.cfg.filter_using_direct_flow:
                trajs, unfiltered = self.extract_trajectories_both()
            else:
                # without the direct filter both passes are the same
                # computation — extract once, reuse for both artifacts
                trajs = self.extract_trajectories(
                    False, self.paths["trajectories_file"])
                unfiltered = trajs
        # 2 + 3. DINO features (+ FG masks from layer-23 features when no GT
        # masks exist — main_preprocessing.py:38-51). When the mask facet/
        # stride match the training facet/stride, both layers come from ONE
        # ViT sweep (forward_features collects multiple layers per pass).
        need_masks = not os.path.exists(self.paths["masks_path"])
        fused = (need_masks
                 and self.cfg.mask_dino_facet == self.cfg.dino_facet
                 and self.cfg.mask_dino_stride == self.cfg.dino_stride)
        if need_masks and self.cfg.mask_dino_model_name != self.cfg.dino_model_name:
            logger.warning(
                "mask_dino_model_name %s != dino_model_name %s — the "
                "loaded DINO weights are used for both",
                self.cfg.mask_dino_model_name, self.cfg.dino_model_name)
        if fused:
            with stage_timer("preprocess/dino_features"):
                feats, mask_feats = self.extract_dino_features(
                    [self.cfg.dino_layer, self.cfg.mask_dino_layer],
                    [self.paths["dino_embed_video_path"],
                     self.paths["mask_dino_embed_video_path"]])
            with stage_timer("preprocess/fg_masks"):
                self.create_fg_masks(np.asarray(mask_feats))
        else:
            with stage_timer("preprocess/dino_features"):
                feats = self.extract_dino_features(
                    self.cfg.dino_layer, self.paths["dino_embed_video_path"])
            if need_masks:
                with stage_timer("preprocess/fg_masks"):
                    mask_feats = self.extract_dino_features(
                        self.cfg.mask_dino_layer,
                        self.paths["mask_dino_embed_video_path"],
                        facet=self.cfg.mask_dino_facet,
                        stride=self.cfg.mask_dino_stride)
                    self.create_fg_masks(np.asarray(mask_feats))
            else:
                logger.info("masks exist, skipping fg-mask stage")
        # 4. fg/bg split
        with stage_timer("preprocess/split_fg_bg"):
            self.split_trajectories(trajs)
        # 5. best buddies (uses trajectories WITHOUT the direct-flow filter
        # — already chained in stage 1's fused dual sweep; just persist)
        with stage_timer("preprocess/unfiltered_trajectories"):
            video_io.save_npz(self.paths["unfiltered_trajectories_file"],
                              trajectories=unfiltered)
            logger.info("saved %s: %s",
                        self.paths["unfiltered_trajectories_file"],
                        unfiltered.shape)
        with stage_timer("preprocess/best_buddies"):
            self.compute_best_buddies(feats, unfiltered)
        self.join_saves()
        logger.info("stage timing report:\n%s", dump_stage_report())

    def join_saves(self):
        """Block until all async artifact writes have landed; re-raise the
        first writer failure so a missing/corrupt feature artifact can't
        masquerade as a successful run."""
        threads, self._save_threads = self._save_threads, []
        first_exc = None
        for th, slot in threads:
            th.join()
            if slot["exc"] is not None and first_exc is None:
                first_exc = slot["exc"]
        if first_exc is not None:
            raise first_exc

"""Multi-video benchmark fan-out.

The reference's benchmark protocol is "run preprocess/train/inference once per
video id" by hand (README.md:139-154). This launcher runs the per-video
pipeline for a whole TAP-Vid benchmark directory as a work queue:

  * single host: sequential or process-parallel over videos (each video's
    training already saturates its chip);
  * multi host (TPU pod slice / DCN): each host claims videos from the shared
    queue via lockfile claims on the shared filesystem — embarrassingly
    parallel, no collective traffic, matching the workload's structure
    (30 independent DAVIS videos).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import socket
import time
from typing import List, Optional, Sequence

logger = logging.getLogger(__name__)


def claim_video(claim_dir: str, video_id: str) -> bool:
    """Atomically claim a work item (O_EXCL lockfile on shared storage)."""
    os.makedirs(claim_dir, exist_ok=True)
    path = os.path.join(claim_dir, f"{video_id}.claim")
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as f:
        json.dump({"host": socket.gethostname(), "pid": os.getpid(),
                   "time": time.time()}, f)
    return True


def mark_done(claim_dir: str, video_id: str):
    with open(os.path.join(claim_dir, f"{video_id}.done"), "w") as f:
        f.write(str(time.time()))


def is_done(claim_dir: str, video_id: str) -> bool:
    return os.path.exists(os.path.join(claim_dir, f"{video_id}.done"))


@dataclasses.dataclass
class BenchmarkLauncher:
    """Drive preprocess→train→inference for every video directory under
    ``dataset_root`` (one subdir per video id, each with ``video/``)."""

    dataset_root: str
    benchmark_pickle_path: str
    train_config_path: str
    preprocess_config_path: str
    raft_checkpoint: Optional[str] = None
    dino_checkpoint: Optional[str] = None
    stages: Sequence[str] = ("preprocess", "train", "inference")

    def video_ids(self) -> List[str]:
        return sorted(d for d in os.listdir(self.dataset_root)
                      if not d.startswith(".")
                      and os.path.isdir(os.path.join(self.dataset_root, d)))

    @staticmethod
    def resolve_video_index(video_id: str) -> int:
        """TAP-Vid benchmark pickles key videos by integer index; resolve it
        up front so a bad directory name fails BEFORE preprocessing/training
        burn chip time."""
        try:
            return int(video_id)
        except ValueError:
            raise ValueError(
                f"video directory {video_id!r} is not an integer benchmark "
                "index; rename it to its TAP-Vid video_idx (or run stages "
                "without 'inference')")

    def run_video(self, video_id: str):
        data_path = os.path.join(self.dataset_root, video_id)
        if "inference" in self.stages:
            video_index = self.resolve_video_index(video_id)
        from ..config import PreprocessConfig, TrainConfig
        from ..runtime import DINOTrackerRuntime

        if "preprocess" in self.stages:
            from ..preprocessing.pipeline import PreprocessingPipeline
            pcfg = PreprocessConfig.from_yaml(self.preprocess_config_path)
            raft_params = vit_params = vit_cfg = None
            if self.raft_checkpoint:
                import torch
                from ..models.raft import convert_raft_state_dict
                raft_params = convert_raft_state_dict(
                    torch.load(self.raft_checkpoint, map_location="cpu",
                               weights_only=True))
            if self.dino_checkpoint:
                from ..models.vit_convert import load_dinov2_checkpoint
                vit_params, vit_cfg = load_dinov2_checkpoint(
                    self.dino_checkpoint, pcfg.dino_model_name)
            PreprocessingPipeline(data_path, pcfg, raft_params=raft_params,
                                  vit_params=vit_params, vit_cfg=vit_cfg).run()

        cfg = TrainConfig.from_yaml(self.train_config_path)
        rt = DINOTrackerRuntime(data_path, cfg)
        if "train" in self.stages:
            rt.train()  # starts the background inference prewarm itself
        if "inference" in self.stages:
            if "train" not in self.stages:
                # inference-only fan-out: overlap the AOT compiles with the
                # video/feature uploads (the refine program is excluded —
                # the main thread requests it first and would only race)
                rt.prewarm_inference(include_refine=False)
            rt.infer_benchmark(self.benchmark_pickle_path, video_index)

    def run(self, claim_dir: Optional[str] = None):
        """Work through the queue; with ``claim_dir`` multiple hosts share it."""
        for vid in self.video_ids():
            if claim_dir is not None:
                if is_done(claim_dir, vid) or not claim_video(claim_dir, vid):
                    logger.info("skip %s (claimed/done)", vid)
                    continue
            logger.info("=== video %s ===", vid)
            t0 = time.time()
            try:
                self.run_video(vid)
            except Exception:
                logger.exception("video %s failed", vid)
                continue
            if claim_dir is not None:
                mark_done(claim_dir, vid)
            logger.info("video %s done in %.1f min", vid,
                        (time.time() - t0) / 60)

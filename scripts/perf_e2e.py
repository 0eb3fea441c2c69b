"""End-to-end per-video wall clock at the reference's real scale.

Measures the FULL per-video cost the reference pays on a GPU
(BASELINE.md north star): preprocessing (RAFT adjacent+direct flows →
chained trajectories, ViT-L stride-7 feature extraction, fg/bg split,
best-buddy sweep + OF filter + NMS ambiguity) → 10k-iteration test-time
training → TAP-Vid-style benchmark inference (strided query frames) →
eval CSV. Random weights are fine for timing (same FLOPs as pretrained).

Usage (data dir must contain video/ frames and optionally masks/):
    python scripts/perf_e2e.py --data-path /tmp/e2e/horsejump \
        --raft-checkpoint /tmp/e2e/ckpts/raft-things.pth \
        --dino-checkpoint /tmp/e2e/ckpts/dinov2_vitl14.npz \
        [--query-stride 5] [--points-per-frame 26] [--out e2e.json]

Emits one JSON line per stage plus a final summary with total minutes.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--raft-checkpoint", required=True)
    ap.add_argument("--dino-checkpoint", required=True)
    ap.add_argument("--preprocess-config", default="./config/preprocessing.yaml")
    ap.add_argument("--train-config", default="./config/train.yaml")
    ap.add_argument("--query-stride", type=int, default=5)
    ap.add_argument("--points-per-frame", type=int, default=26)
    ap.add_argument("--seed", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-preprocess", action="store_true",
                    help="reuse existing preprocessing artifacts in "
                         "--data-path (e.g. resuming after a crash)")
    ap.add_argument("--preprocess-seconds", type=float, default=None,
                    help="with --skip-preprocess: previously measured "
                         "preprocess wall-clock to stitch into the summary")
    args = ap.parse_args()

    import logging
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")

    import numpy as np

    from dino_tracker_tpu.config import PreprocessConfig, TrainConfig
    from dino_tracker_tpu.utils import video_io

    stages = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                dt = time.perf_counter() - self.t0
                stages[name] = round(dt, 2)
                print(json.dumps({"stage": name, "seconds": stages[name]}),
                      flush=True)
        return _T()

    pcfg = PreprocessConfig.from_yaml(args.preprocess_config)
    tcfg = TrainConfig.from_yaml(args.train_config)

    # -- weights (timed separately: relay transfer is environment cost, but
    #    the reference also loads torch.hub weights once per video process)
    with timed("load_weights"):
        import torch
        from dino_tracker_tpu.models.raft import convert_raft_state_dict
        from dino_tracker_tpu.models.vit_convert import load_dinov2_checkpoint
        sd = torch.load(args.raft_checkpoint, map_location="cpu",
                        weights_only=True)
        raft_params = convert_raft_state_dict(sd)
        vit_params, vit_cfg = load_dinov2_checkpoint(args.dino_checkpoint,
                                                     pcfg.dino_model_name)

    # -- preprocessing ----------------------------------------------------
    if args.skip_preprocess:
        stages["preprocess"] = args.preprocess_seconds or 0.0
        print(json.dumps({"stage": "preprocess", "seconds":
                          stages["preprocess"], "reused": True}), flush=True)
    else:
        with timed("preprocess"):
            from dino_tracker_tpu.preprocessing.pipeline import (
                PreprocessingPipeline)
            PreprocessingPipeline(args.data_path, pcfg,
                                  raft_params=raft_params,
                                  vit_params=vit_params, vit_cfg=vit_cfg).run()

    # -- training (the 10k-iteration test-time loop) ----------------------
    with timed("train"):
        from dino_tracker_tpu.runtime import DINOTrackerRuntime
        rt = DINOTrackerRuntime(args.data_path, tcfg, seed=args.seed)
        rt.train()

    # -- benchmark-style inference: strided query frames ------------------
    orig_h, orig_w, t = video_io.get_original_video_res(
        os.path.join(args.data_path, "video"))
    feats = video_io.load_npz(
        os.path.join(args.data_path, "dino_embeddings",
                     "dino_embed_video.npz"))["features"]
    t = min(t, feats.shape[0])
    rng = np.random.default_rng(args.seed)
    frames = list(range(0, t, args.query_stride))
    n = args.points_per_frame
    bench = {"videos": [{
        "video_idx": 0, "h": orig_h, "w": orig_w,
        "query_points": {f: (rng.random((n, 2))
                             * [orig_w - 1, orig_h - 1]).tolist()
                         for f in frames},
        "target_points": {f: rng.random((n, t, 2)) * [orig_w - 1, orig_h - 1]
                          for f in frames},
        "occluded": {f: rng.random((n, t)) < 0.2 for f in frames},
    }]}
    with timed("inference"):
        rt.infer_benchmark(bench, video_id=0)

    # -- eval --------------------------------------------------------------
    with timed("eval"):
        from dino_tracker_tpu.evaluation import metrics as M
        m = M.compute_tapvid_metrics_for_video(
            os.path.join(args.data_path, "trajectories"),
            os.path.join(args.data_path, "occlusions"),
            bench, 0, pred_video_sizes=[tcfg.video_resw, tcfg.video_resh])
        print(json.dumps({k: float(v) for k, v in m.items()}), flush=True)

    from dino_tracker_tpu.utils.profiling import dump_stage_report
    report = dump_stage_report()
    print(report, flush=True)

    per_video = stages["preprocess"] + stages["train"] + stages["inference"]
    summary = {
        "metric": "e2e_per_video_minutes",
        "value": round(per_video / 60.0, 2),
        "unit": "minutes_per_video",
        "frames": int(t),
        "resolution": [pcfg.video_resh, pcfg.video_resw],
        "query_frames": len(frames),
        "points_per_frame": n,
        "stages_seconds": stages,
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({**summary, "stage_report": report}, f, indent=2)


if __name__ == "__main__":
    main()

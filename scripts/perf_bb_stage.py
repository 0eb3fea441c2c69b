"""Re-time the full best-buddy stage (sweep + OF filter + NMS ambiguity)
standalone on saved preprocessing artifacts — used to measure the adaptive
(uncapped) capacity default against the fixed cap=1024 path at DAVIS scale.

    python scripts/perf_bb_stage.py --data-path /tmp/e2e/horsejump [--cap 1024]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--cap", type=int, default=None,
                    help="fixed capacity; omit for the adaptive default")
    ap.add_argument("--skip-nms", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    from dino_tracker_tpu.config import PreprocessConfig, add_config_paths
    from dino_tracker_tpu.preprocessing import best_buddies as bb_lib
    from dino_tracker_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    cfg = PreprocessConfig()
    paths = add_config_paths(args.data_path)
    feats = np.load(paths["dino_embed_video_path"])["features"]
    feats = feats.astype(np.float32)
    trajs = np.load(paths["unfiltered_trajectories_file"])["trajectories"]
    print(json.dumps({"features": list(feats.shape),
                      "unfiltered_trajs": list(trajs.shape)}))

    t0 = time.time()
    feats_dev = jnp.asarray(feats)
    feats_dev.block_until_ready()
    print(json.dumps({"h2d_s": round(time.time() - t0, 2),
                      "bytes": int(feats.nbytes)}))

    telemetry: dict = {}
    t0 = time.time()
    bb = bb_lib.extract_best_buddies(
        feats_dev, cfg.video_resh, cfg.video_resw, cfg.dino_stride,
        cap=args.cap, progress=True, unfiltered_trajectories=trajs,
        telemetry=telemetry)
    np.asarray(bb.valid)  # fence
    sweep_s = time.time() - t0
    print(json.dumps({"sweep_s": round(sweep_s, 2), **telemetry}))

    if not args.skip_nms:
        t0 = time.time()
        bb = bb_lib.compute_bb_ambiguity(
            bb, feats_dev, cfg.video_resh, cfg.video_resw,
            cfg.dino_stride, box_size=float(cfg.dino_bb_box_size),
            iou_thresh=cfg.dino_bb_iou_threshold,
            topk=cfg.dino_bb_nms_topk, progress=True)
        np.asarray(bb.r)  # fence
        print(json.dumps({"nms_s": round(time.time() - t0, 2),
                          "nmax": int(bb.valid.shape[-1])}))


if __name__ == "__main__":
    main()
